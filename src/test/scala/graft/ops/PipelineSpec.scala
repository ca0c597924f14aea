package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("p4: every pipeline stage bites — composition is never vacuous") {
    // the oracle pins p4's VALUES; this spec pins its MEANING: each
    // stage must actually change the data, or the capstone silently
    // degrades into a renamed p2
    val out = Pipeline.queries("p4_full_pipeline")(spark, sf).collect()
    val packedDocs = out.map(_.getAs[Long]("n_docs")).sum
    val packedTokens = out.map(_.getAs[Long]("bin_tokens")).sum
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), Text.wordsCol(col("text")).as("ws"))
    val nDocs = docs.count()
    val qual = docs.filter(
      size(col("ws")) >= 30 && size(col("ws")) <= 400 && col("doc_id") % 11 =!= 0)
    val nQual = qual.count()
    assert(nQual < nDocs, "quality gate + eval-set removal must drop docs")
    // stage 2 bites INDEPENDENTLY: recompute the contamination rule
    // and require it to drop at least one quality survivor
    val bench = docs.filter(col("doc_id") % 11 === 0)
      .select(explode(graft.functions.SimHashFunctions
        .poly_grams(col("ws"), 13)).as("gram")).distinct()
    val nContam = qual
      .select(col("doc_id"),
        graft.functions.SimHashFunctions.poly_grams(col("ws"), 13).as("g"))
      .select(col("doc_id"), size(col("g")).as("n_grams"), explode(col("g")).as("gram"))
      .join(broadcast(bench), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_hits"), max(col("n_grams")).as("n_grams"))
      .filter(col("n_hits") * 2 > col("n_grams"))
      .count()
    assert(nContam > 0, "decontamination must drop at least one survivor")
    assert(packedDocs == nQual - nContam,
      "packed docs must equal quality survivors minus contaminated")
    // stage 3 bites INDEPENDENTLY: compare against the SURVIVORS'
    // pre-dedup token total, so a keep-everything regression cannot
    // hide behind stage 2's drops
    val survivorTokens = qual
      .agg(sum(size(col("ws")))).head().getLong(0) -
      // contaminated docs' tokens leave with stage 2, not stage 3
      {
        val contamIds = qual
          .select(col("doc_id"),
            graft.functions.SimHashFunctions.poly_grams(col("ws"), 13).as("g"))
          .select(col("doc_id"), size(col("g")).as("n_grams"), explode(col("g")).as("gram"))
          .join(broadcast(bench), "gram")
          .groupBy("doc_id")
          .agg(countDistinct(col("gram")).as("n_hits"), max(col("n_grams")).as("n_grams"))
          .filter(col("n_hits") * 2 > col("n_grams"))
          .select("doc_id")
        qual.join(contamIds, Seq("doc_id"))
          .agg(coalesce(sum(size(col("ws"))), lit(0L))).head().getLong(0)
      }
    assert(packedTokens < survivorTokens,
      "span dedup must remove repeated spans' tokens before packing")
    assert(packedDocs > 0 && packedDocs < nDocs)
    assert(out.forall(_.getAs[Long]("bin_tokens") > 0), "no empty packs")
    // packing really is multi-bin per shard (running sums advanced)
    assert(out.map(_.getAs[Long]("shard")).distinct.length == 8)
    assert(out.length > 8, "each shard should overflow its first 2048-token bin")
  }

  test("p5: every serving stage bites — probes prune, ADC ranks, rerank reorders") {
    val sf = "/root/testdata/sf0.001"
    val rows = Pipeline.queries("p5_retrieval")(spark, sf).collect()
    assert(rows.length == 25) // 5 queries x 5
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    var reordered = 0
    byQ.values.foreach { rs =>
      // probe stage: results confined to the query's 2 probed cells
      assert(rs.map(_.getAs[Long]("cell")).distinct.length <= 2)
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to 5))
      // final order is exact-cosine
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      // refine stage non-vacuity: the exact rerank must disagree with
      // the ADC order somewhere (else the 8x8 PQ were magically exact)
      val adcOrder = rs.sortBy(r => (-r.getAs[Double]("adc_score"), r.getAs[Long]("vec_id")))
        .map(_.getAs[Long]("vec_id")).toSeq
      if (adcOrder != sorted.map(_.getAs[Long]("vec_id")).toSeq) reordered += 1
    }
    assert(reordered >= 1, "rerank never changed an ADC ordering — refine stage is vacuous")
  }

  test("p6: streaming ingestion equals the batch truth; dedup and the watermark bite") {
    val out = Pipeline.queries("p6_stream_ingest")(spark, sf).collect()
    assert(out.nonEmpty, "at least one finalized window must emit")
    // batch truth: same scorer, same epoch-aligned windows, the
    // append-mode cutoff applied by hand
    val ev = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        (lit(1700000000L) + col("doc_id") * 600).cast("timestamp").as("ts"),
        col("text"), col("source"))
    val scored = ev
      .withColumn("words", Text.wordsCol(col("text")))
      .withColumn("quality", Pipeline.qualityCol(col("words")))
      .filter(col("quality") >= 0.5)
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val all = scored
      .groupBy(window(col("ts"), "1 day"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("words")).cast("long")).as("n_tokens"),
        min(col("quality")).as("min_q"), max(col("quality")).as("max_q"))
      .select(unix_micros(col("window.start")).as("w_us"), col("source"),
        col("n_docs"), col("n_tokens"), col("min_q"), col("max_q"))
    val finalized = all
      .filter(col("w_us") + 86400000000L <= maxUs - 3600000000L)
      .orderBy("w_us", "source")
      .collect()
    assert(out.toSeq == finalized.toSeq,
      "streaming emission must equal the batch aggregation over finalized windows")
    // the watermark contract BITES: trailing windows exist and are absent
    assert(all.count() > finalized.length.toLong,
      "no open trailing window — the append-mode cutoff is vacuous")
    // the dedup is OBSERVABLE: at least one replayed delivery (first
    // half, doc_id % 10 == 0) passes quality inside a finalized
    // window — without dropDuplicatesWithinWatermark its window's
    // n_docs would double-count and the equality above would fail
    val nDocs = ev.count()
    val replayedInFinal = scored
      .filter(col("doc_id") < nDocs / 2 && col("doc_id") % 10 === 0)
      .filter(unix_micros(date_trunc("day", col("ts"))) + 86400000000L
        <= maxUs - 3600000000L)
      .count()
    assert(replayedInFinal > 0,
      "no planted duplicate lands in a finalized window — dedup untested")
  }

  test("p7: every change class is adjudicated as planted, and the index exclusion bites") {
    val rows = Pipeline.queries("p7_cdc_curation")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getString(4)))
      .toSeq
    assert(rows.size == 19, "one ledger row per change")
    def status(id: Long) = rows.find(_._1 == id).get._5
    // deletes leave the curated set, carrying no quality
    (20L until 25L).foreach { id =>
      assert(status(id) == "deleted")
      assert(rows.find(_._1 == id).get._3 == -1.0)
    }
    // vandalized updates fail the quality gate
    (15L until 18L).foreach(id => assert(status(id) == "dropped_quality"))
    // a re-crawl of standing content is rejected by the standing index
    (8000000L until 8000003L).foreach { id =>
      assert(status(id) == "dropped_dup")
      assert(rows.find(_._1 == id).get._4 >= 1L, "the dup must be verified, not just banded")
    }
    // revisions are NOT rejected as duplicates of their own previous
    // version — a revised text is ~95% of its old self, so WITHOUT the
    // latest-wins exclusion of touched pks every revision would band-
    // collide with its own stale row and drop. A revision may still
    // legitimately near-dup a DIFFERENT surviving doc (the corpus has
    // natural pairs — d3's bread and butter), so: at least one must
    // survive, and any that dropped must have a verified >= 0.5
    // Jaccard witness among the surviving corpus, which its own
    // excluded pk can never provide.
    assert((10L until 15L).exists(id => status(id) == "admitted"),
      "every revision rejected — the stale-row exclusion is broken")
    val touched = (10L until 18L) ++ (20L until 25L)
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val survivingShs = Dedup.shinglesOf(
      docs.filter(!col("doc_id").isin(touched: _*)))
    (10L until 15L).filter(id => status(id) == "dropped_dup").foreach { id =>
      val revShs = Dedup.shinglesOf(
        docs.filter(col("doc_id") === id)
          .select(col("doc_id"),
            concat(col("text"), lit(" revised edition")).as("text")))
      val witnesses = survivingShs.select(col("doc_id").as("cid"), col("shs").as("sc"))
        .crossJoin(revShs.select(col("shs").as("sn")))
        .filter(size(array_intersect(col("sn"), col("sc"))).cast("double")
          / size(array_union(col("sn"), col("sc"))) >= 0.5)
        .count()
      assert(witnesses >= 1,
        s"revision $id dropped without a surviving near-dup witness — " +
          "it can only have matched its own excluded stale row")
    }
    // genuinely new content is admitted
    (8000010L until 8000013L).foreach(id => assert(status(id) == "admitted"))
  }

  test("p12: the protocol welds hold — gate, curation classes, index consequences") {
    val rows = Pipeline.queries("p12_e2e_protocol")(spark, sf).collect()
    assert(rows.length == 19, "one ledger row per TRUE change — a gate leak adds rows")
    def row(id: Long) = rows.find(_.getAs[Long]("doc_id") == id).get
    // the redelivered below-watermark slice (pks 0-2 as updates) must
    // be gone entirely: every small-id ledger row is a planted change
    assert(!rows.exists(r => r.getAs[Long]("doc_id") < 10L),
      "a sub-watermark redelivery leaked through the gate")
    // curation classes adjudicate as planted (p7's semantics through
    // the full transport)
    (20L until 25L).foreach(id => assert(row(id).getAs[String]("status") == "deleted"))
    (15L until 18L).foreach(id => assert(row(id).getAs[String]("status") == "dropped_quality"))
    (8000000L until 8000003L).foreach(id => assert(row(id).getAs[String]("status") == "dropped_dup"))
    (8000010L until 8000013L).foreach(id => assert(row(id).getAs[String]("status") == "admitted"))
    // index weld: ONLY admitted changes and deletes touch the index
    rows.foreach { r =>
      val (st, op, act) = (r.getAs[String]("status"), r.getAs[String]("op"),
        r.getAs[String]("index_action"))
      val cell = Option(r.get(r.fieldIndex("cell")))
      if (op == "delete") {
        assert(act == "removed" && cell.nonEmpty,
          "a delete must retract a concrete standing cell")
      } else if (st == "admitted") {
        assert((op == "update" && act == "reassigned") ||
          (op == "insert" && act == "added"))
        assert(cell.nonEmpty, "an admitted change must carry its assigned cell")
      } else {
        assert(act == "none" && cell.isEmpty,
          s"dropped content must never reach the index: $r")
      }
    }
    // the index actually receives work from this batch on both sides
    assert(rows.count(_.getAs[String]("index_action") == "removed") == 5)
    assert(rows.count(r => r.getAs[String]("index_action") == "added") >= 3)
  }

  test("p8: incremental segment-df equals the full recompute; both vocabulary transitions fire") {
    val rows = Pipeline.queries("p8_df_maint")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the headline invariant, per touched key: maintained == recomputed
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok"),
        s"df drift on ${r.getAs[String]("k")}: " +
          s"incr ${r.getAs[Long]("df_incr")} != full ${r.getAs[Long]("df_full")}")
      assert(r.getAs[Long]("df_incr") >= 0L, "a count can never go negative")
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def rowFor(seg: String) = rows.find(_.getAs[String]("k") == md5hex(seg))
    // the standing banner (one exact 8-word span, planted on every
    // 25th of the 500 docs): all 20 carriers deleted -> df 20 -> 0
    val b1 = rowFor("subscribe to our newsletter click here now please")
    assert(b1.isDefined, "the drained banner segment must be a touched key")
    assert(b1.get.getAs[Long]("df_old") == 20L && b1.get.getAs[Long]("net") == -20L)
    assert(b1.get.getAs[String]("status") == "left_vocab")
    // the incoming banner on the 4 fresh-id re-crawls: df 0 -> 4
    val b2 = rowFor("limited time offer act now before midnight tonight")
    assert(b2.isDefined, "the incoming banner segment must be a touched key")
    assert(b2.get.getAs[Long]("df_old") == 0L && b2.get.getAs[Long]("net") == 4L)
    assert(b2.get.getAs[String]("status") == "entered_vocab")
    // the revisions' boundary shift must actually retract: at least
    // one touched key with a strictly negative net besides the banner
    assert(rows.exists(r => r.getAs[Long]("net") < 0L &&
      r.getAs[String]("k") != md5hex("subscribe to our newsletter click here now please")),
      "revision before-images must retract their old segments")
  }

  test("p9: incremental cell bookkeeping equals the from-scratch re-assignment") {
    val rows = Pipeline.queries("p9_index_maint")(spark, sf).collect()
    assert(rows.length == 8, "one row per codebook cell")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ok"),
        s"cell ${r.getAs[Long]("cid")} drifted: " +
          s"incr ${r.getAs[Long]("n_after_incr")} != full ${r.getAs[Long]("n_after_full")}")
      assert(r.getAs[Long]("n_removed") <= r.getAs[Long]("n_before"),
        "a cell cannot lose more members than it had")
      assert(r.getAs[Long]("n_after_incr") >= 0L)
    }
    // the batch: 10 updates + 10 deletes touch 20 standing rows; 10
    // updates + 10 re-ingests add 20 assignments
    assert(rows.map(_.getAs[Long]("n_removed")).sum == 20L)
    assert(rows.map(_.getAs[Long]("n_added")).sum == 20L)
    assert(rows.map(_.getAs[Long]("n_after_full")).sum ==
      rows.map(_.getAs[Long]("n_before")).sum,
      "population is conserved: -20 stale +20 admitted")
    // the negated updates must actually exercise cell movement — at
    // least one cell's net change is nonzero
    assert(rows.exists(r => r.getAs[Long]("n_after_incr") != r.getAs[Long]("n_before")),
      "the planted batch must move at least one cell population")
  }

  test("p10: the shard manifest partitions the corpus, prices images, and packs dense bins") {
    import org.apache.spark.sql.functions._
    val rows = Pipeline.queries("p10_mm_shards")(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every document lands in exactly one (split, shard, bin)")
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits == Set("train", "val", "test"))
    val trainDocs = rows.filter(_.getAs[String]("split") == "train")
      .map(_.getAs[Long]("n_docs")).sum
    assert(trainDocs > nDocs / 2, "the 80% split must dominate")
    rows.foreach { r =>
      assert(r.getAs[Long]("text_tokens") + r.getAs[Long]("img_tokens") ==
        r.getAs[Long]("bin_tokens"), "token accounting must balance per bin")
      assert(r.getAs[Long]("n_imgs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("img_tokens") == r.getAs[Long]("n_imgs") * 576,
        "every image bills exactly its 576 patch tokens")
    }
    // bins are dense 0..max within each (split, shard) — a seekable manifest
    rows.groupBy(r => (r.getAs[String]("split"), r.getAs[Long]("shard"))).foreach {
      case (k, rs) =>
        val bins = rs.map(_.getAs[Long]("bin")).sorted
        assert(bins.toSeq == (0L until bins.length).toSeq, s"$k: bins must be dense")
    }
    // budget: a bin overflows 4096 only by the straddling document
    val maxDocTokens = graft.Tables.documents(spark, sf)
      .select((size(Text.wordsCol(col("text"))) +
        when(col("doc_id") % 3 === 0, 576).otherwise(0)).as("t"))
      .agg(max("t")).collect()(0).getInt(0)
    rows.foreach { r =>
      assert(r.getAs[Long]("bin_tokens") < 4096L + maxDocTokens,
        s"bin ${r.getAs[Long]("bin")} exceeds the straddle bound")
    }
  }

  test("p11: closed-form water-filling equals the iterative fixpoint; invariants hold") {
    val rows = Pipeline.queries("p11_mixture")(spark, sf).collect()
    assert(rows.nonEmpty)
    val per = rows.map(r => (r.getAs[String]("source"),
      r.getAs[Long]("avail_tokens"), r.getAs[Long]("weight"),
      r.getAs[Int]("capped"), r.getAs[Long]("alloc_tokens")))
    // the sf must exercise BOTH classes, or the op degenerates
    assert(per.exists(_._4 == 1), "no source capped at its availability")
    assert(per.exists(_._4 == 0), "every source capped — budget exceeds supply")
    // independent reference: the ITERATIVE fixpoint (freeze any source
    // whose fair share of the remaining budget exceeds its supply,
    // redistribute, repeat) — the closed-form prefix construction must
    // land on the same capped set and the same allocations
    val budget = per.map(_._2).sum * 6 / 10
    var live = per.map(t => t._1 -> (t._2, t._3)).toMap
    var frozen = Map.empty[String, Long]
    var r = budget
    var changed = true
    while (changed) {
      val wl = live.values.map(_._2).sum
      val cap = live.filter { case (_, (a, w)) => a * wl < w * r }
      changed = cap.nonEmpty
      cap.foreach { case (s, (a, _)) => frozen += s -> a; r -= a; live -= s }
    }
    val wl = live.values.map(_._2).sum
    per.foreach { case (s, avail, w, capped, alloc) =>
      if (frozen.contains(s)) {
        assert(capped == 1 && alloc == avail, s"$s: fixpoint says capped at $avail")
      } else {
        assert(capped == 0, s"$s: fixpoint says uncapped")
        assert(alloc == w * r / wl, s"$s: uncapped share must be weight-proportional")
        assert(alloc <= avail, s"$s: allocation exceeds supply")
      }
    }
    // the budget is spent except integer-division dust (< total weight)
    val spent = per.map(_._5).sum
    assert(spent <= budget && budget - spent < per.map(_._3).sum,
      s"allocated $spent of $budget — water level off by more than rounding")
  }

  test("p13: the realized sample is epoch-stable, keeps capped sources whole, tracks the plan") {
    val run1 = Pipeline.queries("p13_mixture_sample")(spark, sf).collect()
    val run2 = Pipeline.queries("p13_mixture_sample")(spark, sf).collect()
    // epoch stability: the coin is a pure function of (doc_id, epoch),
    // so an independent re-plan reproduces the sample exactly
    assert(run1.map(_.toSeq).toSeq == run2.map(_.toSeq).toSeq,
      "resampling must be byte-stable across runs")
    val plan = Pipeline.queries("p11_mixture")(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Int]("capped"), r.getAs[Long]("avail_tokens"), r.getAs[Long]("alloc_tokens"))).toMap
    val docsBySrc = graft.Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    val epochs = run1.map(_.getAs[Long]("epoch")).distinct.sorted
    assert(epochs.toSeq == Seq(0L, 1L), "both epochs must be realized")
    run1.foreach { r =>
      val src = r.getAs[String]("source")
      val (capped, avail, alloc) = plan(src)
      assert(r.getAs[Long]("alloc_tokens") == alloc, s"$src: plan drifted between p11 and p13")
      if (capped == 1) { // rate = 1e6 ppm ⇒ every doc survives, both epochs
        assert(r.getAs[Long]("sampled_docs") == docsBySrc(src),
          s"$src is capped — the realization must keep every document")
        assert(r.getAs[Long]("sampled_tokens") == avail)
      }
      assert(r.getAs[Long]("sampled_tokens") <= avail)
      assert(r.getAs[Long]("realized_ppm") ==
        r.getAs[Long]("sampled_tokens") * 1000000L / math.max(avail, 1L))
    }
    // the two epochs draw DIFFERENT samples somewhere (fresh randomness
    // under the same rates), while total realized mass stays in family
    val bySrcEpoch = run1.map(r => (r.getAs[String]("source"), r.getAs[Long]("epoch")) ->
      r.getAs[Long]("sampled_tokens")).toMap
    val uncapped = plan.collect { case (s, (0, _, _)) => s }
    assert(uncapped.exists(s => bySrcEpoch((s, 0L)) != bySrcEpoch((s, 1L))),
      "epoch 1 must not replay epoch 0's sample on every uncapped source")
  }

  test("p14: parses every real doc, quarantines exactly the plants, keeps them queryable") {
    import org.apache.spark.sql.functions.col
    val row = graft.SparkEntry.queries("p14_jsonl_ingest")(spark, sf).head()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(row.getAs[Long]("n_parsed") == nDocs, "every clean line must parse")
    assert(row.getAs[Long]("n_quarantined") == 3L, "exactly the three plants quarantine")
    assert(row.getAs[Long]("n_lines") == nDocs + 3L)
    // the quarantined RAW lines stay queryable — re-read the same spool
    // and pull them back verbatim (the audit trail a real pipeline keeps)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
        "n_chars BIGINT, _corrupt_record STRING")
    val spool = Pipeline.p14Spooled.get(sf)
    assert(spool != null, "the spool path must be memoized per sf dir")
    // Spark disallows corrupt-column-only queries over raw JSON
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — carry doc_id alongside
    val bad = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(spool)
      .select("doc_id", "_corrupt_record")
      .filter(col("_corrupt_record").isNotNull)
      .collect().map(_.getString(1)).sorted
    assert(bad.length == 3)
    assert(bad.contains("not json at all"), s"raw quarantined lines must round-trip: ${bad.toSeq}")
  }

  test("p16: the cascade funnel conserves and each stage equals its scalar recompute") {
    val got = Pipeline.queries("p16_dedup_cascade")(spark, sf).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_in"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_out"))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq("1_url", "2_exact", "3_near"))
    // plumbing: removed = in - out, and each stage feeds the next
    got.foreach { case (st, in, rem, out) =>
      assert(rem == in - out && rem >= 0, s"funnel bookkeeping broke at $st")
    }
    assert(got(0)._4 == got(1)._2 && got(1)._4 == got(2)._2,
      "stage outputs must feed the next stage's input")
    // scalar stages 1-2: canonicalization folds spellings {0,1} (both
    // normalize to the ?id= query form) and {2,3} (both to the bare
    // path) of each doc_id/4 page — the canonical key is
    // (page, spelling/2); stage 1 keeps the min id of each pair;
    // stage 2 then drops exact-text dups keeping min id
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val all = docs ++ docs.filter(_._1 < 10).map { case (id, t) => (id + 1000000L, t) }
    assert(got(0)._2 == all.length.toLong, "stage-1 input must be corpus + replay")
    val s1 = all.groupBy(p => (p._1 / 4, (p._1 % 4) / 2))
      .map { case (_, g) => g.minBy(_._1) }.toSeq
    assert(got(0)._4 == s1.size.toLong, "URL survivors drifted vs the page election")
    val s2 = s1.groupBy(_._2).map { case (_, g) => g.minBy(_._1) }.toSeq
    assert(got(1)._4 == s2.size.toLong, "exact survivors drifted vs the text election")
    // stage 3: minhash signatures are per-doc, so pairs among the
    // stage-2 survivors are exactly d3's (oracle-gated) pairs
    // restricted to survivor endpoints; removal = any survivor with a
    // smaller surviving verified neighbor
    val surv2 = s2.map(_._1).toSet
    assert(surv2.forall(_ < 1000000L),
      "every replayed doc must be gone before the near-dup stage in this fixture")
    val rem3 = Dedup.queries("d3_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .filter { case (a, b) => surv2(a) && surv2(b) }
      .map(_._2).distinct.length
    assert(got(2)._3 == rem3.toLong, "near-dup removals drifted vs d3's verified pairs")
    // the fixture must exercise every stage
    got.foreach { case (st, _, rem, _) => assert(rem > 0, s"stage $st never fired") }
  }

  test("p17: each epoch is a bijective re-derivable order; epochs genuinely differ") {
    val got = Pipeline.queries("p17_epoch_shuffle")(spark, sf).collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Int]("shard"),
        r.getAs[Int]("pos_in_shard"), r.getAs[Long]("doc_id"), r.getAs[Long]("pos")))
    val nDocs = graft.Tables.documents(spark, sf).count()
    // bijection per epoch: every doc appears exactly once
    Seq(1, 2).foreach { ep =>
      val rows = got.filter(_._1 == ep)
      assert(rows.length.toLong == nDocs, s"epoch $ep must cover the corpus once")
      assert(rows.map(_._4).distinct.length.toLong == nDocs, s"epoch $ep repeats a doc")
      // position keys re-derive scalar-side (pure function, no RNG)
      rows.foreach { case (_, sh, _, id, pos) =>
        assert(pos == (id * 2654435761L + ep * 40503L + 12345L) % 2147483647L,
          s"position key must be re-derivable for doc $id")
        assert(sh == (pos % 16).toInt, s"shard must be the key range for doc $id")
      }
      // in-shard ranks are contiguous from 1 and ordered by pos
      rows.groupBy(_._2).values.foreach { sr =>
        val sorted = sr.sortBy(_._3)
        assert(sorted.map(_._3).toSeq == (1 to sr.length).toSeq)
        assert(sorted.sliding(2).forall(p => p.length < 2 ||
          p(0)._5 < p(1)._5 || (p(0)._5 == p(1)._5 && p(0)._4 < p(1)._4)),
          "in-shard order must follow the key")
      }
      // balance: no shard dominates (multiplicative hashing spreads)
      val sizes = rows.groupBy(_._2).values.map(_.length)
      assert(sizes.size == 16 && sizes.max < 2 * sizes.min,
        s"epoch $ep shards must be roughly balanced: $sizes")
      // the shuffle genuinely permutes: within-shard doc order must not
      // be sorted by doc_id (the degenerate no-shuffle outcome)
      assert(rows.groupBy(_._2).values.exists { sr =>
        val order = sr.sortBy(_._3).map(_._4)
        order != order.sorted
      }, s"epoch $ep looks unshuffled")
    }
    // different epochs produce different orders (the salt bites)
    val o1 = got.filter(_._1 == 1).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    val o2 = got.filter(_._1 == 2).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(o1 != o2, "epoch orders must differ")
  }

  test("p18: the labeling queue is the per-source most-uncertain top-k of t51's scores") {
    // Independent acquisition replay: take the trained scores from the
    // (separately scalar-replay-verified) t51 gate, rank per source by
    // (margin, doc_id) scalar-side, and the queue must match exactly.
    val scores = graft.ops.Text.queries("t51_quality_clf")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toMap
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val mid = graft.ops.Text.T51Scale / 2
    val want = srcOf.groupBy(_._2).map { case (src, docs) =>
      src -> docs.keys.toSeq
        .map(id => (id, scores(id), math.abs(scores(id) - mid)))
        .sortBy(t => (t._3, t._1)).take(4)
        .zipWithIndex.map { case ((id, sc, m), i) => (id, sc, m, i + 1) }
    }
    val got = Pipeline.queries("p18_label_queue")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("score"), r.getAs[Long]("margin"), r.getAs[Int]("rnk")))
    val gotBy = got.groupBy(_._1).view
      .mapValues(_.sortBy(_._5).map(t => (t._2, t._3, t._4, t._5)).toSeq).toMap
    assert(gotBy.keySet == want.keySet, "every source gets labeling budget")
    want.foreach { case (src, q) =>
      assert(gotBy(src) == q, s"queue drifted for source $src")
      // uncertainty ordering is real: margins non-decreasing with rank
      assert(q.map(_._3).sliding(2).forall(p => p.length < 2 || p.head <= p.last))
    }
    // the budget must be spread, not spent on one domain
    assert(want.size > 1 && got.length == want.size * 4)
  }
}
