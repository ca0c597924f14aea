package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("poly_grams matches a reference n-gram chain and guards short docs") {
    import graft.functions.{PolyHash, SimHashFunctions}
    val P = 2147483647L
    val words = Seq("alpha", "beta", "gamma", "delta", "beta", "gamma")
    def refGrams(ws: Seq[String], n: Int): Seq[Long] =
      ws.sliding(n).filter(_.length == n).map { g =>
        g.map(PolyHash.hash8).reduceLeft((acc, h) => (acc * 1000003L + h) % P)
      }.toSeq.distinct
    val df = spark.createDataFrame(Seq(Tuple1(words))).toDF("words")
    for (n <- Seq(2, 3, 13)) {
      val got = df.select(SimHashFunctions.poly_grams(col("words"), n).as("g"))
        .collect()(0).getSeq[Long](0)
      assert(got == refGrams(words, n), s"n=$n")
    }
    // shorter than n: empty, not an error (the descending-sequence trap)
    val short = df.select(SimHashFunctions.poly_grams(col("words"), 7).as("g"))
      .collect()(0).getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("decontamination flags exactly the docs sharing a 13-gram with the benchmark") {
    // contaminated docs straddle the doc_id % 11 boundary by construction
    val rows = Dedup.queries("d6_decontam")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") % 11 != 0)) // benchmark never flags itself
    assert(rows.forall { r =>
      r.getAs[Long]("n_hits") >= 1 && r.getAs[Long]("n_hits") <= r.getAs[Int]("n_grams")
    })
  }

  test("exact dedup finds exactly the planted re-ingests") {
    val rows = Dedup.queries("d1_exact_dedup")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getAs[Long]("dup_id") == r.getAs[Long]("canonical_id") + 1000000L))
    assert(rows.forall(_.getAs[Long]("n_copies") == 2L))
  }

  test("minhash-LSH recall: finds every pair exact shingle-Jaccard would flag") {
    // ground truth by brute force over all pairs (only feasible at sf0.001)
    val lsh = Dedup.queries("d3_minhash_lsh")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = graft.Tables.documents(spark, sf)
      .withColumn("words", Text.wordsCol(col("text")))
      .withColumn("hw", expr(s"transform(words, w -> ${Text.polyHashSql("w", 8)})"))
      .withColumn("shs", expr(
        """array_distinct(transform(
          |  arrays_zip(slice(hw, 1, size(hw)-2), slice(hw, 2, size(hw)-2), slice(hw, 3, size(hw)-2)),
          |  t -> ((((t['0'] % 2147483647) * 1000003 + t['1']) % 2147483647) * 1000003 + t['2']) % 2147483647))""".stripMargin))
      .select(col("doc_id"), col("shs"))
    val truth = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.shs"), col("b.shs"))).cast("double") /
          size(array_union(col("a.shs"), col("b.shs")))).as("jac"))
      .filter(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == truth,
      s"LSH missed ${truth -- lsh} / invented ${lsh -- truth}")
  }

  test("minhash estimate approximates true jaccard on the flagged pairs") {
    val rows = Dedup.queries("d3_minhash_lsh")(spark, sf).collect()
    assert(rows.nonEmpty)
    // flagged pairs carry exact-verified jaccard >= 0.5 by construction
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("simhash near pairs have genuinely close fingerprints") {
    val rows = Dedup.queries("d4_simhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      java.lang.Long.bitCount(r.getAs[Long]("fp_lo_a") ^ r.getAs[Long]("fp_lo_b")) +
        java.lang.Long.bitCount(r.getAs[Long]("fp_hi_a") ^ r.getAs[Long]("fp_hi_b")) ==
        r.getAs[Int]("hamming") && r.getAs[Int]("hamming") <= 6
    })
    // the planted exact re-ingests must surface with hamming 0
    val planted = rows.filter(_.getAs[Long]("id_b") >= 2000000L)
    assert(planted.count(_.getAs[Int]("hamming") == 0) >= 10)
  }

  test("16-bit bands keep simhash candidates near-linear at 1e5 docs") {
    // 10^5 synthetic docs of 30 random words each: with 8-bit bands
    // the expected band-collision count is 4·n²/2/256 ≈ 78M pairs —
    // the saturation ceiling; with 16-bit bands it is 4·n²/2/65536
    // ≈ 0.3M. Assert the candidate stage stays within 10·n, i.e. the
    // band join cannot degenerate toward all-pairs.
    val n = 100000L
    val fps = spark.range(n)
      .select(col("id").as("doc_id"),
        expr("transform(sequence(1, 30), i -> substring(md5(concat(id, '-', i)), 1, 8))")
          .as("words"))
      .select(col("doc_id"),
        graft.functions.SimHashFunctions.simhash32(col("words")).as("fp_lo"),
        graft.functions.SimHashFunctions.simhash37(col("words")).as("fp_hi"))
    val banded = fps.select(col("doc_id"), explode(expr(
      """array(
        |  concat('0:', fp_lo & 65535),
        |  concat('1:', shiftright(fp_lo, 16) & 65535),
        |  concat('2:', fp_hi & 65535),
        |  concat('3:', shiftright(fp_hi, 16) & 65535))""".stripMargin)).as("band"))
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .count()
    assert(cands < 10L * n, s"candidate explosion: $cands pairs for $n docs")
  }

  test("cluster labels converge in O(log n) rounds on a planted duplication chain") {
    // A 100-node CHAIN is the adversarial diameter case for connected
    // components: plain min-label propagation needs ~n rounds (the min
    // label travels one hop per round); pointer jumping doubles the
    // travelled distance per round, so ≤ ~2·log₂(n) rounds must
    // suffice — the property that keeps a pathological duplication
    // chain from turning d7 into a 100-round job at corpus scale.
    import spark.implicits._
    val n = 100
    val pairs = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
    val edges = pairs.toDF("src", "dst")
      .union(pairs.toDF("src", "dst").select(col("dst"), col("src")))
      .localCheckpoint(true)
    val (labels, rounds) = Dedup.clusterLabels(edges)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == n && got.values.forall(_ == 0L),
      "every chain node must resolve to the minimum label")
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt
    assert(rounds <= bound, s"chain of $n converged in $rounds rounds (bound $bound)")
  }

  test("incremental dedup: planted exact copies always hit the standing index") {
    // exact copies share every minhash, so their bands collide with
    // certainty — the increment gate can never be vacuous; truncated
    // near-dups surface whenever their bands collide (probabilistic,
    // but engine-identical, so the oracle pins whichever occur)
    val rows = Dedup.queries("d8_incremental_dedup")(spark, sf).collect()
    val exact = rows.filter { r =>
      r.getAs[Long]("new_id") == r.getAs[Long]("corpus_id") + 5000000L &&
        r.getAs[Double]("jaccard") == 1.0
    }
    assert(exact.map(_.getAs[Long]("corpus_id")).toSet.intersect(Set(0L, 1L, 2L)).size == 3,
      "all three exact-copy plants must match their originals at jaccard 1.0")
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("d7 leaves the shared session's conf untouched") {
    val conf = spark.conf
    val aqe0 = conf.get("spark.sql.adaptive.enabled")
    val sp0 = conf.get("spark.sql.shuffle.partitions")
    val rows = Dedup.queries("d7_dup_clusters")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(conf.get("spark.sql.adaptive.enabled") == aqe0)
    assert(conf.get("spark.sql.shuffle.partitions") == sp0)
    // canonical member is its own cluster and carries keep = 1
    assert(rows.filter(r => r.getAs[Long]("doc_id") == r.getAs[Long]("cluster"))
      .forall(_.getAs[Int]("keep") == 1))
  }

  test("d9: planted shared boilerplate dominates coverage; unique docs score zero") {
    // 30 docs = 15 unique-text docs + 15 docs that append a shared
    // 20-word boilerplate tail to otherwise-unique prefixes. Every
    // 13-gram fully inside the tail appears in 15 docs; grams of the
    // unique bodies appear once. The coverage metric must separate
    // the two populations with no overlap.
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val boiler = (1 to 20).map(i => s"tail$i").mkString(" ")
    val docs = (0 until 30).map { i =>
      val body = (1 to 30).map(j => s"u${i}w$j").mkString(" ")
      (i.toLong, if (i >= 15) s"$body $boiler" else body)
    }.toDF("doc_id", "text")
    val dir = s"target/tmp/graft-d9-${System.nanoTime()}" // build dir, not /tmp
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.queries("d9_gram_coverage")(spark, dir).collect()
    val (tailed, unique) = rows.partition(_.getAs[Long]("doc_id") >= 15)
    assert(unique.forall(_.getAs[Long]("n_dup_grams") == 0L),
      "unique docs must report zero duplicated grams")
    // 20-word tail ⇒ 8 fully-internal 13-grams per tailed doc, all shared
    assert(tailed.length == 15 &&
      tailed.forall(_.getAs[Long]("n_dup_grams") >= 8L),
      "every boilerplate tail must surface as duplicated grams")
  }

  test("d11: semantic dedup flags exactly the planted re-embeddings, original as keeper") {
    val rows = Dedup.queries("d11_semantic_dedup")(spark, sf).collect()
    assert(rows.length == 520, s"500 base + 20 planted, got ${rows.length}")
    // cells come from the 8-centroid codebook
    assert(rows.forall(r => (0L to 7L).contains(r.getAs[Long]("cell"))))
    val dups = rows.filter(_.getAs[Boolean]("is_dup"))
    // random 64-dim embeddings have no natural 0.999-cosine pairs, so
    // the dup set must be exactly the 20 drifted replicas — each
    // landing in its original's cell with the original as keeper
    assert(dups.length == 20, s"expected the 20 planted dups, got ${dups.length}")
    dups.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(id >= 1000000L, s"false positive on base vector $id")
      assert(r.getAs[Long]("keeper") == id - 1000000L,
        s"replica $id must dedup to its original")
      assert(r.getAs[Double]("max_cos") >= 0.999)
    }
    // kept rows carry no keeper/similarity
    assert(rows.filterNot(_.getAs[Boolean]("is_dup"))
      .forall(r => r.isNullAt(r.fieldIndex("keeper")) && r.isNullAt(r.fieldIndex("max_cos"))))
  }

  test("d12: the standing index grows mid-stream — wave 2 matches wave 1's content") {
    val rows = Dedup.queries("d12_stream_dedup")(spark, sf).collect()
    def pair(a: Long, b: Long) = rows.exists(r =>
      r.getAs[Long]("new_id") == a && r.getAs[Long]("matched_id") == b)
    // wave 1's exact re-crawls all match their corpus originals at 1.0
    (0L to 2L).foreach { i =>
      assert(pair(6000000L + i, i), s"wave-1 exact re-crawl of doc $i missed")
    }
    assert(rows.filter(_.getAs[Long]("new_id") < 7000000L)
      .filter(_.getAs[Long]("matched_id") < 3L)
      .forall(_.getAs[Double]("jaccard") == 1.0))
    // THE property: wave 2's re-delivery (7000000 = doc 0's text)
    // matches both the corpus original AND wave 1's id 6000000 — the
    // latter exists only because wave 1 entered the index before
    // wave 2 probed. A static index would emit only the former.
    assert(pair(7000000L, 0L), "wave-2 re-delivery must match the corpus original")
    assert(pair(7000000L, 6000000L),
      "wave-2 re-delivery must match wave 1's id — the index did not grow")
    // contract boundary: no within-wave pairs (both sides same wave)
    assert(rows.forall(r => r.getAs[Long]("new_id") > r.getAs[Long]("matched_id")))
    assert(!rows.exists(r => r.getAs[Long]("new_id") >= 6000000L &&
      r.getAs[Long]("matched_id") >= 6000000L && r.getAs[Long]("new_id") < 7000000L))
  }

  test("d12: the standing index survives a session restart — grown state read from storage") {
    val idx = java.nio.file.Files.createTempDirectory("d12-restart-")
    try {
      // first ingestion session: seeds the index from the corpus,
      // admits both waves into STORAGE
      Dedup.d12StreamDedupWithIndex(spark, sf, idx.toString)
      // "restart": a fresh session (new state, same storage) ingests
      // the same waves again against whatever the index dir holds
      val s2 = spark.newSession()
      val rows2 = Dedup.d12StreamDedupWithIndex(s2, sf, idx.toString).collect()
      // the re-delivered wave-1 ids are already IN the index: a match
      // of 6000000 against ITS OWN prior ingestion (jaccard 1.0) can
      // only exist if session 1's appends were read back from disk —
      // a rebuilt-from-corpus index has no 6000000 to match
      assert(rows2.exists(r => r.getAs[Long]("new_id") == 6000000L &&
        r.getAs[Long]("matched_id") == 6000000L &&
        r.getAs[Double]("jaccard") == 1.0),
        "grown index state did not survive the session restart")
      // and wave 2's fresh-id re-delivery now matches session 1's
      // SAME fresh id (7000000 vs 7000000) for the same reason
      assert(rows2.exists(r => r.getAs[Long]("new_id") == 7000000L &&
        r.getAs[Long]("matched_id") == 7000000L),
        "wave-2 appends did not survive the session restart")
    } finally graft.Fs.deleteRecursively(idx)
  }

  test("d13: the planted quote marks one island on every carrier, at any alignment") {
    val rows = Dedup.queries("d13_substring_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    // every 10th doc carries the 25-word quote prefix; its six
    // fully-interior gram positions (0..5) must mark and merge into
    // ONE island anchored at 0 and covering at least the quote —
    // shared continuations (two carriers whose own text begins
    // identically) may legitimately extend the right edge
    val carriers = byDoc.keys.filter(_ % 10 == 0)
    assert(carriers.nonEmpty, "no planted carrier surfaced")
    carriers.foreach { id =>
      val first = byDoc(id).minBy(_.getAs[Int]("span_start"))
      assert(first.getAs[Int]("span_start") == 0,
        s"carrier $id: the quote island must anchor at position 0")
      assert(first.getAs[Int]("span_end") >= 25,
        s"carrier $id: the island must cover the full 25-word quote")
    }
    // islands are maximal: per doc they never overlap or touch
    // within gram reach (a gap <= width would have merged)
    byDoc.values.foreach { docRows =>
      val sorted = docRows.sortBy(_.getAs[Int]("span_start"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Int]("span_start") - (a.getAs[Int]("span_end") - 20) > 20,
            "adjacent islands within merge reach — the merge is not maximal")
        case _ => ()
      }
    }
    rows.foreach { r =>
      assert(r.getAs[Int]("n_words") ==
        r.getAs[Int]("span_end") - r.getAs[Int]("span_start"))
      assert(r.getAs[Long]("n_grams") >= 1L)
    }
  }

  test("d14: the bloom funnel loses nothing vs exact d6, and actually prunes") {
    val bloom = Dedup.queries("d14_bloom_decontam")(spark, sf).collect()
    // funnel invariant per doc: hits ⊆ candidates ⊆ grams
    bloom.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_cand"))
      assert(r.getAs[Long]("n_cand") <= r.getAs[Int]("n_grams"))
    }
    // no false negatives BY CONSTRUCTION, proven against the exact
    // operator: d6's contaminated-doc ledger must be reproduced
    // row-for-row by d14's n_hits > 0 slice
    val exact = Dedup.queries("d6_decontam")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Long]("n_hits"), r.getAs[Double]("contam"))).toMap
    val flagged = bloom.filter(_.getAs[Long]("n_hits") > 0)
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Long]("n_hits"), r.getAs[Double]("contam"))).toMap
    assert(flagged == exact,
      "bloom-gated decontamination must agree exactly with the broadcast-exact-set operator")
    // and the filter is a real funnel, not a saturated pass-through
    // (the first cut's 1008-bit filter candidate-flagged 40% of ALL
    // grams; a sized filter flags barely more than the true hits)
    val cand = bloom.map(_.getAs[Long]("n_cand")).sum.toDouble
    val grams = bloom.map(_.getAs[Int]("n_grams").toLong).sum.toDouble
    assert(cand / grams < 0.05, s"bloom passed ${cand / grams} of grams — saturated filter")
  }

  test("d15: soft weights preserve exactly the hard-deduped corpus token mass") {
    val rows = Dedup.queries("d15_soft_dedup")(spark, sf).collect()
    // every planted re-ingest sits in a cluster >= 2 with weight 1/k
    (0 until 10).foreach { i =>
      val r = rows.find(_.getAs[Long]("doc_id") == 1000000L + i)
        .getOrElse(fail(s"planted copy ${1000000L + i} missing"))
      val k = r.getAs[Long]("cluster_size")
      assert(k >= 2, s"planted copy in a singleton cluster")
      assert(r.getAs[Double]("weight") == 1.0 / k)
    }
    // the defining invariant: summed effective tokens equal the token
    // mass of the HARD-deduped corpus (one representative per text) —
    // soft dedup changes sampling weights, not total content mass
    val eff = rows.map(_.getAs[Double]("eff_tokens")).sum
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val union = docs.union(docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val hard = union.dropDuplicates("text")
      .agg(sum(size(Text.wordsCol(col("text"))).cast("long"))).head().getLong(0)
    assert(math.abs(eff - hard) < 1e-6 * hard,
      s"effective mass $eff != deduped mass $hard")
  }

  test("d16: every doc's 3 rendered copies fold to ONE skeleton; distinct docs stay apart") {
    val rows = Dedup.queries("d16_template_dedup")(spark, sf).collect()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs,
      s"${rows.length} templates for $nDocs docs — renderings must collapse 3:1, nothing more")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pages") == 3L,
        s"template ${r.getAs[String]("tmpl_key")} has ${r.getAs[Long]("n_pages")} pages")
      val canon = r.getAs[Long]("canonical_page")
      assert(canon % 3 == 0 && r.getAs[Long]("last_page") == canon + 2,
        "the 3 copies of a doc are exactly pages 3·doc_id .. 3·doc_id+2")
    }
    assert(rows.map(_.getAs[String]("tmpl_key")).distinct.length == rows.length)
  }

  test("d17: canonicalization folds the four planted spellings to the two true pages") {
    val rows = graft.SparkEntry.queries("d17_url_dedup")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("url"), r.getAs[String]("canon"),
        r.getAs[Long]("keeper"), r.getAs[Long]("csize"), r.getAs[Int]("is_kept")))
    assert(rows.nonEmpty)
    // independent reference: the EXPECTED canonical form written out by
    // hand from the grammar — not by re-running the normalization chain
    def expectedCanon(id: Long): String = {
      val page = id / 4
      val base = s"http://www.site${page % 9}.com/doc$page"
      if (id % 4 <= 1) s"$base?id=$page" else base
    }
    val byCanon = rows.groupBy(_._3)
    for ((id, url, canon, keeper, csize, kept) <- rows) {
      assert(canon == expectedCanon(id), s"canon drifted for doc $id: $url -> $canon")
      val members = byCanon(canon).map(_._1)
      assert(keeper == members.min, s"keeper must be the min doc_id of the cluster")
      assert(csize == members.length.toLong)
      assert((kept == 1) == (id == keeper))
    }
    // every canonical cluster pairs exactly two raw spellings (the
    // fixture plants utm/clean and fragment/clean pairs), so URL dedup
    // halves the corpus — the crawl-shaped expectation
    assert(byCanon.values.forall(_.length == 2), "every planted cluster has exactly 2 members")
    assert(rows.count(_._6 == 1) * 2 == rows.length)
    // the raw spellings really differ within a cluster (the pass isn't
    // deduping byte-identical strings)
    assert(byCanon.values.forall(g => g.map(_._2).distinct.length == g.length))
  }

  test("d18: the provenance matrix is exactly d3's verified pairs regrouped by source") {
    val got = Dedup.queries("d18_overlap_matrix")(spark, sf).collect()
      .map(r => ((r.getAs[String]("src_1"), r.getAs[String]("src_2")),
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs_1"), r.getAs[Long]("n_docs_2"),
          r.getAs[Long]("jac_pm_sum"), r.getAs[Long]("mean_jac_pm")))).toMap
    assert(got.nonEmpty)
    // independent reference: d3's own (oracle-gated) pair output,
    // re-labeled and re-grouped scalar-side
    val srcOf = graft.Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val pairs = Dedup.queries("d3_minhash_lsh")(spark, sf).collect()
      .map { r =>
        val a = r.getAs[Long]("id_a"); val b = r.getAs[Long]("id_b")
        val jac = (r.getAs[Int]("n_common").toLong * 1000) / r.getAs[Int]("n_union")
        val (sa, sb) = (srcOf(a), srcOf(b))
        if (sa <= sb) (sa, sb, a, b, jac) else (sb, sa, b, a, jac)
      }
    val want = pairs.groupBy(p => (p._1, p._2)).map { case (k, ps) =>
      k -> ((ps.length.toLong, ps.map(_._3).distinct.length.toLong,
        ps.map(_._4).distinct.length.toLong, ps.map(_._5).sum,
        ps.map(_._5).sum / ps.length))
    }
    assert(got == want, "matrix must equal the scalar regroup of d3's pairs")
    // verified pairs all passed jaccard >= 0.5, so means sit in [500, 1000]
    got.values.foreach { case (_, _, _, _, m) => assert(m >= 500L && m <= 1000L) }
    // provenance must be non-trivial both ways in the planted fixture
    assert(got.keys.exists(k => k._1 == k._2), "within-source redundancy must appear")
    assert(got.keys.exists(k => k._1 != k._2), "cross-source contamination must appear")
  }

  test("d19: every config's counts equal a scalar re-banding of the same signatures") {
    val got = Dedup.queries("d19_lsh_tuning")(spark, sf).collect()
      .map(r => r.getAs[String]("config") ->
        ((r.getAs[Long]("n_cand"), r.getAs[Long]("n_true"), r.getAs[Long]("tp"),
          r.getAs[Long]("precision_pm"), r.getAs[Long]("recall_pm")))).toMap
    assert(got.keySet == Set("2x8", "4x4", "8x2"))
    // scalar reference: shingle sets -> exact truth; signatures -> hand
    // re-banded candidates per config
    val sample = Dedup.shingleSetDF(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 200).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getSeq[Long](r.fieldIndex("shs")).toSet))
    val truth = (for {
      (a, sa) <- sample; (b, sb) <- sample if a < b
      if sb.nonEmpty || sa.nonEmpty
      j = if ((sa | sb).isEmpty) 0.0 else (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.5
    } yield (a, b)).toSet
    val sig = Dedup.minhashSig(
      Dedup.shingleSetDF(spark, sf)
        .filter(org.apache.spark.sql.functions.col("doc_id") < 200)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (1 to 16).map(j => r.getAs[Long](s"mh$j")).toVector).toMap
    for (nb <- Seq(2, 4, 8)) {
      val rows = 16 / nb
      val byBand = sig.toSeq.flatMap { case (id, mh) =>
        (0 until nb).map(b => (b, mh.slice(b * rows, (b + 1) * rows)) -> id)
      }.groupBy(_._1).values.map(_.map(_._2).sorted)
      val cand = byBand.flatMap(ids =>
        for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))).toSet
      val tp = (cand & truth).size.toLong
      val want = (cand.size.toLong, truth.size.toLong, tp,
        if (cand.nonEmpty) tp * 1000 / cand.size else 0L,
        if (truth.nonEmpty) tp * 1000 / truth.size else 0L)
      assert(got(s"${nb}x$rows") == want, s"config ${nb}x$rows drifted vs scalar re-banding")
    }
    // the knob must genuinely move the curve on this corpus
    assert(got.values.map(_._1).toSeq.distinct.length > 1,
      "all configs produced identical candidate sets - the eval is vacuous")
    assert(truth.nonEmpty)
  }
}
