package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("t32 survives degenerate documents (0/1-word) and drops them like the oracle") {
    // Spark's sequence(1, 0) is the DESCENDING [1, 0]; without the
    // size guard the bigram transform evaluates element_at(ws, 0) and
    // the whole job throws on any 0/1-word doc. The guard must make
    // such docs silently bigram-free — matching DuckDB's empty
    // generate_series — while normal docs still score.
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (0L, ""), // empty
      (1L, "single"), // one word
      (2L, "   "), // whitespace only
      (3L, "alpha beta alpha beta gamma"),
      (4L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val dir = s"target/tmp/graft-t32-${System.nanoTime()}" // build dir, not /tmp
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Text.queries("t32_bigram_lm")(spark, dir).collect()
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(3L, 4L), s"degenerate docs must drop out, got $ids")
    assert(rows.forall(_.getAs[Long]("n_bigrams") > 0))
  }

  test("t34 decomposed tertile rank equals the global sort rank") {
    // t34 computes rnk WITHOUT a global sort (score-distribution
    // cumulative + per-score window); this check recomputes the
    // textbook row_number(ORDER BY avg_score DESC, doc_id) in memory
    // and demands bit-equality — the decomposition must be exact.
    val rows = Text.queries("t34_ppl_buckets")(spark, "/root/testdata/sf0.001").collect()
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_.getAs[Long]("rnk")).toSet == (1L to n.toLong).toSet,
      "rnk must be a permutation of 1..n")
    val expected = rows
      .sortBy(r => (-r.getAs[Long]("avg_score"), r.getAs[Long]("doc_id")))
      .zipWithIndex
      .map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1L) }
      .toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("rnk") == expected(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: decomposed rank diverged")
    }
    // all three buckets non-empty and sized by the integer-thirds rule
    val sizes = rows.groupBy(_.getAs[String]("bucket")).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set("head", "middle", "tail"), s"got $sizes")
    def cnt(p: Long => Boolean) = (1L to n.toLong).count(p)
    assert(sizes("head") == cnt(r => (r - 1) * 3 < n))
    assert(sizes("middle") == cnt(r => (r - 1) * 3 >= n && (r - 1) * 3 < 2L * n))
    // kept ⇔ not tail, and kept docs never score below a tail doc
    assert(rows.forall(r =>
      r.getAs[Boolean]("kept") == (r.getAs[String]("bucket") != "tail")))
    val keptMin = rows.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("avg_score")).min
    val tailMax = rows.filterNot(_.getAs[Boolean]("kept")).map(_.getAs[Long]("avg_score")).max
    assert(keptMin >= tailMax)
  }

  test("t35: the planted banner is boilerplate in every carrier, and the ledger is internally exact") {
    val rows = Text.queries("t35_boilerplate")(spark, sf).collect()
    val n = graft.Tables.documents(spark, sf).count()
    assert(rows.length == n, "every doc gets a ledger row")
    val vocab = rows.head.getAs[Long]("n_boiler_corpus")
    assert(rows.forall(_.getAs[Long]("n_boiler_corpus") == vocab),
      "the boilerplate vocabulary size must ride every row unchanged")
    assert(vocab >= 1, "the planted banner segment alone guarantees a non-empty vocabulary")
    rows.foreach { r =>
      val (segs, boiler) = (r.getAs[Long]("n_segs"), r.getAs[Long]("n_boiler"))
      assert(segs >= 1 && boiler >= 0 && boiler <= segs)
      assert(r.getAs[Double]("keep_ratio") == (segs - boiler).toDouble / segs)
      // every banner carrier drops at least its banner segment
      if (r.getAs[Long]("doc_id") % 25 == 0)
        assert(boiler >= 1, s"doc ${r.getAs[Long]("doc_id")} kept its planted banner")
    }
    // the removal is targeted, not a purge: most segments survive
    val keep = rows.map(r => r.getAs[Long]("n_segs") - r.getAs[Long]("n_boiler")).sum.toDouble /
      rows.map(_.getAs[Long]("n_segs")).sum
    assert(keep > 0.5, s"boilerplate threshold swallowed the corpus (keep=$keep)")
  }

  test("t36: each Gopher rule fires on its planted class, and keep is the exact conjunction") {
    val rows = Text.queries("t36_gopher_rules")(spark, sf).collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // planted structural classes must trip exactly their own rule
      if (id % 7 == 0) {
        assert(r.getAs[Double]("bullet_ratio") == 1.0, s"doc $id: fully-bulleted plant")
        assert(r.getAs[Int]("r_bullet") == 0)
      }
      if (id % 11 == 0) {
        assert(r.getAs[Double]("ellip_ratio") == 1.0, s"doc $id: all-ellipsis plant")
        assert(r.getAs[Int]("r_ellip") == 0)
      }
      if (id % 4 == 0) {
        // no planted symbols: the symbol and alpha rules must pass
        assert(r.getAs[Int]("n_extra") == 0)
        assert(r.getAs[Double]("symbol_ratio") == 0.0 && r.getAs[Int]("r_symbol") == 1)
        assert(r.getAs[Double]("alpha_ratio") == 1.0 && r.getAs[Int]("r_alpha") == 1)
      }
      // keep is the conjunction of the seven flags, nothing else
      val flags = Seq("r_words", "r_wordlen", "r_symbol", "r_bullet",
        "r_ellip", "r_alpha", "r_stop").map(r.getAs[Int](_))
      assert(flags.forall(f => f == 0 || f == 1))
      assert(r.getAs[Int]("keep") == flags.product,
        s"doc $id: keep must be the exact conjunction")
    }
    // the panel discriminates: every rule passes somewhere, fails somewhere,
    // and the conjunction keeps a nontrivial slice without keeping everything
    Seq("r_symbol", "r_bullet", "r_ellip", "r_alpha").foreach { f =>
      val passes = rows.count(_.getAs[Int](f) == 1)
      assert(passes > 0 && passes < rows.length, s"rule $f never discriminates")
    }
    val kept = rows.count(_.getAs[Int]("keep") == 1)
    assert(kept > 0 && kept < rows.length)
  }

  test("t38: leakage comes only from the planted near-dup straddle, and is side-symmetric") {
    val rows = Text.queries("t38_split_leakage")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("split")).toSet == Set("train", "test"))
    val byS = rows.map(r => r.getAs[String]("split") -> r).toMap
    // crossing grams are the SAME set seen from either side
    assert(byS("train").getAs[Long]("n_leaked_grams") ==
      byS("test").getAs[Long]("n_leaked_grams"),
      "a crossing gram is counted on both sides by definition")
    // the plant must actually straddle: some leak on both sides, and
    // leaked docs stay a small slice (the boundary is mostly sound)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_leaked_docs") > 0, s"${r.getAs[String]("split")}: plant missed")
      assert(r.getAs[Long]("n_leaked_docs") * 5 < r.getAs[Long]("n_docs"),
        "leakage must be the exception, not the corpus")
      assert(r.getAs[Double]("leak_rate") ==
        r.getAs[Long]("n_leaked_grams").toDouble / r.getAs[Long]("n_grams"))
    }
    // sizes: corpus + one variant per 17th doc, split-partitioned —
    // restricted to docs long enough to yield a 13-gram at all (a
    // shorter doc produces no gram rows and is invisible to a
    // gram-level audit; the variants gain 2 prefix words)
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(Text.wordsCol(col("text"))).as("nw"))
    val n = docs.filter(col("nw") >= 13).count()
    val planted = docs.filter(col("doc_id") % 17 === 0 && col("nw") + 2 >= 13).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n + planted)
  }

  test("t39: novelty conserves distinct grams, and the first document is fully novel") {
    val rows = Text.queries("t39_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the earliest document in ingest order can only contain
    // first-occurrence grams
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("novelty_permille") == 1000L,
      "the first ingested document must be fully novel")
    // conservation: each distinct gram is novel in EXACTLY one
    // document (its min-doc), so novel counts sum to the distinct
    // gram count of the corpus
    import org.apache.spark.sql.functions.{col, explode}
    val distinctGrams = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.SimHashFunctions
        .poly_grams(Text.wordsCol(col("text")), 13)).as("gram"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum == distinctGrams,
      "novelty must partition the distinct gram set")
    // per-mille bounds
    rows.foreach { r =>
      val p = r.getAs[Long]("novelty_permille")
      assert(p >= 0 && p <= 1000)
    }
  }

  test("t43: packing conserves tokens, fills every non-final sequence, leaves no gaps") {
    import org.apache.spark.sql.functions.{col, size, sum}
    val frags = graft.SparkEntry.queries("t43_seq_pack")(spark, sf).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("start_in_seq"), r.getAs[Long]("frag_tokens")))
    assert(frags.nonEmpty)
    // conservation: every token of every doc lands in exactly one fragment
    val corpusTok = graft.Tables.documents(spark, sf)
      .select(size(Text.wordsCol(col("text"))).cast("long").as("t"))
      .agg(sum("t")).head().getLong(0)
    assert(frags.map(_._5).sum == corpusTok, "fragment tokens must sum to the corpus")
    frags.groupBy(f => (f._1, f._2)).foreach { case ((shard, seq), fs) =>
      // within a sequence: fragments tile [0, fill) with no gaps or overlap
      val sorted = fs.sortBy(_._4)
      var pos = 0L
      sorted.foreach { f =>
        assert(f._4 == pos, s"shard $shard seq $seq: gap at $pos (fragment starts ${f._4})")
        assert(f._5 > 0, "empty fragment")
        pos += f._5
      }
      assert(pos <= 128, s"shard $shard seq $seq overfilled to $pos")
    }
    // every sequence except each shard's LAST is exactly full
    val fill = frags.groupBy(f => (f._1, f._2)).view.mapValues(_.map(_._5).sum).toMap
    val lastSeq = frags.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    fill.foreach { case ((shard, seq), tok) =>
      if (seq != lastSeq(shard))
        assert(tok == 128, s"shard $shard seq $seq holds $tok of 128 tokens")
    }
    // docs are packed in doc_id order within a shard: fragment order
    // by (seq, start) must equal doc_id order
    frags.groupBy(_._1).foreach { case (_, fs) =>
      val byPos = fs.sortBy(f => (f._2, f._4)).map(_._3)
      val expectOrder = byPos.distinct.sorted
      assert(byPos.distinct.toSeq == expectOrder.toSeq, "packing must follow doc_id order")
    }
  }

  test("t44: DSIR weights favor target-distribution documents and match a scalar reference") {
    import org.apache.spark.sql.functions.col
    val rows = graft.SparkEntry.queries("t44_dsir")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_feats"),
        r.getAs[Long]("score_sum"), r.getAs[Long]("avg_ratio")))
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // scalar reference: same hashed-unigram distributions, no shared code
    val B = Text.DsirBuckets
    def bucket(w: String): Long = {
      val h = (1 to 8).map { k =>
        val c = if (k <= w.length) w.charAt(k - 1).toLong else 0L
        c * (1 to (8 - k)).foldLeft(1L)((a, _) => a * 31L)
      }.sum
      h % B
    }
    val words = docs.map { case (id, lang, t) =>
      (id, lang, t.trim.split(" ").filter(_.nonEmpty).map(bucket)) }
    val cQ = words.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cT = words.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nQ = cQ.values.sum; val nT = cT.values.sum
    def ratio(b: Long): Long =
      (1000000L * (cT.getOrElse(b, 0L) + 1L) * (nQ + B)) /
        ((cQ(b) + 1L) * (nT + B))
    val want = words.filter(_._3.nonEmpty).map { case (id, _, bs) =>
      val s = bs.map(ratio).sum
      (id, bs.length.toLong, s, s / bs.length)
    }.sortBy(_._1).toSeq
    assert(rows.toSeq == want)
    // the weights must discriminate: English docs (the target slice)
    // score higher on average than the rest
    val byLang = docs.map(d => d._1 -> d._2).toMap
    val (en, other) = rows.partition(r => byLang(r._1) == "en")
    assert(en.nonEmpty && other.nonEmpty)
    val enAvg = en.map(_._4).sum.toDouble / en.length
    val otherAvg = other.map(_._4).sum.toDouble / other.length
    assert(enAvg > otherAvg,
      s"target-slice mean avg_ratio $enAvg must exceed off-target $otherAvg")
  }

  test("t45: frequency-rollup medians equal the scalar sort-based median/MAD") {
    import org.apache.spark.sql.functions.col
    val rows = graft.SparkEntry.queries("t45_mad_outliers")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("med"), r.getAs[Long]("dev"),
        r.getAs[Long]("mad"), r.getAs[Int]("is_outlier")))
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // scalar reference: lower median by full sort, per source
    def kth(vs: Seq[Long]): Long = vs.sorted.apply(((vs.length + 1) / 2) - 1)
    val med = docs.groupBy(_._2).view.mapValues(g => kth(g.map(_._3).toSeq)).toMap
    val mad = docs.groupBy(_._2).view
      .mapValues(g => kth(g.map(d => math.abs(d._3 - med(d._2))).toSeq)).toMap
    assert(rows.length == docs.length)
    for ((id, src, nc, m, dv, md, out) <- rows) {
      assert(m == med(src), s"median drifted for $src")
      assert(md == mad(src), s"MAD drifted for $src")
      assert(dv == math.abs(nc - m))
      assert(out == (if (dv > 3 * md) 1 else 0), s"flag wrong for doc $id")
    }
    // the statistic must discriminate but not flag everything
    val flagged = rows.count(_._7 == 1)
    assert(flagged > 0, "fixture must contain at least one length outlier")
    assert(flagged < rows.length / 10, "MAD must not flag a tenth of the corpus")
  }

  test("t46: integer PMI ranking equals the scalar reference and orders by true association") {
    import org.apache.spark.sql.functions.col
    val rows = graft.SparkEntry.queries("t46_collocations")(spark, sf).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"), r.getAs[Long]("c_ab"),
        r.getAs[Long]("c_a"), r.getAs[Long]("c_b"), r.getAs[Long]("n_words"),
        r.getAs[Long]("pmi_score")))
    assert(rows.nonEmpty)
    // scalar reference: recount everything from the raw text
    val texts = graft.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val wordsPerDoc = texts.map(_.trim.split(" ").filter(_.nonEmpty).toSeq)
    val uni = wordsPerDoc.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = uni.values.sum
    val bg = wordsPerDoc.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val wantAll = bg.filter(_._2 >= 5).toSeq.map { case ((a, b), cab) =>
      (a, b, cab, uni(a), uni(b), n, ((cab * 1000000L) / uni(a)) * n / uni(b))
    }
    val want = wantAll.sortBy { case (a, b, _, _, _, _, s) => (-s, a, b) }.take(100)
    assert(rows.toSeq == want, "top-100 collocations must equal the scalar reference exactly")
    // the score must rank by true association: the top entry's
    // observed/expected ratio (as a rational) dominates the bottom's —
    // cross-multiplied so the check stays integer-exact
    val top = rows.head; val bot = rows.last
    assert(top._3 * n * bot._4 * bot._5 >= bot._3 * n * top._4 * top._5,
      "PMI order must follow the exact rational observed/expected ratio")
    // min-support floor: nothing below 5 may appear
    assert(rows.forall(_._3 >= 5))
  }

  test("t48: per-lang fertility conserves against the per-doc t41 encode exactly") {
    val got = Text.queries("t48_fertility")(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("n_bpe_tokens"),
        r.getAs[Long]("fertility_pm"), r.getAs[Long]("chars_per_tok_pm")))
    assert(got.nonEmpty)
    // independent weld: t41's per-doc rollup (its own oracle-gated
    // output) summed by the document's lang must land on the SAME
    // totals — the two queries share only the trained artifact, not
    // the aggregation path
    val langOf = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val perDoc = Text.queries("t41_bpe_encode")(spark, sf).collect()
      .map(r => (langOf(r.getAs[Long]("doc_id")), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("n_bpe_tokens")))
    val byLang = perDoc.groupBy(_._1).map { case (l, rs) =>
      l -> ((rs.map(_._2).sum, rs.map(_._3).sum, rs.map(_._4).sum))
    }
    assert(got.map(_._1).toSet == byLang.keySet, "lang coverage must match")
    for ((lang, nw, nc, nt, fert, cpt) <- got) {
      val (ww, cc, tt) = byLang(lang)
      assert((nw, nc, nt) == (ww, cc, tt), s"totals drifted for lang $lang")
      // every word is >= 1 token and <= chars+1 tokens (untrained worst case)
      assert(nt >= nw && nt <= nc + nw, s"token mass out of bounds for $lang")
      assert(fert == 1000L * nt / nw && fert >= 1000L, s"fertility wrong for $lang")
      assert(cpt == 1000L * nc / nt, s"compression wrong for $lang")
    }
    // the metric must discriminate: training on the corpus mix leaves
    // languages with genuinely different merge coverage
    assert(got.map(_._5).distinct.length > 1,
      "fixture must show fertility differences across languages")
  }

  test("t49: growth curve equals a scalar first-occurrence recompute and conserves") {
    val got = Text.queries("t49_vocab_growth")(spark, sf).collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_new_types"), r.getAs[Long]("cum_tokens"),
        r.getAs[Long]("vocab_size"), r.getAs[Long]("types_per_mtok")))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0 until 10), "exactly the 10 prefix buckets")
    // scalar reference: same tokenization, hand-run bucket split and
    // first-occurrence election
    val docs = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        Text.wordsCol(org.apache.spark.sql.functions.col("text")).as("ws"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getSeq[String](r.fieldIndex("ws"))))
    val nDocs = docs.map(_._1).max + 1
    val toks = docs.flatMap { case (id, ws) => ws.map(w => ((id * 10 / nDocs).toInt, w)) }
    val tokCount = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val firstB = toks.groupBy(_._2).map { case (w, bs) => (w, bs.map(_._1).min) }
    val newTypes = firstB.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    var cumT = 0L; var cumV = 0L
    for ((b, nt, nn, ct, vs, tpm) <- got) {
      assert(nt == tokCount.getOrElse(b, 0L), s"token count drifted in bucket $b")
      assert(nn == newTypes.getOrElse(b, 0L), s"new-type count drifted in bucket $b")
      cumT += nt; cumV += nn
      assert(ct == cumT && vs == cumV, s"cumulative bookkeeping broke at bucket $b")
      assert(tpm == cumV * 1000000L / cumT, s"Heaps ratio wrong at bucket $b")
    }
    assert(cumV == firstB.size.toLong, "final vocab must equal the corpus vocabulary")
    assert(cumT == toks.length.toLong, "token mass must conserve")
    // Heaps' law on real-ish text: the curve must flatten overall —
    // later data buys fewer new types per token than the first bucket
    assert(got.last._6 < got.head._6,
      "vocabulary density failed to decay - the curve is vacuous")
  }

  test("t50: the decile profile equals a scalar rank-frequency recompute") {
    val got = Text.queries("t50_zipf_fit")(spark, sf).collect()
      .map(r => (r.getAs[Int]("decile"), r.getAs[Long]("n_in_decile"),
        r.getAs[Long]("rank_lo"), r.getAs[Long]("rank_hi"),
        r.getAs[Long]("freq_mass"), r.getAs[Long]("rf_sum"), r.getAs[Long]("mean_rf")))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (0 until 10), "exactly ten rank deciles")
    // scalar reference: same tokenization, hand-ranked vocabulary
    val words = graft.Tables.documents(spark, sf)
      .select(Text.wordsCol(org.apache.spark.sql.functions.col("text")).as("ws"))
      .collect().flatMap(_.getSeq[String](0))
    val uni = words.groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val ranked = uni.sortBy { case (w, c) => (-c, w) }.zipWithIndex
      .map { case ((w, c), i) => (i + 1L, c) }
    val n = ranked.length.toLong
    val byDec = ranked.groupBy { case (r, _) => (((r - 1) * 10) / n).toInt }
    for ((dec, nd, lo, hi, fm, rf, mrf) <- got) {
      val ws2 = byDec(dec)
      assert(nd == ws2.length.toLong, s"type count drifted in decile $dec")
      assert(lo == ws2.map(_._1).min && hi == ws2.map(_._1).max,
        s"rank bounds drifted in decile $dec")
      assert(fm == ws2.map(_._2).sum, s"frequency mass drifted in decile $dec")
      assert(rf == ws2.map(p => p._1 * p._2).sum, s"rank-freq mass drifted in decile $dec")
      assert(mrf == rf / nd)
    }
    // conservation + the Zipf shape this corpus actually has: the head
    // decile concentrates frequency mass far above the tail decile
    assert(got.map(_._5).sum == words.length.toLong, "token mass must conserve")
    assert(got.head._5 > got.last._5 * 2,
      "no head concentration - the frequency ladder is degenerate")
  }

  test("t51 trained classifier equals a scalar fixed-point LR bit-for-bit and learns") {
    // Independent scalar replay of the WHOLE training loop — hashed
    // per-mille rate features, hard-sigmoid link, positive-remainder
    // floor division, 8 full-batch rounds — in plain Scala Longs; the
    // distributed result must match per-doc scores EXACTLY (integer
    // training is deterministic or it is wrong).
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val B = Text.T51Buckets
    def ph(w: String): Long =
      (1 to 8).map { k =>
        val c = if (k <= w.length) w.charAt(k - 1).toLong else 0L
        c * (1 to (8 - k)).foldLeft(1L)((a, _) => a * 31L)
      }.sum
    def fdiv(a: Long, d: Long): Long = Math.floorDiv(a, d)
    val docs = rows.map { case (id, text, source) =>
      val ws = text.trim.split(" ").filter(_.nonEmpty)
      val y = if (source.drop(3).toInt < 10) 1L else 0L
      val cnt = ws.groupBy(w => (ph(w) % B).toInt).view.mapValues(_.length.toLong)
      val feats = cnt.map { case (b, c) => b -> 1000L * c / ws.length }.toMap +
        (B -> 1000L)
      (id, y, feats)
    }
    val n = docs.length.toLong
    val w = Array.fill(B + 1)(0L)
    (1 to Text.T51Rounds).foreach { _ =>
      val grad = Array.fill(B + 1)(0L)
      docs.foreach { case (_, y, feats) =>
        val m = fdiv(feats.map { case (b, x) => w(b) * x }.sum, 1000L)
        val p = math.max(0L, math.min(1000000L, 500000L + fdiv(m, 4L)))
        val err = y * 1000000L - p
        feats.foreach { case (b, x) => grad(b) += fdiv(err * x, 1000L) }
      }
      (0 to B).foreach(b => w(b) += fdiv(grad(b), n))
    }
    val want = docs.map { case (id, y, feats) =>
      val m = fdiv(feats.map { case (b, x) => w(b) * x }.sum, 1000L)
      val score = math.max(0L, math.min(1000000L, 500000L + fdiv(m, 4L)))
      id -> ((y, score))
    }.toMap
    val got = Text.queries("t51_quality_clf")(spark, sf).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (y, score) = want(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("label") == y.toInt)
      assert(r.getAs[Long]("score") == score,
        s"score drifted for doc ${r.getAs[Long]("doc_id")}: got ${r.getAs[Long]("score")}, want $score")
      assert(r.getAs[Int]("pred") == (if (score >= 500000L) 1 else 0))
      assert(r.getAs[Int]("correct") == (if ((score >= 500000L) == (y == 1L)) 1 else 0))
    }
    // training must BEAT the majority class — the fixture's planted
    // per-source signatures are weak (float-LR ceiling ~0.60 train
    // accuracy), so the bar is "learned anything", not a vanity 0.9
    val acc = got.map(_.getAs[Int]("correct").toLong).sum.toDouble / got.length
    val pos = docs.count(_._2 == 1L)
    val base = math.max(pos, docs.length - pos).toDouble / docs.length
    info(f"t51 train accuracy $acc%.3f vs majority baseline $base%.3f")
    assert(acc > base + 0.02, f"classifier failed to learn: $acc%.3f <= $base%.3f")
    assert(w.exists(_ != 0L), "weights never moved")
  }
}
