package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Sketch-family guarantees the oracle gate can't express: the gate
  * proves both engines compute the same numbers; these prove the
  * numbers mean what the sketch contract says (error envelopes,
  * one-sidedness, set containment).
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("sk4: HLL estimate lands within the m=64 error envelope") {
    // sf0.01 puts every group's cardinality (~1000+) well past the
    // small-range regime, where the raw estimator's 1.04/√64 ≈ 13%
    // standard error applies; 3σ + slack = a 50% acceptance band that
    // a broken hash or register map cannot pass (it would be off by
    // orders of magnitude, not percent).
    val rows = graft.SparkEntry
      .queries("sk4_hll_distinct")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nExact = r.getAs[Long]("n_exact")
      val mUsed = r.getAs[Int]("m_used")
      val est = r.getAs[Long]("est")
      assert(mUsed >= 1 && mUsed <= 64)
      assert(nExact >= 64, s"sf0.01 group cardinality should exceed m, got $nExact")
      assert(math.abs(est - nExact).toDouble / nExact < 0.5,
        s"est=$est exact=$nExact drifted outside the envelope")
    }
  }

  test("sk6: union estimates track exact cardinality; intersection stays bounded") {
    val rows = graft.SparkEntry
      .queries("sk6_kmv_setops")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 3, "3 return-flag pairs")
    rows.foreach { r =>
      val (est, exact) =
        (r.getAs[Long]("est_union"), r.getAs[Long]("n_exact_union"))
      val (mInter, estInter) =
        (r.getAs[Int]("m_inter"), r.getAs[Long]("est_inter"))
      // k=64 ⇒ ~1/√62 ≈ 13% std error; 50% band rejects broken algebra
      assert(math.abs(est - exact).toDouble / exact < 0.5,
        s"union est $est vs exact $exact")
      assert(mInter >= 0 && mInter <= 64)
      assert(estInter >= 0 && estInter <= est,
        "intersection can never exceed the union")
    }
  }

  test("sk3: count-min never underestimates (one-sided error)") {
    val rows = graft.SparkEntry
      .queries("sk3_count_min")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("over_ok") == 1),
      "CMS estimates must dominate true counts")
  }

  test("sk5: histogram bin contains the exact ceil(q·n)-th order statistic") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("sk5_histogram")(spark, sf).collect()
    assert(rows.nonEmpty)
    // The sketch picks the first bin whose cumulative count reaches
    // rank ceil(q·n) — so that ORDER STATISTIC (not the interpolated
    // percentile, which interpolation can pull into a neighboring bin
    // on a sparse distribution) is guaranteed to lie in
    // [p_lo, p_lo + 50000).
    val ranked = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("grp"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
      .withColumn("rn", row_number().over(Window.partitionBy("grp").orderBy("v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
    // integer cross-multiplication for the rank, same as the sketch —
    // ceil(n * 0.9) in doubles can overshoot the rank by one
    def orderStat(qPct: Int): Map[String, Long] = ranked
      .filter(col("rn") === expr(s"CAST((n * $qPct + 99) DIV 100 AS INT)"))
      .select("grp", "v").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("v")).toMap
    val (os50, os90) = (orderStat(50), orderStat(90))
    rows.foreach { r =>
      val grp = r.getAs[String]("grp")
      val p50lo = r.getAs[Long]("p50_lo_cents")
      val p90lo = r.getAs[Long]("p90_lo_cents")
      assert(os50(grp) >= p50lo && os50(grp) < p50lo + 50000,
        s"p50: order stat ${os50(grp)} outside bin [$p50lo, ${p50lo + 50000})")
      assert(os90(grp) >= p90lo && os90(grp) < p90lo + 50000,
        s"p90: order stat ${os90(grp)} outside bin [$p90lo, ${p90lo + 50000})")
    }
  }

  test("sk7: the sample is a pure function of the data — any partitioning, same rows") {
    import org.apache.spark.sql.functions._
    val bottomK = udaf(graft.functions.BottomKSampleAgg)
    def sampleWith(parts: Int): Seq[(String, String, Long)] =
      graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .repartition(parts)
        .select(col("source"), md5(col("doc_id").cast("string")).as("h"), col("doc_id"))
        .groupBy("source")
        .agg(bottomK(col("h"), col("doc_id")).as("picks"))
        .select(col("source"), explode(col("picks")).as("p"))
        .select(col("source"), col("p._1"), col("p._2"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted
    val a = sampleWith(1)
    val b = sampleWith(7)
    val c = sampleWith(32)
    assert(a == b && b == c, "merge order must not change the sample")
    assert(a.groupBy(_._1).forall(_._2.length <= 4), "at most k per group")
  }

  test("sk2: the bloom maybe-set contains every true member") {
    val rows = graft.SparkEntry
      .queries("sk2_bloom_filter")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_maybe") >= r.getAs[Long]("n_true"),
        "a bloom filter has no false negatives")
    }
  }

  test("sk8: DP noise replays the exact discrete-Laplace ladder, and the ladder is sound") {
    // The threshold ladder itself: masses must be the exact discrete-
    // Laplace probabilities at alpha = 1/2 scaled by U = 3*2^40 -
    // P(0)*U = 2^40, P(+-k)*U = 2^(40-k) per sign - summing to
    // EXACTLY U - 2 (the infinite tail beyond +-40 carries exactly 2
    // units of U, which the ELSE folds into 0) and MONOTONE.
    val bounds = Sketch.DpBounds
    assert(bounds.head == (1L << 40, 0L), "center mass must be U/3 = 2^40")
    assert(bounds.map(_._1) == bounds.map(_._1).sorted, "ladder must ascend")
    assert(Sketch.DpScale - bounds.last._1 == 2L,
      "truncated tail must be exactly 2 units of U")
    (1 to Sketch.DpMaxNoise).foreach { k =>
      val m = 1L << (40 - k)
      val plus = bounds(2 * k - 1)._1 - bounds(2 * k - 2)._1
      val minus = bounds(2 * k)._1 - bounds(2 * k - 1)._1
      assert(plus == m && minus == m, s"mass drifted at |z|=$k")
      assert(bounds(2 * k - 1)._2 == k.toLong && bounds(2 * k)._2 == -k.toLong)
    }
    // Independent scalar replay: java MD5 + the same hex decode (96
    // bits: hi 12 hex chars, lo 12) + exact wide reduction + ladder
    // walk must reproduce every group's noise bit-for-bit.
    def noiseOf(lang: String, source: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dp1|$lang|$source".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      def dec(s: String) = s.foldLeft(0L)((a, c) =>
        a * 16 + (if (c >= 'a') c - 'a' + 10 else c - '0'))
      val u = ((BigInt(dec(hex.take(12))) << 48) + dec(hex.slice(12, 24)))
        .mod(BigInt(Sketch.DpScale)).toLong
      bounds.collectFirst { case (b, z) if u < b => z }.getOrElse(0L)
    }
    val sf001 = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val wantN = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = graft.SparkEntry.queries("sk8_dp_counts")(spark, sf001).collect()
    assert(got.length == wantN.size, "every (lang, source) group reports once")
    got.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"))
      val z = noiseOf(key._1, key._2)
      assert(r.getAs[Long]("n") == wantN(key), s"true count drifted for $key")
      assert(r.getAs[Long]("noise") == z, s"noise drifted for $key")
      assert(math.abs(z) <= Sketch.DpMaxNoise, "noise escaped the truncation bound")
      assert(r.getAs[Long]("n_dp") == math.max(0L, wantN(key) + z),
        s"clamped release drifted for $key")
    }
    // the mechanism must actually perturb: some noise nonzero, and
    // both signs appear across the fixture's groups
    val zs = got.map(_.getAs[Long]("noise"))
    assert(zs.exists(_ > 0) && zs.exists(_ < 0),
      "noise degenerate - both signs must appear across groups")
  }

  test("sk9: the sharded summary provably contains every true heavy hitter") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("sk9_heavy_hitters")(spark, sf).collect()
    assert(rows.nonEmpty)
    // scalar ground truth: exact token counts from the raw corpus
    val counts = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .flatMap(_.getString(0).trim.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val n = counts.values.sum
    val trueHeavy = counts.filter { case (_, c) => c * 32 > n }.keySet
    val cand = rows.map(r => r.getAs[String]("w")).toSet
    // the Misra-Gries superset guarantee, end-to-end
    assert(trueHeavy.nonEmpty, "fixture must contain at least one heavy hitter")
    assert(trueHeavy.subsetOf(cand),
      s"missing heavy hitters: ${(trueHeavy -- cand).take(5)}")
    // flags are exactly the guarantee's threshold, and counts are exact
    rows.foreach { r =>
      val (w, c) = (r.getAs[String]("w"), r.getAs[Long]("cnt"))
      assert(counts(w) == c, s"count for '$w' not exact: $c vs ${counts(w)}")
      assert((r.getAs[Int]("is_heavy") == 1) == (c * 32 > n))
    }
    // summary stays communication-bounded: <= shards x k rows
    assert(rows.length <= 16 * 32)
    rows.groupBy(_.getAs[Int]("shard")).values
      .foreach(g => assert(g.length <= 32))
  }

  test("sk9: the superset guarantee holds under adversarial skew — a 90%-hot shard plus a flooding tail") {
    // The fixture corpus is benign (heavies comfortably clear their
    // shard ranks); this plant is the case Misra-Gries exists for:
    // one token carries 80% of the stream, two borderline heavies sit
    // just past the φ = 1/32 threshold, and 20k DISTINCT singleton
    // tokens flood every shard's ranking (~1250 candidates per
    // shard). The guarantee must still put every true heavy inside
    // its shard's top-32, with exact counts and exact flags — while
    // the summary ships 512 rows, not the 20k-token key set.
    import org.apache.spark.sql.functions._
    val nDocs = 20000L
    val docs = spark.range(0, nDocs).select(concat(
      lit("hot hot hot hot hot hot hot hot tail"), col("id"),
      lit(" warm"), col("id") % 2).as("text"))
    val rows = Sketch.sk9From(docs).collect()
    val n = 10L * nDocs // 8 hot + 1 unique tail + 1 warm per doc
    val expected = Map("hot" -> 8L * nDocs,
      "warm0" -> nDocs / 2, "warm1" -> nDocs / 2)
    val trueHeavy = expected.filter(_._2 * 32 > n).keySet
    assert(trueHeavy == Set("hot", "warm0", "warm1"),
      "plant must make exactly these three heavy")
    val byToken = rows.map(r => r.getAs[String]("w") ->
      (r.getAs[Long]("cnt"), r.getAs[Int]("is_heavy"))).toMap
    trueHeavy.foreach { w =>
      assert(byToken.contains(w), s"heavy '$w' missing from the summary")
      assert(byToken(w)._1 == expected(w), s"count for '$w' not exact")
      assert(byToken(w)._2 == 1, s"'$w' must be flagged heavy")
    }
    // every other surfaced candidate is a singleton tail token,
    // correctly counted and correctly NOT flagged
    (byToken -- trueHeavy).foreach { case (w, (c, h)) =>
      assert(w.startsWith("tail") && c == 1L && h == 0,
        s"unexpected candidate row: $w cnt=$c heavy=$h")
    }
    // communication bound under the flood: 512 rows vs 20k+3 keys
    assert(rows.length <= 16 * 32)
    rows.groupBy(_.getAs[Int]("shard")).values
      .foreach(g => assert(g.length <= 32))
  }
}
