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

  test("sk5: histogram quantiles track the exact percentile within a bin width") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("sk5_histogram")(spark, sf).collect()
    assert(rows.nonEmpty)
    val exact = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("grp"))
      .agg(
        expr("percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)").as("p50"),
        expr("percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.9)").as("p90"))
      .collect()
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    rows.foreach { r =>
      val (p50e, p90e) = exact(r.getAs[String]("grp"))
      val p50lo = r.getAs[Long]("p50_lo_cents")
      val p90lo = r.getAs[Long]("p90_lo_cents")
      // the sketch reports the bin holding the ceil(q·n)-th value; the
      // interpolated exact percentile sits within one 50000-cent bin
      assert(p50e >= p50lo - 50000 && p50e < p50lo + 50000,
        s"p50: exact $p50e outside bin of $p50lo")
      assert(p90e >= p90lo - 50000 && p90e < p90lo + 50000,
        s"p90: exact $p90e outside bin of $p90lo")
    }
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
}
