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

  test("sk3: count-min never underestimates (one-sided error)") {
    val rows = graft.SparkEntry
      .queries("sk3_count_min")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("over_ok") == 1),
      "CMS estimates must dominate true counts")
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
