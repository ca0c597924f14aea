package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Regression spec for the case-collision bug that zeroed the s10/s13
  * drift metric: `withColumn("N1", ...)` over a frame carrying `n1`
  * REPLACES `n1` (case-insensitive resolver), making the TV sum
  * |n1·n2 − n2·n1| ≡ 0 for ANY input — and the DuckDB oracle's binder
  * resolved a same-select-list `N1` to `n1` the same way, so both
  * engines agreed on the wrong constant. These tests pin the metric to
  * hand-computed values on synthetic skew, which the buggy version
  * cannot produce.
  */
class SimilarityDriftSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def assigned(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "cid")
  }

  test("disjoint batch assignments give maximal drift (1000 pm, retrain)") {
    // batch 1 (ids 0-9) all in cell 0, batch 2 (ids 10-19) all in cell 1:
    // the metric is 500·Σ|p1−p2| = 1000·TV, so fully disjoint usage
    // maxes out at 1000 per-mille — far past the 100-pm retrain bar
    val rows = (0L until 10L).map(i => (i, 0L)) ++ (10L until 20L).map(i => (i, 1L))
    val r = Similarity.usageDriftPm(assigned(rows), split = 10L).head
    assert(r.getInt(0) == 1000)
    assert(r.getBoolean(1))
  }

  test("identical batch distributions give zero drift, no retrain") {
    // both batches split 50/50 over the two cells
    val rows = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L),
      (10L, 0L), (11L, 0L), (12L, 1L), (13L, 1L))
    val r = Similarity.usageDriftPm(assigned(rows), split = 10L).head
    assert(r.getInt(0) == 0)
    assert(!r.getBoolean(1))
  }

  test("partial skew lands between the extremes, exact integer") {
    // batch 1 puts (3,1) in cells (0,1); batch 2 puts (2,2).
    // tot1 = tot2 = 4; S = |3·4 − 2·4| + |1·4 − 2·4| = 8;
    // pm = (500·8) DIV 16 = 250 — exactly between the extremes, and
    // past the 100-pm retrain bar.
    val rows = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L),
      (10L, 0L), (11L, 0L), (12L, 1L), (13L, 1L))
    val r = Similarity.usageDriftPm(assigned(rows), split = 10L).head
    assert(r.getInt(0) == 250)
    assert(r.getBoolean(1))
  }
}
