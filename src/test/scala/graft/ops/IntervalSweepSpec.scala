package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q57 interval-concurrency sweep: the date-rollup decomposition
  * checked against a brute-force scalar count (for every reported day,
  * count the spans covering it), plus the sweep invariants — deltas
  * conserve to zero and the profile ends closed.
  */
class IntervalSweepSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q57: in-flight counts equal the brute-force span cover count on every day") {
    val rows = graft.SparkEntry.queries("q57_concurrency")(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate,
        r.getAs[Long]("n_open"), r.getAs[Long]("n_close"), r.getAs[Long]("in_flight")))
    assert(rows.nonEmpty)
    // independent reference: materialize every order's [open, close]
    // span scalar-side and count covers directly
    val close = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(max(to_date(col("l_shipdate"))).as("cd"))
    val spans = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
      .join(close, col("o_orderkey") === col("l_orderkey"))
      .select("od", "cd").collect()
      .map { r =>
        val od = r.getAs[java.sql.Date]("od").toLocalDate
        val cd = r.getAs[java.sql.Date]("cd").toLocalDate
        // the operator's dirty-data normalization: inverted spans
        // (every lineitem shipped before the order date) become
        // [least, greatest] — replicated here independently
        if (od.isAfter(cd)) (cd, od) else (od, cd)
      }
    for ((day, nOpen, nClose, inFlight) <- rows) {
      val want = spans.count { case (o, c) => !day.isBefore(o) && !day.isAfter(c) }
      assert(inFlight == want.toLong, s"in_flight drifted on $day: $inFlight vs $want")
      assert(nOpen == spans.count(_._1 == day).toLong, s"n_open drifted on $day")
      assert(nClose == spans.count(_._2.plusDays(1) == day).toLong, s"n_close drifted on $day")
    }
    // sweep conservation: every opened order eventually closes, so the
    // profile's last day (the day after the final close) reads zero
    assert(rows.map(r => r._2 - r._3).sum == 0L, "boundary deltas must conserve")
    assert(rows.last._4 == 0L, "the sweep must end with nothing in flight")
    assert(rows.map(_._4).max > 1L, "fixture must exhibit genuine concurrency")
    // the output is day-ordered and days are unique (a profile, not events)
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.sliding(2).forall(p => p.length < 2 || p(0)._1.isBefore(p(1)._1)))
  }
}
