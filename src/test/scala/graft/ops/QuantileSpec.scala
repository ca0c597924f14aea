package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantileSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q53: histogram narrowing reproduces the full-sort order statistics exactly") {
    val rows = graft.SparkEntry.queries("q53_exact_quantile")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("pct")).toSeq == Seq(50, 90, 99))
    // independent truth: sort the whole column driver-side (fine at
    // this sf; the operator exists precisely so 100 TB never does this)
    val vs = graft.Tables.lineitem(spark, sf)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = vs.length.toLong
    rows.foreach { r =>
      val p = r.getAs[Int]("pct")
      val k = (p.toLong * n + 99) / 100
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("k") == k, s"p$p: rank must be ceil(p·n/100)")
      assert(r.getAs[Double]("value") == vs((k - 1).toInt),
        s"p$p: narrowed answer != k-th smallest of the sorted column")
    }
  }
}
