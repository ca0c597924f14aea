package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvAggSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("under-full sketch is the exact distinct count") {
    val ds = spark.createDataset(Seq(5L, 1L, 5L, 9L, 1L)).repartition(4)
    val (n, kth) = ds.select(KmvAgg.toColumn.name("kmv")).collect()(0)
    assert(n == 3 && kth == 0L)
  }

  test("full sketch keeps the k smallest distinct values") {
    // 1..1000 with every value duplicated: kth smallest distinct = 64
    val vals = (1L to 1000L) ++ (1L to 1000L)
    val ds = spark.createDataset(vals).repartition(8)
    val (n, kth) = ds.select(KmvAgg.toColumn.name("kmv")).collect()(0)
    assert(n == KmvAgg.K && kth == 64L)
  }

  test("partitioning-insensitive (partial-merge safe)") {
    val vals = scala.util.Random.shuffle((1L to 5000L).map(v => v * 7919L % 4096L))
    val a = spark.createDataset(vals).repartition(1)
      .select(KmvAgg.toColumn.name("k")).collect()(0)
    val b = spark.createDataset(vals).repartition(16)
      .select(KmvAgg.toColumn.name("k")).collect()(0)
    assert(a == b)
  }

  test("set sketch equals brute-force bottom-k under any partitioning") {
    // KmvSetAgg's whole contract: finish() IS the k smallest distinct
    // values, regardless of partial/merge order — checked against a
    // driver-side brute force over the same multiset
    val vals = scala.util.Random.shuffle(
      (1L to 3000L).map(v => v * 6053L % 2048L) ++ (1L to 500L))
    val expect = vals.distinct.sorted.take(KmvAgg.K)
    Seq(1, 7, 32).foreach { parts =>
      val got = spark.createDataset(vals).repartition(parts)
        .select(KmvSetAgg.toColumn.name("mins")).collect()(0).toSeq
      assert(got == expect, s"parts=$parts")
    }
  }

  test("estimate lands near exact on uniform 48-bit hashes") {
    // the sk1 pipeline shape: md5-hex 48-bit hash of 20k distinct keys
    val df = spark.range(20000).select(col("id").cast("string").as("s"))
    val h = (1 to 12).map { k =>
      s"(CAST(CASE WHEN ascii(substr(md5(s),$k,1)) >= 97 THEN ascii(substr(md5(s),$k,1)) - 87 " +
        s"ELSE ascii(substr(md5(s),$k,1)) - 48 END AS BIGINT)) * ${1L << (4 * (12 - k))}"
    }.mkString("(", " + ", ")")
    val kmv = udaf(KmvAgg)
    val (n, kth) = df.select(expr(h).as("h")).select(kmv(col("h")).as("kmv"))
      .select(col("kmv._1"), col("kmv._2")).as[(Int, Long)].collect()(0)
    val est = 63L * (1L << 48) / kth
    assert(n == KmvAgg.K)
    // KMV relative error ~ 1/sqrt(k-1) ≈ 12.6%; allow 3 sigma
    assert(math.abs(est - 20000L) < 20000L * 0.4, s"est=$est")
  }
}
