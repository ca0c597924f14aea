package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The telescoping-delta property under adversarial op sequences:
  * whatever order of inserts/updates/deletes per key — including
  * update-before-insert and delete-then-reinsert — and however the
  * feed is sliced into batches, the maintained rollup equals the
  * direct aggregate over latest-wins state.
  */
class AggMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  // (pos, pk, op, value) — crafted sequences:
  //   pk 1: insert → update         (retraction of the inserted value)
  //   pk 2: insert → delete         (leaves the aggregate)
  //   pk 3: insert → delete → insert (re-add after tombstone)
  //   pk 4: update with NO prior     (first event not an insert)
  //   pk 5: delete with NO prior     (no-op either way)
  //   pk 11: lone insert in a different cohort
  private val feed = Seq(
    (1L, 1L, "insert", 10.0), (5L, 1L, "update", 13.0),
    (2L, 2L, "insert", 7.0), (6L, 2L, "delete", 0.0),
    (3L, 3L, "insert", 5.0), (7L, 3L, "delete", 0.0), (9L, 3L, "insert", 6.0),
    (4L, 4L, "update", 8.0),
    (8L, 5L, "delete", 0.0),
    (10L, 11L, "insert", 2.5)
  ).toDF("pos", "pk", "op", "value")

  private def expected(): Map[Int, (Long, Double)] = {
    // direct aggregate over latest-wins, deletes excluded
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pk")).orderBy(col("pos").desc)
    feed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .groupBy(pmod(col("pk"), lit(10)).as("cohort"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .collect()
      .map(r => r.getAs[Long]("cohort").toInt -> (r.getAs[Long]("n"), r.getAs[Double]("s")))
      .toMap
  }

  private def maintained(splits: Seq[Long]): Map[Int, (Long, Double)] = {
    val dir = s"target/tmp/aggmaint-${System.nanoTime()}/rollup"
    val imaged = AggMaintenance.withImages(feed)
    val bounds = (Seq(Long.MinValue) ++ splits).zip(splits ++ Seq(Long.MaxValue))
    bounds.foreach { case (lo, hi) =>
      val b = imaged.filter(col("pos") > lo && col("pos") <= hi)
      if (!b.isEmpty) AggMaintenance.applyDelta(spark, dir, b)
    }
    AggMaintenance.read(spark, dir).collect()
      .map(r => r.getAs[Long]("cohort").toInt ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("sum_value")))
      .toMap
  }

  test("one batch, two batches, and per-event batches all converge to the direct aggregate") {
    val want = expected()
    assert(maintained(Seq.empty) == want)
    assert(maintained(Seq(5L)) == want)
    assert(maintained((1L to 9L)) == want) // one event per batch
  }

  test("group-moving deltas retarget retractions when an update changes the group") {
    // group = current op: pk 1 moves insert -> update; pk 2 leaves via
    // delete; pk 3 returns as insert after a delete
    val dir = s"target/tmp/aggmove-${System.nanoTime()}/rollup"
    val imaged = AggMaintenance.withImages(feed)
    val groupOf = (p: String) => col(s"${p}op")
    // one event per batch — worst-case slicing
    (1L to 10L).foreach { pos =>
      val b = imaged.filter(col("pos") === pos)
      if (!b.isEmpty) AggMaintenance.applyMovingDelta(spark, dir, b, groupOf, "op_grp")
    }
    val got = AggMaintenance.read(spark, dir, "op_grp").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"), r.getAs[Double]("sum_value")))
      .toMap
    // final state: pk1=update 13.0, pk3=insert 6.0, pk4=update 8.0, pk11=insert 2.5
    assert(got == Map("insert" -> (2L, 8.5), "update" -> (2L, 21.0)))
  }

  test("cohorts whose rows all die are absent, not zero") {
    val dir = s"target/tmp/aggmaint-${System.nanoTime()}/rollup"
    val death = Seq((1L, 2L, "insert", 7.0), (2L, 2L, "delete", 0.0))
      .toDF("pos", "pk", "op", "value")
    AggMaintenance.applyDelta(spark, dir, AggMaintenance.withImages(death))
    assert(AggMaintenance.read(spark, dir).collect().isEmpty)
  }
}
