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

  // (pos, ts, pk, op, value) — every window-crossing shape:
  //   pk 1: insert day1 → update day2   (the key MOVES windows: retract
  //                                      day1, add day2)
  //   pk 2: insert day1 → delete day2   (retraction targets day1 — the
  //                                      before-image's window, not the
  //                                      delete event's)
  //   pk 3: insert day1 → update day1   (same window, value change only)
  //   pk 4: insert day2 → delete day2 → insert day3 (re-add lands in a
  //                                      third window)
  //   pk 5: lone insert day1            (control)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val wfeed = Seq(
    (1L, ts("2024-01-01 05:00:00"), 1L, "insert", 10.0),
    (6L, ts("2024-01-02 07:00:00"), 1L, "update", 13.0),
    (2L, ts("2024-01-01 06:00:00"), 2L, "insert", 7.0),
    (7L, ts("2024-01-02 08:00:00"), 2L, "delete", 0.0),
    (3L, ts("2024-01-01 07:00:00"), 3L, "insert", 5.0),
    (5L, ts("2024-01-01 22:00:00"), 3L, "update", 6.0),
    (4L, ts("2024-01-02 01:00:00"), 4L, "insert", 8.0),
    (8L, ts("2024-01-02 23:00:00"), 4L, "delete", 0.0),
    (9L, ts("2024-01-03 03:00:00"), 4L, "insert", 9.0),
    (10L, ts("2024-01-01 12:00:00"), 5L, "insert", 1.0)
  ).toDF("pos", "ts", "pk", "op", "value")

  private def directWindows(): Map[java.sql.Timestamp, (Long, Double)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pk")).orderBy(col("pos").desc)
    wfeed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .groupBy(date_trunc("DAY", col("ts")).as("w_day"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
      .collect()
      .map(r => r.getTimestamp(0) -> (r.getAs[Long]("n"), r.getAs[Double]("s")))
      .toMap
  }

  private def maintainedWindows(splits: Seq[Long], dir: String)
      : Map[java.sql.Timestamp, (Long, Double)] = {
    val imaged = AggMaintenance.withImages(wfeed)
    val groupOf = (p: String) => date_trunc("DAY", col(s"${p}ts"))
    val bounds = (Seq(Long.MinValue) ++ splits).zip(splits ++ Seq(Long.MaxValue))
    bounds.foreach { case (lo, hi) =>
      val b = imaged.filter(col("pos") > lo && col("pos") <= hi)
      if (!b.isEmpty)
        AggMaintenance.applyMovingDeltaBucketed(spark, dir, b, groupOf, "w_day",
          nBuckets = 8)
    }
    AggMaintenance.read(spark, dir, "w_day").collect()
      .map(r => r.getTimestamp(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("sum_value")))
      .toMap
  }

  test("windowed bucketed rollup: window-crossing updates across any batch split") {
    val want = directWindows()
    // sanity on the adversarial construction itself
    assert(want == Map(
      ts("2024-01-01 00:00:00") -> (2L, 7.0),   // pk3 (6.0) + pk5 (1.0)
      ts("2024-01-02 00:00:00") -> (1L, 13.0),  // pk1 moved here
      ts("2024-01-03 00:00:00") -> (1L, 9.0)))  // pk4 re-added here
    // one batch, a mid split, and one-event batches must all converge
    assert(maintainedWindows(Seq.empty,
      s"target/tmp/aggwin-${System.nanoTime()}/r") == want)
    assert(maintainedWindows(Seq(5L),
      s"target/tmp/aggwin-${System.nanoTime()}/r") == want)
    assert(maintainedWindows((1L to 9L),
      s"target/tmp/aggwin-${System.nanoTime()}/r") == want)
  }

  test("bucketed rollup applies rewrite only the touched buckets") {
    val dir = s"target/tmp/aggwinprune-${System.nanoTime()}/r"
    maintainedWindows(Seq.empty, dir)
    def bucketMtimes(): Map[String, Long] = {
      val base = new java.io.File(dir)
      base.listFiles().filter(_.getName.startsWith("rbucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified()))
        .toMap
    }
    val before = bucketMtimes()
    assert(before.nonEmpty)
    // a new key in the day-3 window touches exactly day-3's bucket
    val extra = AggMaintenance.withImages(Seq(
      (11L, ts("2024-01-03 09:00:00"), 6L, "insert", 4.0))
      .toDF("pos", "ts", "pk", "op", "value"))
    AggMaintenance.applyMovingDeltaBucketed(spark, dir, extra,
      p => date_trunc("DAY", col(s"${p}ts")), "w_day", nBuckets = 8)
    val after = bucketMtimes()
    val day3Bucket = wfeed.sparkSession.range(1)
      .select(pmod(hash(date_trunc("DAY", lit(ts("2024-01-03 00:00:00")))), lit(8)))
      .head().getInt(0)
    val untouched = before.keys.filterNot(_.contains(s"rbucket=$day3Bucket/"))
    assert(untouched.nonEmpty)
    untouched.foreach { p =>
      assert(after.get(p).contains(before(p)), s"cold bucket file rewritten: $p")
    }
    // and the rollup is still exact
    assert(AggMaintenance.read(spark, dir, "w_day").collect()
      .map(r => r.getTimestamp(0) -> (r.getAs[Long]("n_rows"), r.getAs[Double]("sum_value")))
      .toMap == directWindows().updatedWith(ts("2024-01-03 00:00:00")) {
        case Some((n, s)) => Some((n + 1, s + 4.0)); case None => Some((1L, 4.0)) })
  }

  test("top-k view: group-pruned refresh — eviction below the buffer, carry-over untouched") {
    val dir = s"target/tmp/topkmaint-${System.nanoTime()}"
    // cohort 1: four live keys (1,11,21,31) so rank 4 exists BELOW the
    // maintained K=3 view; cohort 2: two live keys untouched later
    val b1 = Seq(
      (1L, 1L, "insert", 10.0), (2L, 11L, "insert", 9.0),
      (3L, 21L, "insert", 8.0), (4L, 31L, "insert", 7.0),
      (5L, 2L, "insert", 20.0), (6L, 12L, "insert", 19.0)
    ).toDF("pos", "pk", "op", "value")
    TopkMaintenance.applyBatch(spark, dir, b1)
    def view() = TopkMaintenance.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Int]("rnk"),
        r.getAs[Long]("user_id"), r.getAs[Double]("value")))
    assert(view().toSet == Set(
      (1L, 1, 1L, 10.0), (1L, 2, 11L, 9.0), (1L, 3, 21L, 8.0),
      (2L, 1, 2L, 20.0), (2L, 2, 12L, 19.0)))
    // batch 2 touches ONLY cohort 1: delete the rank-1 row — the
    // evicted slot must be refilled by pk 31, which the K=3 view
    // never buffered (the reason rank views can't delta-telescope)
    val before2 = view().filter(_._1 == 2L).toSet
    TopkMaintenance.applyBatch(spark, dir,
      Seq((7L, 1L, "delete", 0.0)).toDF("pos", "pk", "op", "value"))
    val after = view()
    assert(after.filter(_._1 == 1L).toSet == Set(
      (1L, 1, 11L, 9.0), (1L, 2, 21L, 8.0), (1L, 3, 31L, 7.0)),
      "the delete must pull rank 4 up from state, not leave a 2-row view")
    assert(after.filter(_._1 == 2L).toSet == before2,
      "untouched cohorts must carry over unchanged")
  }

  test("top-k state: cohort-partitioned COW — untouched cohorts' state files survive a batch") {
    val dir = s"target/tmp/topkcow-${System.nanoTime()}"
    // cohorts 1 and 2 both get state in batch 1
    TopkMaintenance.applyBatch(spark, dir, Seq(
      (1L, 1L, "insert", 10.0), (2L, 11L, "insert", 9.0),
      (3L, 2L, "insert", 20.0), (4L, 12L, "insert", 19.0)
    ).toDF("pos", "pk", "op", "value"))
    def stateFiles(): Map[String, Long] = {
      val base = new java.io.File(s"$dir/state")
      base.listFiles().filter(_.getName.startsWith("cohort="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> f.lastModified()))
        .toMap
    }
    val before = stateFiles()
    assert(before.keys.exists(_.contains("cohort=1/")), "cohort-partitioned layout expected")
    assert(before.keys.exists(_.contains("cohort=2/")))
    // batch 2 touches ONLY cohort 1
    TopkMaintenance.applyBatch(spark, dir,
      Seq((5L, 21L, "insert", 8.5)).toDF("pos", "pk", "op", "value"))
    val after = stateFiles()
    val untouched = before.keys.filter(_.contains("cohort=2/"))
    assert(untouched.nonEmpty)
    untouched.foreach { p =>
      assert(after.get(p).contains(before(p)), s"cold cohort state file rewritten: $p")
    }
    // cohort 1's directory WAS rewritten (no stale file survives)
    assert(before.keys.filter(_.contains("cohort=1/")).forall(p => !after.contains(p)),
      "touched cohort must be copy-on-write replaced")
    // and the maintained view reflects the merge
    val got = TopkMaintenance.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Int]("rnk"),
        r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSet
    assert(got == Set(
      (1L, 1, 1L, 10.0), (1L, 2, 11L, 9.0), (1L, 3, 21L, 8.5),
      (2L, 1, 2L, 20.0), (2L, 2, 12L, 19.0)))
  }

  test("top-k state: a cohort emptied by deletes drops its partition directory") {
    val dir = s"target/tmp/topkempty-${System.nanoTime()}"
    TopkMaintenance.applyBatch(spark, dir, Seq(
      (1L, 1L, "insert", 10.0), (2L, 2L, "insert", 20.0)
    ).toDF("pos", "pk", "op", "value"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/state", "cohort=1")))
    TopkMaintenance.applyBatch(spark, dir,
      Seq((3L, 1L, "delete", 0.0)).toDF("pos", "pk", "op", "value"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/state", "cohort=1")),
      "a fully-deleted cohort's stale partition dir would resurrect rows")
    val got = TopkMaintenance.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("user_id")))
    assert(got.toSet == Set((2L, 2L)))
  }

  test("top-k view: any batch slicing converges to the direct rank over latest-wins state (seeded)") {
    // adversarial ops across three cohorts: updates that demote a
    // ranked row, deletes of ranked AND unranked rows, re-inserts
    val events = Seq(
      (1L, 1L, "insert", 10.0), (2L, 11L, "insert", 9.0), (3L, 21L, "insert", 8.0),
      (4L, 31L, "insert", 7.0), (5L, 1L, "update", 1.0), // demote the leader below rank 3
      (6L, 2L, "insert", 20.0), (7L, 12L, "insert", 19.0), (8L, 2L, "delete", 0.0),
      (9L, 2L, "insert", 5.0), // delete-then-reinsert at a lower value
      (10L, 3L, "insert", 3.0), (11L, 13L, "update", 4.0) // update with no prior
    )
    val feed = events.toDF("pos", "pk", "op", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pk")).orderBy(col("pos").desc)
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort")).orderBy(col("value").desc, col("pk"))
    val direct = feed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .withColumn("cohort", pmod(col("pk"), lit(10)))
      .withColumn("rnk", row_number().over(wTop)).filter(col("rnk") <= 3)
      .select(col("cohort"), col("rnk"), col("pk"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Int]("rnk"),
        r.getAs[Long]("pk"), r.getAs[Double]("value"))).toSet
    val rnd = new scala.util.Random(13)
    (1 to 5).foreach { trial =>
      val cuts = (1L until 11L).filter(_ => rnd.nextBoolean()).sorted
      val bounds = (Seq(0L) ++ cuts).zip(cuts ++ Seq(Long.MaxValue))
      val dir = s"target/tmp/topkmaint-rand-${System.nanoTime()}"
      bounds.foreach { case (lo, hi) =>
        val b = feed.filter(col("pos") > lo && col("pos") <= hi)
        if (b.count() > 0) TopkMaintenance.applyBatch(spark, dir, b)
      }
      val got = TopkMaintenance.read(spark, dir).collect()
        .map(r => (r.getAs[Long]("cohort"), r.getAs[Int]("rnk"),
          r.getAs[Long]("user_id"), r.getAs[Double]("value"))).toSet
      assert(got == direct, s"trial $trial (cuts $cuts): maintained view diverged")
    }
  }
}
