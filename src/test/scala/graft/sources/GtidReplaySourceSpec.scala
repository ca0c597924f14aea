package graft.sources

import java.io.File
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FeedRow

/** The DSv2 source end-to-end: GTID-set offsets in the checkpoint,
  * incremental delivery as the buffer grows, and restart-resume from
  * the checkpointed set (SURVEY op #15's contract:
  * `StartSyncGTID(lastSet)`).
  */
class GtidReplaySourceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def row(pos: Long, pk: Long, op: String, v: Double) =
    FeedRow(pos, new Timestamp(pos * 1000L), pk, op, v)

  private def readAll(name: String): Set[(Long, Long, String, Double)] =
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toSet

  test("streams the buffer, advances GTID offsets, delivers appends incrementally") {
    val id = GtidReplayBuffers.register(Seq(
      row(1, 10, "insert", 1.0), row(2, 11, "insert", 2.0)))
    val ckpt = s"target/tmp/gtidsrc-${System.nanoTime()}"
    // foreachBatch sink: supports checkpoint recovery (memory doesn't)
    val delivered = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Double)]
    def start() = spark.readStream
      .format(classOf[GtidReplayProvider].getName)
      .option("bufferId", id)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
          .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getDouble(4)))
        delivered.synchronized { delivered ++= rows }
        ()
      }
      .start()

    val query = start()
    try {
      query.processAllAvailable()
      assert(delivered.synchronized(delivered.toSet) ==
        Set((1L, 10L, "insert", 1.0), (2L, 11L, "insert", 2.0)))

      GtidReplayBuffers.append(id, Seq(row(3, 10, "update", 3.0)))
      query.processAllAvailable()
      assert(delivered.synchronized(delivered.size) == 3)

      // the checkpointed offset is a canonical GTID set — the same
      // string the reference persists and resumes from
      val offsetFiles = new File(s"$ckpt/offsets").listFiles().sortBy(_.getName)
      val last = scala.io.Source.fromFile(offsetFiles.last).getLines().toSeq.last
      assert(last.contains("harness-src:1-3"), s"offset line: $last")
    } finally query.stop()

    // restart from the same checkpoint after the binlog grew while the
    // query was down: only the delta is delivered
    GtidReplayBuffers.append(id, Seq(row(4, 12, "insert", 4.0)))
    delivered.synchronized(delivered.clear())
    val query2 = start()
    try {
      query2.processAllAvailable()
      assert(delivered.synchronized(delivered.toSet) == Set((4L, 12L, "insert", 4.0)),
        "resume must deliver exactly the events above the checkpointed GTID set")
    } finally query2.stop()
  }

  test("maxRowsPerBatch admission control bounds each micro-batch") {
    val id = GtidReplayBuffers.register((1L to 10L).map(p => row(p, p, "insert", p.toDouble)))
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val query = spark.readStream
      .format(classOf[GtidReplayProvider].getName)
      .option("bufferId", id)
      .option("maxRowsPerBatch", "3")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count()
        sizes.synchronized { if (n > 0) sizes += n }
        ()
      }
      .start()
    try {
      query.processAllAvailable()
      val got = sizes.synchronized(sizes.toSeq)
      assert(got.sum == 10, s"all rows delivered: $got")
      assert(got.forall(_ <= 3), s"every batch bounded by the cap: $got")
      assert(got.length >= 4, s"the cap forces multiple batches: $got")
    } finally query.stop()
  }

  test("multi-source: two uuids share one checkpointed GtidSet and resume per-uuid") {
    val idA = GtidReplayBuffers.register(Seq(
      row(1, 1, "insert", 1.0), row(2, 2, "insert", 2.0)))
    val idB = GtidReplayBuffers.register(Seq(row(1, 50, "insert", 9.0)))
    val ckpt = s"target/tmp/gtidmulti-${System.nanoTime()}"
    val delivered = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    def start() = spark.readStream
      .format(classOf[GtidReplayProvider].getName)
      .option("sources", s"srcA=$idA,srcB=$idB")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect()
          .map(r => (r.getLong(0), r.getLong(2), r.getString(5)))
        delivered.synchronized { delivered ++= rows }
        ()
      }
      .start()

    val query = start()
    try {
      query.processAllAvailable()
      assert(delivered.synchronized(delivered.toSet) ==
        Set((1L, 1L, "srcA"), (2L, 2L, "srcA"), (1L, 50L, "srcB")),
        "both servers' events delivered, tagged with their uuid")
      // ONE offset carries BOTH servers' positions — the canonical
      // multi-uuid GTID set
      val offsetFiles = new File(s"$ckpt/offsets").listFiles().sortBy(_.getName)
      val last = scala.io.Source.fromFile(offsetFiles.last).getLines().toSeq.last
      assert(last.contains("srcA:1-2") && last.contains("srcB:1"),
        s"offset line must union both uuids: $last")
    } finally query.stop()

    // both binlogs grow while the query is down; resume delivers
    // exactly each server's delta
    GtidReplayBuffers.append(idA, Seq(row(3, 3, "insert", 3.0)))
    GtidReplayBuffers.append(idB, Seq(row(2, 51, "update", 8.0)))
    delivered.synchronized(delivered.clear())
    val query2 = start()
    try {
      query2.processAllAvailable()
      assert(delivered.synchronized(delivered.toSet) ==
        Set((3L, 3L, "srcA"), (2L, 51L, "srcB")),
        "resume must deliver only events above each uuid's checkpointed range")
    } finally query2.stop()
  }

  test("feeds CdcStream.latestState like any other stream") {
    import org.apache.spark.sql.Encoders
    val id = GtidReplayBuffers.register(Seq(
      row(1, 1, "insert", 1.0), row(2, 1, "update", 5.0), row(3, 2, "insert", 2.0)))
    val ds = spark.readStream
      .format(classOf[GtidReplayProvider].getName)
      .option("bufferId", id)
      .load()
      .as[FeedRow](Encoders.product[FeedRow])
    val query = graft.streaming.CdcStream.latestState(ds)
      .writeStream.format("memory").queryName("gtid_replay_ls")
      .outputMode("update").start()
    try {
      query.processAllAvailable()
      val finalState = spark.table("gtid_replay_ls").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      assert(finalState(1L) == (1L, 2L, "update", 5.0))
      assert(finalState(2L) == (2L, 3L, "insert", 2.0))
    } finally query.stop()
  }
}
