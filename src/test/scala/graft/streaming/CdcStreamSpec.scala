package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** MemoryStream-driven specs for every public member of [[CdcStream]]
  * — each query runs real micro-batches through the state store
  * (SURVEY §5.4), not batch stand-ins.
  */
class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private var qn = 0
  private def nextName(): String = { qn += 1; s"cdcstream_q$qn" }

  /** ProcessingTimeTimeout keeps the query running no-data batches to
    * fire timers, so `noNewData` never latches and
    * `processAllAvailable` blocks forever — poll the sink instead.
    */
  private def awaitUntil(what: String, timeoutMs: Long = 60000)(pred: => Boolean): Unit = {
    val t0 = System.currentTimeMillis()
    while (!pred && System.currentTimeMillis() - t0 < timeoutMs) Thread.sleep(100)
    assert(pred, s"timed out waiting for: $what")
  }

  /** Poll until the sink is quiescent long enough to trust a negative
    * assertion (the wrong behavior would surface within a batch or
    * two of the continuously-running timer batches).
    */
  private def settle(): Unit = Thread.sleep(1500)

  test("latestState: emits on change, tombstones deletes, never resurrects") {
    val input = MemoryStream[FeedRow](Encoders.product[FeedRow], spark)
    val name = nextName()
    val query = CdcStream
      .latestState(input.toDS())
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("update")
      .start()
    try {
      input.addData(FeedRow(1, ts(1), 1, "insert", 1.0), FeedRow(2, ts(2), 2, "insert", 2.0))
      query.processAllAvailable()
      input.addData(FeedRow(5, ts(5), 1, "delete", 0.0))
      query.processAllAvailable()
      // stale event older than the delete: must emit nothing and must
      // NOT resurrect pk=1 (ADVICE: the delete's pos is retained as a
      // tombstone, not dropped with state.remove())
      input.addData(FeedRow(3, ts(3), 1, "update", 9.0))
      query.processAllAvailable()
      // genuinely newer event revives the key
      input.addData(FeedRow(6, ts(6), 1, "insert", 7.0))
      query.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .toSet
      assert(rows == Set(
        (1L, 1L, "insert", 1.0),
        (2L, 2L, "insert", 2.0),
        (1L, 5L, "delete", 0.0),
        (1L, 6L, "insert", 7.0)
      )) // no (1,3,update,9.0): stale event suppressed
    } finally query.stop()
  }

  test("txGrouping: flush on commit, drop late rows of a flushed tx") {
    val input = MemoryStream[TxEvent](Encoders.product[TxEvent], spark)
    val name = nextName()
    val query = CdcStream
      .txGrouping(input.toDS())
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
    try {
      input.addData(TxEvent(1, 2, "row", "b"), TxEvent(1, 1, "row", "a"))
      settle()
      input.addData(TxEvent(1, 3, "row", "c"), TxEvent(1, 0, "commit", ""))
      awaitUntil("commit flush")(spark.table(name).count() == 1)
      // late row in a batch AFTER the commit flushed: must not re-open
      // the transaction (ADVICE: committed marker retained)
      input.addData(TxEvent(1, 4, "row", "late"))
      // open transaction without commit: buffered, nothing emitted
      input.addData(TxEvent(2, 1, "row", "x"))
      settle()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[String](2)))
      assert(rows.toSeq == Seq((1L, 3, Seq("a", "b", "c"))))
    } finally query.stop()
  }

  test("txGrouping: processing-time timeout flushes stragglers once") {
    val input = MemoryStream[TxEvent](Encoders.product[TxEvent], spark)
    val name = nextName()
    val query = CdcStream
      .txGrouping(input.toDS(), timeout = "100 milliseconds")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
    try {
      input.addData(TxEvent(3, 1, "row", "p"), TxEvent(3, 2, "row", "q"))
      // the continuously-running timer batches fire the expired timeout
      awaitUntil("straggler flush") {
        spark.table(name).collect().exists(_.getLong(0) == 3L)
      }
      settle() // no further emissions for tx=3 (single flush)
      val flushed = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[String](2)))
        .filter(_._1 == 3L)
      assert(flushed.toSeq == Seq((3L, 2, Seq("p", "q"))))
    } finally query.stop()
  }

  test("windowedCounts: append emits a window once the watermark passes it") {
    val input = MemoryStream[FeedRow](Encoders.product[FeedRow], spark)
    val name = nextName()
    val query = CdcStream
      .windowedCounts(input.toDF(), watermark = "5 seconds", windowLen = "10 seconds")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
    try {
      input.addData(FeedRow(1, ts(0), 1, "insert", 1.0), FeedRow(2, ts(5), 2, "insert", 2.0))
      query.processAllAvailable()
      input.addData(FeedRow(3, ts(35), 3, "insert", 3.0)) // advances event time
      query.processAllAvailable()
      input.addData(FeedRow(4, ts(36), 4, "insert", 4.0)) // watermark now 30 > 10
      query.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1), r.getLong(2), r.getLong(3)))
      assert(rows.contains((0L, "insert", 2L, 2L)))
    } finally query.stop()
  }

  test("sessionCounts: gap-merged sessions finalize under the watermark") {
    val input = MemoryStream[FeedRow](Encoders.product[FeedRow], spark)
    val name = nextName()
    val query = CdcStream
      .sessionCounts(input.toDF(), watermark = "0 seconds", gap = "5 seconds")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
    try {
      input.addData(FeedRow(1, ts(0), 1, "insert", 1.0), FeedRow(2, ts(3), 1, "update", 2.0))
      query.processAllAvailable()
      input.addData(FeedRow(3, ts(100), 2, "insert", 3.0))
      query.processAllAvailable()
      input.addData(FeedRow(4, ts(101), 2, "update", 4.0))
      query.processAllAvailable()
      val rows = spark.table(name).collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getTimestamp(1).getTime / 1000,
          r.getLong(2), r.getLong(3)))
      // pk=1: events at 0 and 3 merge into one session [0, 3+5)
      assert(rows.contains((0L, 8L, 1L, 2L)))
    } finally query.stop()
  }
}
