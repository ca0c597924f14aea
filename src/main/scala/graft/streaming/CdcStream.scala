package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** One CDC feed row, the streaming shape of
  * [[graft.cdc.ChangeFeed]]'s column contract.
  */
final case class FeedRow(
    pos: Long,
    ts: java.sql.Timestamp,
    pk: Long,
    op: String, // insert | update | delete
    value: Double
)

/** Current materialized state of one key. */
final case class KeyState(pk: Long, pos: Long, op: String, value: Double)

/** One event inside a transaction envelope (SURVEY op #21: the
  * reference's designed-but-disabled tx buffering,
  * `internal/cannal/handler.go:55-82`).
  */
final case class TxEvent(
    tx: Long,
    seq: Int,
    kind: String, // row | commit
    payload: String
)

/** A flushed transaction: all row payloads in sequence order. */
final case class TxBatch(tx: Long, n_rows: Int, payloads: Seq[String])

/** Structured Streaming jobs over the CDC feed — the streaming half
  * of the reference's capture pipeline, re-expressed on Spark's
  * unified API (the same DataFrame transforms run batch or stream):
  *
  *   - binlog tail (`incremental.go:180-232`) ⇒ `readStream` source
  *     feeding [[graft.cdc.ChangeFeed.fromEvents]]-shaped rows;
  *   - positions/offsets (`gtid.go`) ⇒ checkpointed offsets; in-plan
  *     GTID tracking via [[graft.functions.GtidRangesAgg]];
  *   - event filtering (`incremental_event.go:15-29`) ⇒
  *     `stream.filter(FilterRule.toColumn(...))`;
  *   - tx buffering (`handler.go:55-82`) ⇒ flatMapGroupsWithState
  *     keyed by transaction id, flush on commit marker, timeout for
  *     stragglers.
  *
  * Scale notes: all stateful ops key by pk/tx — state is partitioned
  * across executors by the state-store; watermarks bound state size;
  * nothing collects to the driver.
  */
object CdcStream {

  /** Streaming latest-wins materialization: one [[KeyState]] per key,
    * updated as events arrive, emitted on every change (Update mode).
    * Deletes clear the key (state removed, tombstone emitted with
    * op = delete). The streaming equivalent of
    * [[graft.cdc.ChangeFeed.latestState]].
    */
  def latestState(feed: Dataset[FeedRow]): Dataset[KeyState] = {
    implicit val ksEnc = Encoders.product[KeyState]
    implicit val lEnc = Encoders.scalaLong
    feed
      .groupByKey(_.pk)
      .mapGroupsWithState[KeyState, KeyState](GroupStateTimeout.NoTimeout) {
        (pk, events, state: GroupState[KeyState]) =>
          val latest = events.maxBy(_.pos)
          val cur = state.getOption
          // only advance, never regress: late/replayed events with an
          // older pos must not overwrite newer state (the GTID-
          // watermark rule, docs/全量抓取逻辑.md:44-52)
          if (cur.forall(_.pos <= latest.pos)) {
            val next = KeyState(pk, latest.pos, latest.op, latest.value)
            if (latest.op == "delete") state.remove() else state.update(next)
            next
          } else cur.get
      }
  }

  /** Watermarked tumbling-window counts per op — the streaming form
    * of the batch q31 tumbling query; events later than the
    * watermark drop.
    */
  def windowedCounts(feed: DataFrame, watermark: String, windowLen: String): DataFrame =
    feed
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("op"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("max_pos"))
      .select(col("window.start").as("w_start"), col("op"), col("n"), col("max_pos"))

  /** Session windows with a gap — the streaming form of the batch
    * q30 sessionization.
    */
  def sessionCounts(feed: DataFrame, watermark: String, gap: String): DataFrame =
    feed
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("pk"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("pk"), col("n_events")
      )

  /** Transaction grouping: buffer row events per transaction id,
    * flush the whole group when the commit marker arrives, or after
    * a processing-time timeout (stragglers flush partial with
    * n_rows < 0 marking abnormal completion is avoided — they flush
    * as-is; the caller distinguishes by absence of a commit row).
    */
  def txGrouping(
      events: Dataset[TxEvent],
      timeout: String = "10 minutes"
  ): Dataset[TxBatch] = {
    implicit val bufEnc = Encoders.kryo[Vector[TxEvent]]
    implicit val outEnc = Encoders.product[TxBatch]
    implicit val lEnc = Encoders.scalaLong
    events
      .groupByKey(_.tx)
      .flatMapGroupsWithState[Vector[TxEvent], TxBatch](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (tx, it, state: GroupState[Vector[TxEvent]]) =>
          if (state.hasTimedOut) {
            // straggler transaction: flush what we have, drop state
            val rows = state.getOption.getOrElse(Vector.empty)
            state.remove()
            if (rows.isEmpty) Iterator.empty
            else Iterator(TxBatch(tx, rows.length, rows.sortBy(_.seq).map(_.payload)))
          } else {
            val incoming = it.toVector
            val buffered = state.getOption.getOrElse(Vector.empty) ++
              incoming.filter(_.kind == "row")
            if (incoming.exists(_.kind == "commit")) {
              state.remove()
              Iterator(TxBatch(tx, buffered.length, buffered.sortBy(_.seq).map(_.payload)))
            } else {
              state.update(buffered)
              state.setTimeoutDuration(timeout)
              Iterator.empty
            }
          }
      }
  }

}
