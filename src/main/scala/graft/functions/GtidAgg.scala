package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.GtidSet

/** Typed aggregator: a stream of (uuid, gno) transaction ids -> the
  * merged interval list, i.e. the distributed version of the
  * reference's mutex-guarded running GTID union
  * (`internal/model/gtid.go:58-72`, call site
  * `internal/cannal/incremental.go:195-208`).
  *
  * Order-insensitive and idempotent (interval union), so it is safe as
  * a shuffle-partial aggregate: Spark runs `reduce` map-side and
  * `merge` on the exchange, exactly like a partial+final agg. Buffer
  * state is O(#gaps), not O(#gnos) — at 100 TB the buffer stays tiny
  * as long as streams are mostly contiguous per server uuid.
  */
object GtidRangesAgg extends Aggregator[(String, Long), GtidSet, Seq[(String, Long, Long)]] {
  override def zero: GtidSet = GtidSet.empty
  override def reduce(b: GtidSet, a: (String, Long)): GtidSet = b.add(a._1, a._2)
  override def merge(b1: GtidSet, b2: GtidSet): GtidSet = b1.merge(b2)
  /** The uuid dimension survives into the output — ranges from
    * different server uuids can overlap numerically, so flattening
    * them would be ambiguous for multi-uuid streams. Shape matches
    * [[GtidStringAgg]]'s serialized `uuid:s-e` form, one row per range.
    */
  override def finish(b: GtidSet): Seq[(String, Long, Long)] =
    b.intervals.toSeq.sortBy(_._1).flatMap { case (u, rs) =>
      rs.map(r => (u, r.start, r.end))
    }
  override def bufferEncoder: Encoder[GtidSet] = Encoders.kryo[GtidSet]
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Same union, but finishing into the canonical MySQL text form —
  * the shape persisted as a per-table watermark (`go_cdc_table_meta
  * .last_pos`, `internal/model/tablemeta.go:30`).
  */
object GtidStringAgg extends Aggregator[(String, Long), GtidSet, String] {
  override def zero: GtidSet = GtidSet.empty
  override def reduce(b: GtidSet, a: (String, Long)): GtidSet = b.add(a._1, a._2)
  override def merge(b1: GtidSet, b2: GtidSet): GtidSet = b1.merge(b2)
  override def finish(b: GtidSet): String = b.serialize
  override def bufferEncoder: Encoder[GtidSet] = Encoders.kryo[GtidSet]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
