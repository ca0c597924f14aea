package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{AnalysisException, Column, DataFrame, Dataset, SparkSession}

import graft.model.GtidSet

/** Read-a-table-that-may-not-exist-yet, shared by the watermark store
  * and the pipeline's state table. `None` covers exactly the two
  * recoverable "no data yet" shapes: the path is absent
  * (PATH_NOT_FOUND — first ever run) or present but file-less
  * (UNABLE_TO_INFER_SCHEMA — an overwrite was torn mid-write, leaving
  * only temporaries; both consumers are idempotent-replay safe, so
  * treating a torn table as empty self-heals on the next write
  * instead of crash-looping). Every other failure propagates.
  */
private[cdc] object MetaTables {
  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] =
    try Some(spark.read.parquet(path))
    catch {
      case e: AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" ||
            e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
        None
    }
}

/** One per-table watermark row — the Spark analog of
  * `go_cdc_table_meta(data_source_id, sc, tb, last_pos)`
  * (`internal/model/tablemeta.go:25-35`). `pos` is a serialized
  * [[GtidSet]] (the JSON `last_pos` of the reference, normalized to
  * the canonical MySQL text form).
  */
final case class TableWatermark(source: String, schema: String, table: String, pos: String)

/** Compile the consistency-protocol gate into the plan.
  *
  * The docs' rule — apply an incremental event only when its GTID is
  * NOT already covered by the table's snapshot watermark
  * (`docs/全量抓取逻辑.md:44-52`) — is semantically a stream–static
  * semi join against a tiny watermark set. Since a watermark is a
  * handful of intervals, the cheapest plan is no join at all: unroll
  * the intervals into a codegen'd range predicate. O(#intervals) per
  * row, broadcast-free, AND-pushable into the scan.
  */
object WatermarkGate {

  /** True iff (uuid, pos) is covered by `wm` — the in-plan form of
    * [[GtidSet.contains]].
    */
  def containsColumn(wm: GtidSet, uuid: String, pos: Column): Column =
    wm.intervals
      .getOrElse(uuid, Vector.empty)
      .map(r => pos.between(lit(r.start), lit(r.end)))
      .foldLeft(lit(false))(_ || _)
}

/** Op #20: the watermark metadata sink — select-then-upsert of
  * per-table stream positions (`internal/model/tablemeta.go:56-112`,
  * called from `fullamount_service.go:143` and
  * `data_source.go:96-102`).
  *
  * Backed by a small parquet table keyed (source, schema, table).
  * Upsert MERGES GTID sets (interval union) rather than overwriting —
  * positions only ever grow, so a replayed upsert is idempotent.
  *
  * The control-plane collect here is deliberate and scale-safe: this
  * table has one row per (source, schema, table) — thousands at most
  * (the reference keeps it in a metadata MySQL). Data-plane state
  * never flows through it.
  */
final class WatermarkStore(path: String) {

  def read(spark: SparkSession): Dataset[TableWatermark] = {
    import spark.implicits._
    MetaTables.readIfExists(spark, path) match {
      case Some(df) => df.as[TableWatermark]
      case None => spark.emptyDataset[TableWatermark]
    }
  }

  /** Current watermark for one table (empty set when absent). */
  def watermark(spark: SparkSession, source: String, schema: String, table: String): GtidSet = {
    import spark.implicits._
    read(spark)
      .filter($"source" === source && $"schema" === schema && $"table" === table)
      .collect()
      .headOption
      .map(w => GtidSet.parse(w.pos))
      .getOrElse(GtidSet.empty)
  }

  /** True iff `candidate` brings nothing new for the table — every
    * GTID already covered ([[GtidSet.subsetOf]]): the replay/resume
    * dedup check of the protocol.
    */
  def covered(spark: SparkSession, source: String, schema: String, table: String,
      candidate: GtidSet): Boolean =
    candidate.subsetOf(watermark(spark, source, schema, table))

  /** Select-then-upsert (`tablemeta.go:64-82`): merge the new position
    * into the existing row's GTID set, insert when absent. Written
    * with overwrite-after-read — safe because the table is tiny,
    * single-writer control-plane state (same assumption the reference
    * makes of its metadata DB).
    */
  def upsert(spark: SparkSession, rows: Seq[TableWatermark]): Unit = {
    import spark.implicits._
    val existing = read(spark).collect()
    val merged = (existing ++ rows)
      .groupBy(w => (w.source, w.schema, w.table))
      .map { case ((src, sc, tb), ws) =>
        val set = ws.foldLeft(GtidSet.empty)((acc, w) => acc.merge(GtidSet.parse(w.pos)))
        TableWatermark(src, sc, tb, set.serialize)
      }
      .toSeq
      .sortBy(w => (w.source, w.schema, w.table))
    merged.toDS().coalesce(1).write.mode("overwrite").parquet(path)
  }
}
