package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.GtidRangesAgg
import graft.model.{GtidSet, GtidRange}

/** The wired incremental ("增量") pipeline — the running-stream form
  * of the reference's binlog event loop
  * (`internal/cannal/incremental.go:99-232` + the watermark protocol,
  * `docs/全量抓取逻辑.md:44-52`):
  *
  *   - `readStream` over the events parquet dir stands in for the
  *     binlog tail (offsets live in the checkpoint, replacing the
  *     mutex-guarded GTID state — restart resumes, no reprocessing);
  *   - each micro-batch computes its GTID set in-plan
  *     ([[GtidRangesAgg]]) and is applied ONLY when the watermark
  *     store does not already cover it ([[GtidSet.subsetOf]]) — the
  *     docs' "apply only above the watermark" rule, which makes a
  *     replayed batch (fresh checkpoint, duplicated feed) a no-op;
  *   - apply = latest-wins MERGE of the batch into a parquet state
  *     table (`foreachBatch`; at warehouse scale the same callback
  *     would be a Delta/Iceberg MERGE — the parquet
  *     read-union-rewrite here has identical semantics);
  *   - after a successful apply, the per-table watermark row is
  *     merge-upserted ([[WatermarkStore.upsert]]) — the reference's
  *     `SaveOrUpdateTableMeta` (`tablemeta.go:56-82`). Apply precedes
  *     the upsert, so the pipeline is at-least-once with idempotent
  *     re-apply — the same contract as the reference (channel send
  *     precedes the deferred meta save,
  *     `fullamount_service.go:143-184`).
  */
object CdcPipeline {

  /** events.parquet schema under `nanosAsLong` (ts arrives as raw
    * nanos — streaming reads need the schema up front).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** The streaming twin of [[graft.Tables.events]] +
    * [[ChangeFeed.fromEvents]].
    */
  def feedStream(spark: SparkSession, eventsDir: String): DataFrame =
    ChangeFeed.fromEvents(
      spark.readStream
        .schema(eventsSchema)
        .parquet(eventsDir)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    )

  /** The batch GTID set, computed in-plan (one partial+final agg, one
    * row to the driver — control-plane only).
    */
  def batchGtidSet(batch: DataFrame, uuid: String): GtidSet = {
    import batch.sparkSession.implicits._
    if (batch.isEmpty) GtidSet.empty
    else {
      val ranges = batch
        .select(lit(uuid).as("uuid"), col("pos"))
        .as[(String, Long)]
        .select(GtidRangesAgg.toColumn)
        .head()
      ranges.foldLeft(GtidSet.empty) { case (acc, (u, s, e)) =>
        acc.addRange(u, GtidRange(s, e))
      }
    }
  }

  /** Apply one micro-batch: GTID-gate, latest-wins merge into the
    * state table, watermark upsert. Public so the batch spec can
    * drive it directly.
    */
  def applyBatch(
      spark: SparkSession,
      store: WatermarkStore,
      stateDir: String,
      source: String,
      batch: DataFrame
  ): Unit = {
    val set = batchGtidSet(batch, source)
    if (set.isEmpty) return
    if (store.covered(spark, source, SnapshotJob.schemaName, "events", set)) return
    // break lineage from the files we are about to overwrite; None on
    // the first batch (no state table yet — see MetaTables)
    val existing = MetaTables.readIfExists(spark, stateDir).map(_.localCheckpoint(true))
    val merged = ChangeFeed.latestState(
      existing.fold(batch)(_.unionByName(batch)))
    merged.write.mode("overwrite").parquet(stateDir)
    store.upsert(spark, Seq(
      TableWatermark(source, SnapshotJob.schemaName, "events", set.serialize)))
  }

  /** Start the checkpointed stream. `Trigger.AvailableNow` drains
    * whatever the source has and stops — the harness form; a live
    * deployment would use a processing-time trigger.
    */
  def run(
      spark: SparkSession,
      eventsDir: String,
      stateDir: String,
      watermarkPath: String,
      checkpointDir: String,
      source: String = "harness-src"
  ): StreamingQuery = {
    val store = new WatermarkStore(watermarkPath)
    feedStream(spark, eventsDir).writeStream
      .queryName("cdc-apply")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, store, stateDir, source, batch)
      }
      .start()
  }
}
