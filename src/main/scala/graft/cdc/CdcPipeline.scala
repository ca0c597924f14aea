package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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

  /** The current fixture layout's schema (`ts` as `timestamp[us]` →
    * TIMESTAMP_NTZ — FIXTURES.md), used when the feed directory can't
    * be probed yet: a streaming source must be constructible BEFORE
    * its producer writes the first file, which is the reason streaming
    * reads take an up-front schema at all.
    */
  private val eventsSchemaNtz: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** The streaming twin of [[graft.Tables.events]] +
    * [[ChangeFeed.fromEvents]]. Streaming reads need the schema up
    * front, and the fixture's physical `ts` layout has drifted across
    * driver regenerations (nanos-long vs `timestamp[us]` — see
    * FIXTURES.md), so probe it with a one-time batch footer read
    * (control-plane cost: file listing + one footer) and normalize
    * through the same dtype branch the batch loader uses
    * ([[graft.Tables.normalizeEventsTs]]). An EMPTY feed directory
    * can't be probed (no footer to read) — fall back to the current
    * fixture-contract schema so the stream still starts ahead of its
    * producer, the invariant the old hardcoded schema provided. (The
    * directory itself must exist either way: Spark's streaming
    * DataSource checks the path at construction regardless of schema.)
    */
  def feedStream(spark: SparkSession, eventsDir: String): DataFrame = {
    val physicalSchema =
      try spark.read.parquet(eventsDir).schema
      catch {
        // ONLY the empty-dir condition falls back — any other analysis
        // failure (corrupt footer, mixed layouts, permissions surfaced
        // as AnalysisException) must fail HERE at the loader, not
        // mid-stream against a silently-assumed schema. If a producer
        // later drops legacy nanos-long files into an initially-empty
        // dir, the stream's declared NTZ schema will mismatch at read
        // time; that loud failure is the designed outcome
        // (normalizeEventsTs rejects unknown layouts the same way).
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
          eventsSchemaNtz
      }
    ChangeFeed.fromEvents(
      graft.Tables.normalizeEventsTs(
        spark.readStream
          .schema(physicalSchema)
          .parquet(eventsDir)))
  }

  /** The batch GTID set, computed in-plan (one partial+final agg, one
    * row to the driver — control-plane only).
    */
  def batchGtidSet(batch: DataFrame, uuid: String): GtidSet = {
    import batch.sparkSession.implicits._
    // No separate isEmpty probe: the aggregator's finish(zero) on an
    // empty batch is the empty range list, so one agg job answers both
    // questions — per-batch control-plane cost matters at a production
    // trigger rate.
    val ranges = batch
      .select(lit(uuid).as("uuid"), col("pos"))
      .as[(String, Long)]
      .select(GtidRangesAgg.toColumn)
      .head()
    ranges.foldLeft(GtidSet.empty) { case (acc, (u, s, e)) =>
      acc.addRange(u, GtidRange(s, e))
    }
  }

  /** Initial bucket count of the state table. 64 keeps the per-bucket
    * rewrite unit small enough that a typical batch touches a fraction
    * of the table, while staying far below the small-files regime. The
    * LIVE count is table state, not code ([[MetaTables.readBucketCount]]
    * sidecar): [[maybeSplit]] doubles it when buckets outgrow their
    * target size, so the knob tracks state volume instead of being
    * provisioned for it up front.
    */
  val stateBuckets: Int = 64

  // NOT underscore-prefixed: Spark's file index treats `_`-prefixed
  // paths as hidden and would skip the partition directories
  private[cdc] val bucketCol = "bucket"

  /** The state table's current bucket count (sidecar-backed). */
  def bucketCount(stateDir: String): Int =
    MetaTables.readBucketCount(stateDir, stateBuckets)

  /** Deterministic pk → bucket assignment (Murmur3, same function a
    * shuffle-hash-partitioning of the state would use).
    */
  private def bucketOf(n: Int): Column = pmod(hash(col("pk")), lit(n))

  /** Apply one micro-batch: GTID-gate, then a bucketed copy-on-write
    * MERGE into the state table, then the watermark upsert. Public so
    * the batch spec can drive it directly.
    *
    * The state parquet is hash-partitioned on `pmod(hash(pk), 64)`
    * (directory layout `bucket=N/`). A batch only ever
    * reads-and-rewrites the buckets its keys hash into — partition
    * pruning limits the read, dynamic partition-overwrite limits the
    * write — so apply cost is O(batch ∪ touched-bucket state), not
    * O(state): the Delta/Iceberg copy-on-write MERGE pattern without
    * the dependency. Untouched buckets' files are never opened: the
    * pruned read takes its schema from the sidecar (no footer
    * inference), and the dynamic overwrite replaces only the
    * partitions present in the written frame.
    *
    * Schema lives in a tiny sidecar file (the single-table analog of
    * Delta's transaction-log schema — parquet footers can't speak for
    * a table whose buckets were written at different times). A batch
    * arriving with an evolved schema — the downstream meaning of a
    * gated additive DDL event, which the reference drops in its no-op
    * `OnDDL` (`internal/cannal/incremental_event.go:31-33`) — triggers
    * a one-off full-table migration ([[SchemaEvolution.conform]]:
    * old rows null-fill new columns), amortized O(state) once per DDL;
    * every schema-stable batch takes the O(batch) COW path.
    */
  /** Run `body` only if the batch's GTID set is non-empty and not
    * already covered by the watermark; advance the watermark after.
    * The shared dedupe/resume protocol of every apply flavor.
    */
  private def gatedApply(
      spark: SparkSession,
      store: WatermarkStore,
      source: String,
      batch: DataFrame,
      table: String = "events"
  )(body: => Unit): Unit = {
    val set = batchGtidSet(batch, source)
    if (set.isEmpty) return
    if (store.covered(spark, source, SnapshotJob.schemaName, table, set)) return
    body
    store.upsert(spark, Seq(
      TableWatermark(source, SnapshotJob.schemaName, table, set.serialize)))
  }

  /** A bucket whose every key was just deleted is absent from the
    * written frame — a dynamic partition overwrite would leave its old
    * files behind, resurrecting dropped rows. Remove those partition
    * dirs explicitly (same local-FS seam as the sidecar).
    */
  private def removeEmptiedBuckets(
      stateDir: String, touched: Seq[Int], present: Set[Int]): Unit =
    touched.filterNot(present).foreach { b =>
      val dir = java.nio.file.Paths.get(stateDir, s"$bucketCol=$b")
      if (java.nio.file.Files.exists(dir)) {
        graft.Fs.walkSeq(dir)
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.delete)
      }
    }

  def applyBatch(
      spark: SparkSession,
      store: WatermarkStore,
      stateDir: String,
      source: String,
      batch: DataFrame,
      table: String = "events"
  ): Unit = gatedApply(spark, store, source, batch, table) {
    val bucketed = batch.withColumn(bucketCol, bucketOf(bucketCount(stateDir)))

    def write(df: DataFrame, dynamic: Boolean): Unit =
      writeBucketed(stateDir, df, dynamic)

    MetaTables.readStateSchema(spark, stateDir) match {
      case None =>
        // first batch: no state yet
        write(ChangeFeed.latestState(bucketed), dynamic = false)

      case Some(old) =>
        val target = mergedSchema(old, bucketed.schema)
        if (target != old) {
          // evolved batch → one-off migration: conform ALL buckets so
          // the table has a single schema again
          val st = spark.read.schema(old).parquet(stateDir).localCheckpoint(true)
          write(
            ChangeFeed.latestState(
              SchemaEvolution.conform(st, target)
                .unionByName(SchemaEvolution.conform(bucketed, target))),
            dynamic = false)
        } else {
          // steady state: O(batch) COW. Touched buckets = one small
          // distinct over the batch (≤ stateBuckets values — control
          // plane); localCheckpoint breaks lineage from the files the
          // dynamic overwrite replaces, materializing only the touched
          // fraction of state.
          val touched = bucketed.select(bucketCol).distinct().collect().map(_.getInt(0))
          val st = spark.read.schema(old).parquet(stateDir)
            .filter(col(bucketCol).isin(touched.map(Integer.valueOf): _*))
          // the eager checkpoint both breaks lineage from the files the
          // overwrite replaces AND materializes the merged buckets once
          // (reused by the write and the `present` collect below)
          val out = ChangeFeed.latestState(
            st.unionByName(SchemaEvolution.conform(bucketed, target)))
            .localCheckpoint(true)
          write(out, dynamic = true)
          val present =
            out.select(bucketCol).distinct().collect().map(_.getInt(0)).toSet
          removeEmptiedBuckets(stateDir, touched.toSeq, present)
        }
    }
  }

  /** Merge-on-read alternative to [[applyBatch]]: append the batch's
    * raw feed rows as DELTA FILES inside the bucket directories and
    * defer the latest-wins merge to read time — strict O(batch) write
    * cost with zero state reads, where the COW path pays
    * O(touched-bucket state) per batch. The Hudi/Iceberg MOR pattern
    * without the dependency: base files are earlier latest-wins
    * compactions, delta files are raw feed rows (including `delete`
    * tombstones), and both speak the same schema, so
    * [[readState]]'s single `latestState` pass over ALL files is the
    * whole merge — no base/delta bookkeeping. [[compact]] folds a
    * bucket back to one file when its file count (the read-amp)
    * exceeds a threshold; [[applyBatch]] on a delta-carrying bucket
    * also folds it, so the two apply flavors compose freely.
    *
    * An evolved batch schema falls back to the COW path's one-off
    * migration (delta files narrower than the sidecar schema are
    * fine — missing columns read as null — but a WIDER batch must
    * migrate the table).
    */
  def appendDeltas(
      spark: SparkSession,
      store: WatermarkStore,
      stateDir: String,
      source: String,
      batch: DataFrame,
      table: String = "events"
  ): Unit = MetaTables.readStateSchema(spark, stateDir) match {
    case None => applyBatch(spark, store, stateDir, source, batch, table)
    case Some(old) =>
      val bucketed = batch.withColumn(bucketCol, bucketOf(bucketCount(stateDir)))
      if (mergedSchema(old, bucketed.schema) != old)
        applyBatch(spark, store, stateDir, source, batch, table)
      else gatedApply(spark, store, source, batch, table) {
        SchemaEvolution.conform(bucketed, old)
          .repartition(bucketCount(stateDir), col(bucketCol))
          .write
          .mode("append")
          .partitionBy(bucketCol)
          .parquet(stateDir)
      }
  }

  /** Demultiplex one micro-batch carrying rows for N logical tables
    * (a `table` column) into per-table gated applies — the
    * reference's per-table protocol: it snapshots and tails many
    * tables through one pipeline
    * (`internal/cannal/fullamount_service.go:112-134`) and persists
    * one watermark row PER TABLE (`tablemeta.go:56-82`,
    * `go_cdc_table_meta`). Each table here gates on its own
    * [[TableWatermark]] row and lands under `stateRoot/<table>` in
    * the bucketed layout, so one table's redelivery can never
    * suppress another table's first delivery — the property the
    * `cdc_multi_table` gate makes hash-checkable. The distinct-table
    * read is control-plane (≤ table count, the reference's configured
    * table list).
    */
  def applyBatchMulti(
      spark: SparkSession,
      store: WatermarkStore,
      stateRoot: String,
      source: String,
      batch: DataFrame
  ): Unit = {
    val tables = batch.select("table").distinct()
      .collect().map(_.getString(0)).sorted
    tables.foreach { t =>
      applyBatch(spark, store, s"$stateRoot/$t", source,
        batch.filter(col("table") === t).drop("table"), table = t)
    }
  }

  /** Multi-table streaming form: ONE checkpointed stream, one
    * consumer, N gated per-table sinks — the topology of the
    * reference's single event loop feeding per-table metadata rows.
    * `demux` assigns each feed row its logical table.
    */
  def runMulti(
      spark: SparkSession,
      eventsDir: String,
      stateRoot: String,
      watermarkPath: String,
      checkpointDir: String,
      demux: DataFrame => DataFrame,
      source: String = "harness-src"
  ): StreamingQuery = {
    val store = new WatermarkStore(watermarkPath)
    demux(feedStream(spark, eventsDir)).writeStream
      .queryName("cdc-apply-multi")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatchMulti(spark, store, stateRoot, source, batch)
      }
      .start()
  }

  /** Non-additive DDL, parsed and migrated. The reference's gate
    * forwards CREATE/ALTER/DROP/RENAME/TRUNCATE statements and then
    * drops them in the no-op `OnDDL`
    * (`internal/cannal/incremental.go:212-217`,
    * `incremental_event.go:31-33`); a materializing sink must choose
    * semantics. Policy here (each a one-off O(state) migration, like
    * the additive path):
    *
    *   - **drop column** = retain-and-null: the column stays in the
    *     schema (downstream readers keep working) but its values null
    *     out — the reversible form of a destructive DDL; physical
    *     removal is an explicit later cleanup, never implicit;
    *   - **rename column** = add-new + tombstone-old: the new name
    *     carries the values, the old column retains-and-nulls;
    *   - **truncate** = state reset: every bucket directory is
    *     removed, the sidecar (schema + bucket count) survives, and
    *     the WATERMARK is deliberately untouched — positions already
    *     covered stay covered, so a redelivered pre-truncate batch
    *     gates to a no-op instead of resurrecting truncated rows.
    *
    * All three are idempotent under redelivery of the same statement
    * (re-null, rename-to-existing no-ops, re-truncate of empty).
    */
  sealed trait DdlOp
  object DdlOp {
    final case class DropColumn(name: String) extends DdlOp
    final case class RenameColumn(from: String, to: String) extends DdlOp
    case object Truncate extends DdlOp

    private val DropRe =
      """(?is)\s*ALTER\s+TABLE\s+\S+\s+DROP\s+(?:COLUMN\s+)?`?(\w+)`?\s*""".r
    private val RenameRe =
      """(?is)\s*ALTER\s+TABLE\s+\S+\s+RENAME\s+(?:COLUMN\s+)?`?(\w+)`?\s+TO\s+`?(\w+)`?\s*""".r
    private val TruncRe = """(?is)\s*TRUNCATE\s+(?:TABLE\s+)?\S+\s*""".r

    /** Statement → migration op, for the statements the reference's
      * prefix gate forwards; `None` for additive/unknown DDL (ADD
      * COLUMN needs no eager migration — the next batch's wider
      * schema triggers it in [[applyBatch]]).
      */
    def parse(stmt: String): Option[DdlOp] = stmt match {
      case DropRe(c) => Some(DropColumn(c))
      case RenameRe(a, b) => Some(RenameColumn(a, b))
      case TruncRe() => Some(Truncate)
      case _ => None
    }
  }

  def applyDdl(spark: SparkSession, stateDir: String, op: DdlOp): Unit =
    MetaTables.readStateSchema(spark, stateDir) match {
      case None => () // DDL ahead of any state: nothing to migrate
      case Some(old) => op match {
        case DdlOp.Truncate =>
          val buckets = bucketFileStats(stateDir).map(_._1)
          removeEmptiedBuckets(stateDir, buckets, present = Set.empty)
        case DdlOp.DropColumn(c) =>
          old.fields.find(_.name == c).foreach { f =>
            val st = spark.read.schema(old).parquet(stateDir).localCheckpoint(true)
            writeBucketed(stateDir,
              st.withColumn(c, lit(null).cast(f.dataType)), dynamic = false)
          }
        case DdlOp.RenameColumn(from, to) =>
          if (old.fieldNames.contains(from) && !old.fieldNames.contains(to)) {
            val f = old(from)
            val st = spark.read.schema(old).parquet(stateDir).localCheckpoint(true)
            writeBucketed(stateDir,
              st.withColumn(to, col(from))
                .withColumn(from, lit(null).cast(f.dataType)),
              dynamic = false)
          }
      }
    }

  /** Current state under merge-on-read: one latest-wins pass over
    * base + delta files. On a fully compacted table this is a no-op
    * window over already-unique keys.
    */
  def readState(spark: SparkSession, stateDir: String): DataFrame = {
    val schema = MetaTables.readStateSchema(spark, stateDir).getOrElse(
      throw new IllegalStateException(s"no state table at $stateDir"))
    ChangeFeed.latestState(spark.read.schema(schema).parquet(stateDir))
  }

  /** Time-travel read: the state AS OF transaction `pos` — the
    * latest-wins view over only the rows at or below it. The
    * Delta/Iceberg `VERSION AS OF` capability, derived from the MOR
    * layout for free: delta files keep every raw feed row (including
    * tombstones), so filtering `pos <= asOf` before the merge replays
    * exactly the prefix of history — one scan, same cost shape as
    * [[readState]], the pos predicate pushed into the parquet scan.
    *
    * Retention contract: compaction (and COW applies) fold history —
    * a base file only retains each key's LATEST pre-compaction row.
    * An `asOf` OLDER than a fold point returns the folded view of
    * that prefix (keys whose history was compacted away resolve to
    * their folded row if it has `pos <= asOf`, else disappear),
    * exactly like a lakehouse table after `VACUUM`: time travel
    * reaches back to the retention horizon, not before it. Callers
    * who need deep history keep deltas uncompacted, or maintain the
    * SCD-2 version table (the `cdc_history_state` gate), which
    * retains versions by design.
    */
  def readStateAsOf(spark: SparkSession, stateDir: String, asOf: Long): DataFrame = {
    val schema = MetaTables.readStateSchema(spark, stateDir).getOrElse(
      throw new IllegalStateException(s"no state table at $stateDir"))
    ChangeFeed.latestState(
      spark.read.schema(schema).parquet(stateDir).filter(col("pos") <= asOf))
  }

  /** Fold every bucket whose file count exceeds `maxFilesPerBucket`
    * back to a single latest-wins base file. Only the over-threshold
    * buckets are read and rewritten (partition-pruned read, dynamic
    * partition overwrite) — untouched buckets' files are never
    * opened. Tombstones drop out here, exactly as they do on the COW
    * path; a bucket left empty (every key deleted) loses its
    * directory. Returns the compacted bucket ids.
    */
  def compact(
      spark: SparkSession,
      stateDir: String,
      maxFilesPerBucket: Int = 4
  ): Seq[Int] = {
    // Target selection is the FS listing ALONE — file counts are what
    // compaction is triggered by, and they come from ≤ bucket-count
    // directory listings, never from scanning state data. A no-op
    // compaction check therefore runs ZERO Spark jobs (spec-asserted);
    // at 100 TB the control plane stays O(buckets), not O(state).
    val targets = bucketFileStats(stateDir)
      .filter(_._2 > maxFilesPerBucket).map(_._1)
    if (targets.isEmpty) Seq.empty
    else {
      val schema = MetaTables.readStateSchema(spark, stateDir).getOrElse(
        throw new IllegalStateException(s"no state table at $stateDir"))
      val merged = ChangeFeed.latestState(
        spark.read.schema(schema).parquet(stateDir)
          .filter(col(bucketCol).isin(targets.map(Integer.valueOf): _*)))
        .localCheckpoint(true)
      writeBucketed(stateDir, merged, dynamic = true)
      val present =
        merged.select(bucketCol).distinct().collect().map(_.getInt(0)).toSet
      removeEmptiedBuckets(stateDir, targets, present)
      targets
    }
  }

  /** Write a state frame in the bucketed layout: one file per bucket
    * (hash repartition on the partition column), sidecar updated
    * after the data. Dynamic mode overwrites only the partitions
    * present in `df`; static mode replaces the whole table.
    *
    * The shuffle width is pinned to the bucket count — write tasks
    * align 1:1 with bucket directories (no per-task dynamic-partition
    * fan-out), which is both the 100 TB layout (a task writes exactly
    * its bucket's file) and measurably cheaper than a conf-width
    * repartition that AQE re-plans (~3× on the harness).
    */
  private def writeBucketed(stateDir: String, df: DataFrame, dynamic: Boolean): Unit = {
    val w = df
      .repartition(bucketCount(stateDir), col(bucketCol))
      .write
      .mode("overwrite")
      .partitionBy(bucketCol)
    (if (dynamic) w.option("partitionOverwriteMode", "dynamic") else w)
      .parquet(stateDir)
    MetaTables.writeStateSchema(stateDir, df.schema)
  }

  /** Bootstrap the state table from a full snapshot — the reference's
    * snapshot-then-stream protocol (`docs/全量抓取逻辑.md:12-52`): the
    * snapshot's materialized rows land in the bucketed layout and the
    * watermark is set to the PINNED snapshot position (`pos`), not to
    * a data-derived set — the snapshot is consistent as-of `pos` even
    * for keys it never saw, so incremental batches at or below `pos`
    * must gate to a no-op. After this, [[applyBatch]] keeps the table
    * fresh.
    */
  def bootstrapSnapshot(
      spark: SparkSession,
      store: WatermarkStore,
      stateDir: String,
      source: String,
      snapshotFeed: DataFrame,
      pos: String
  ): Unit = {
    val bucketed = snapshotFeed.withColumn(bucketCol, bucketOf(bucketCount(stateDir)))
    writeBucketed(stateDir, ChangeFeed.latestState(bucketed), dynamic = false)
    store.upsert(spark, Seq(
      TableWatermark(source, SnapshotJob.schemaName, "events", pos)))
  }

  /** [[bootstrapSnapshot]] made CRASH-RESUMABLE by chunk: at 100 TB a
    * snapshot runs for days, and the reference's one-shot design
    * (`fullamount_service.go:72-110` — all tables in one pass, meta
    * saved only at the end) restarts from zero on any failure. Here
    * the table splits into `numChunks` contiguous PK ranges (the
    * chunked-scan shape of [[SnapshotJob.chunked]], re-derived
    * deterministically from the pinned snapshot read's min/max, so a
    * restarted driver computes the SAME chunks), and completion is
    * tracked per chunk in the watermark store — as a GTID set over a
    * synthetic `chunks` uuid, so finished chunk ids compress to
    * intervals (`chunks:0-41`) and resume is one `contains` per chunk,
    * the exact machinery the incremental gate already uses.
    *
    * Each chunk appends its bucketed rows, then records its id; the
    * crash window between those two writes re-appends that chunk on
    * resume, and the duplicate rows collapse in the latest-wins read —
    * the same at-least-once contract as [[applyBatch]] redelivery
    * (chunks are PK-disjoint, so cross-chunk appends never conflict).
    * The TABLE watermark `pos` is pinned only after every chunk is
    * covered: a half-done snapshot can never admit incremental events.
    *
    * `failAfterChunks` is the crash-injection seam (spec + gate): the
    * run completes (writes AND records) that many chunks, then writes
    * the NEXT chunk's data and throws before its completion upsert —
    * leaving exactly one written-but-unrecorded chunk, the worst-case
    * at-least-once window.
    *
    * Returns the chunk ids this run completed.
    */
  def resumableSnapshot(
      spark: SparkSession,
      store: WatermarkStore,
      stateDir: String,
      source: String,
      snapshotFeed: DataFrame,
      chunkBy: String,
      numChunks: Int,
      pos: String,
      failAfterChunks: Int = Int.MaxValue,
      table: String = "events"
  ): Seq[Int] = {
    require(numChunks > 0, "numChunks must be positive")
    val chunksTable = s"$table#chunks"
    val schemaName = SnapshotJob.schemaName
    val mm = snapshotFeed.agg(min(col(chunkBy)), max(col(chunkBy))).head()
    if (mm.isNullAt(0)) { // empty table: a complete (empty) snapshot
      // …unless a prior non-empty run already pinned chunk bounds: a
      // feed that drifted to EMPTY mid-resume is the same
      // unpinned-feed contract violation as drifted min/max, and the
      // empty-complete path would otherwise mark every chunk covered
      // and pin the table watermark — silently losing the rows the
      // unfinished chunks never wrote
      MetaTables.readChunkBounds(stateDir, table).foreach { case (plo, phi, pn) =>
        throw new IllegalStateException(
          s"resumableSnapshot chunk bounds drifted on resume: pinned " +
            s"[$plo,$phi]/$pn chunks vs an EMPTY recomputed feed — " +
            "snapshotFeed must be a pinned (immutable) read")
      }
      // the sidecar must still exist — a completed empty snapshot is a
      // READABLE empty state table, not a "no state table" error
      if (MetaTables.readStateSchema(spark, stateDir).isEmpty)
        MetaTables.writeStateSchema(stateDir,
          snapshotFeed.withColumn(bucketCol, bucketOf(bucketCount(stateDir))).schema)
      store.upsert(spark, Seq(
        TableWatermark(source, schemaName, chunksTable,
          GtidSet.empty.addRange("chunks", GtidRange(0, numChunks - 1)).serialize),
        TableWatermark(source, schemaName, table, pos)))
      return Seq.empty
    }
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // Pin the chunk geometry on first run and ENFORCE it on resume:
    // "re-derived deterministically from the pinned read" is a caller
    // contract, not a given — a live (unpinned) feed would recompute
    // different bounds while chunk ids are already marked covered,
    // silently missing or duplicating rows. Persisting (lo, hi,
    // numChunks) makes the contract checkable: a drifted resume fails
    // loudly instead.
    MetaTables.readChunkBounds(stateDir, table) match {
      case Some((plo, phi, pn)) =>
        if (plo != lo || phi != hi || pn != numChunks)
          throw new IllegalStateException(
            s"resumableSnapshot chunk bounds drifted on resume: pinned " +
              s"[$plo,$phi]/$pn chunks vs recomputed [$lo,$hi]/$numChunks — " +
              "snapshotFeed must be a pinned (immutable) read")
      case None => MetaTables.writeChunkBounds(stateDir, table, lo, hi, numChunks)
    }
    val width = math.max(1L, (hi - lo) / numChunks + 1)
    val done = store.watermark(spark, source, schemaName, chunksTable)
    val pending = (0 until numChunks).filterNot(k => done.contains("chunks", k.toLong))
    val completed = Seq.newBuilder[Int]
    var written = 0
    pending.foreach { k =>
      val (cLo, cHi) = (lo + k * width, lo + (k + 1) * width - 1)
      val chunk = snapshotFeed.filter(col(chunkBy) >= cLo && col(chunkBy) <= cHi)
      val bucketed = chunk.withColumn(bucketCol, bucketOf(bucketCount(stateDir)))
      if (MetaTables.readStateSchema(spark, stateDir).isEmpty)
        MetaTables.writeStateSchema(stateDir, bucketed.schema)
      bucketed
        .repartition(bucketCount(stateDir), col(bucketCol))
        .write.mode("append").partitionBy(bucketCol).parquet(stateDir)
      written += 1
      if (written > failAfterChunks)
        throw new IllegalStateException(
          s"injected crash: chunk $k written but not recorded")
      store.upsert(spark, Seq(TableWatermark(source, schemaName, chunksTable,
        GtidSet.empty.add("chunks", k.toLong).serialize)))
      completed += k
    }
    val covered = store.watermark(spark, source, schemaName, chunksTable)
    if ((0 until numChunks).forall(k => covered.contains("chunks", k.toLong)))
      store.upsert(spark, Seq(TableWatermark(source, schemaName, table, pos)))
    completed.result()
  }

  /** Union schema for additive evolution: existing field order first
    * (batch types win on retype — the DDL is authoritative), then
    * batch-new fields appended.
    */
  private def mergedSchema(old: StructType, next0: StructType): StructType = {
    val next = MetaTables.normalized(next0)
    val nextByName = next.fields.map(f => f.name -> f).toMap
    StructType(
      old.fields.map(f => nextByName.getOrElse(f.name, f)) ++
        next.fields.filterNot(f => old.fieldNames.contains(f.name)))
  }

  /** Per-bucket (id, file count, bytes) from ≤ bucket-count directory
    * listings — the control-plane source of truth for compaction and
    * split decisions. Pure driver-side FS metadata: no Spark job, no
    * state data touched (same local-FS seam as the sidecars).
    */
  private[cdc] def bucketFileStats(stateDir: String): Seq[(Int, Int, Long)] = {
    val base = java.nio.file.Paths.get(stateDir)
    if (!java.nio.file.Files.exists(base)) Seq.empty
    else graft.Fs.listDir(base)
      .filter(p => p.getFileName.toString.startsWith(s"$bucketCol="))
      .map { p =>
        val b = p.getFileName.toString.stripPrefix(s"$bucketCol=").toInt
        val files = graft.Fs.listDir(p)
          .filter(_.getFileName.toString.endsWith(".parquet"))
        (b, files.size, files.map(java.nio.file.Files.size).sum)
      }
      .sortBy(_._1)
  }

  /** Per-bucket health of the state table: file count, bytes, and —
    * opt-in — rows. The small-file / skew observability surface of
    * the COW sink. File counts/bytes come from the driver-side FS
    * listing ([[bucketFileStats]]); `withRows = true` additionally
    * runs a per-bucket row count over the state parquet — an O(state)
    * metadata job that exists for DIAGNOSTICS only. Nothing in the
    * pipeline's control plane ([[compact]], [[maybeSplit]]) consumes
    * it: at 100 TB a compaction check must not pay a table scan.
    */
  def stateMetrics(
      spark: SparkSession, stateDir: String,
      withRows: Boolean = false): DataFrame = {
    import spark.implicits._
    val fs = bucketFileStats(stateDir).toDF(bucketCol, "n_files", "bytes")
    if (!withRows) fs.orderBy(bucketCol)
    else {
      val rows = MetaTables.readStateSchema(spark, stateDir) match {
        case Some(sc) =>
          spark.read.schema(sc).parquet(stateDir)
            .groupBy(col(bucketCol)).agg(count(lit(1)).as("n_rows"))
        case None => Seq.empty[(Int, Long)].toDF(bucketCol, "n_rows")
      }
      fs.join(rows, Seq(bucketCol), "left")
        .select(col(bucketCol), col("n_files"), col("bytes"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"))
        .orderBy(bucketCol)
    }
  }

  /** Double the bucket count: every key in old bucket `b` lands in
    * `b` or `b + n` under `2n` (hash % n == b ⟹ hash % 2n ∈ {b, b+n}),
    * so the rewrite is per-bucket LOCAL — each old directory fans out
    * to exactly two new ones, no cross-bucket data movement. (The
    * harness implementation routes through one bucketed write for
    * simplicity; the doubling invariant is what makes the real
    * per-bucket rewrite possible, and the spec asserts it.)
    * O(state) once per doubling — amortized like any LSM/extendible-
    * hashing reorganization; applyBatch stays O(batch) throughout.
    */
  def splitBuckets(spark: SparkSession, stateDir: String): Int = {
    val old = bucketCount(stateDir)
    val next = old * 2
    val schema = MetaTables.readStateSchema(spark, stateDir).getOrElse(
      throw new IllegalStateException(s"no state table at $stateDir"))
    val st = spark.read.schema(schema).parquet(stateDir)
      .drop(bucketCol)
      .withColumn(bucketCol, bucketOf(next))
      .localCheckpoint(true)
    writeBucketed(stateDir, st, dynamic = false)
    MetaTables.writeBucketCount(stateDir, next)
    next
  }

  /** Split when the largest bucket outgrows `maxBucketBytes` — the
    * size-tracking knob that keeps per-bucket rewrite units bounded as
    * state grows. Returns the new bucket count, or None if no split
    * was needed.
    */
  def maybeSplit(spark: SparkSession, stateDir: String, maxBucketBytes: Long): Option[Int] = {
    val stats = bucketFileStats(stateDir)
    if (stats.isEmpty || stats.map(_._3).max <= maxBucketBytes) None
    else Some(splitBuckets(spark, stateDir))
  }

  /** Apply flavor for the consumer loop — the reference's single
    * consumer (`internal/cannal/fullamount_service.go:203-223`) maps
    * to one foreachBatch whose body is either sink:
    *
    *   - [[Cow]]: read-merge-rewrite of touched buckets per batch
    *     ([[applyBatch]]) — reads stay cheap, writes pay
    *     O(touched-bucket state);
    *   - [[Mor]]: strict O(batch) delta appends ([[appendDeltas]])
    *     with [[compact]] every `compactEvery` batches — writes stay
    *     cheap, reads pay the merge until compaction folds it.
    */
  sealed trait ApplyMode
  case object Cow extends ApplyMode
  final case class Mor(compactEvery: Int = 4, maxFilesPerBucket: Int = 4) extends ApplyMode

  /** The foreachBatch body for one apply mode — shared by [[run]] and
    * any caller wiring its own stream (spec'd directly). Compaction
    * cadence keys off the checkpointed `batchId`, so a restarted
    * stream keeps the cadence instead of resetting it.
    */
  def applyFor(
      mode: ApplyMode,
      store: WatermarkStore,
      stateDir: String,
      source: String
  )(batch: DataFrame, batchId: Long): Unit = mode match {
    case Cow => applyBatch(batch.sparkSession, store, stateDir, source, batch)
    case Mor(every, maxFiles) =>
      appendDeltas(batch.sparkSession, store, stateDir, source, batch)
      if (every > 0 && (batchId + 1) % every == 0)
        compact(batch.sparkSession, stateDir, maxFiles)
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
      source: String = "harness-src",
      mode: ApplyMode = Cow
  ): StreamingQuery = {
    val store = new WatermarkStore(watermarkPath)
    feedStream(spark, eventsDir).writeStream
      .queryName("cdc-apply")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyFor(mode, store, stateDir, source)(batch, batchId)
      }
      .start()
  }
}
