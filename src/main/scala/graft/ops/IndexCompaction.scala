package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Size-triggered compaction for the streaming-appended index tables
  * (d12's shingle/band pair, s17's IVF cell table, mm12's
  * fingerprint/band pair). Each ingestion wave appends one-or-more
  * parquet files; at a daily cadence that is the classic small-files
  * death — read amplification grows without bound while row volume
  * doesn't. The CDC state table already solved this shape
  * ([[graft.cdc.CdcPipeline.compact]]: size-triggered, O(buckets)
  * control plane); this is the same discipline for the FLAT index
  * layout: the trigger decision is ONE directory listing (a no-op
  * check runs zero Spark jobs — spec-asserted), and a triggered fold
  * reads the table once and rewrites it into
  * `ceil(bytes / targetBytes)` files, content-identical.
  *
  * At 100 TB the index tables are additionally partitioned (by band /
  * by cell) and this fold runs per partition directory off the same
  * listing — the entry point takes the directory, so the cadence
  * driver loops partitions; nothing in the fold itself is
  * whole-table-minded beyond the directory it is handed.
  */
object IndexCompaction {

  /** The table's data files — one FS listing, no Spark jobs.
    * Underscore/dot names are Spark metadata (`_SUCCESS`, hidden), not
    * data.
    */
  private def dataFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .toSeq
  }

  def dataFileCount(dir: String): Int = dataFiles(dir).size

  /** Target output width for a fold: bounded by bytes, never fewer
    * than one. 128 MiB default matches the scan-split size the read
    * path is tuned for (`spark.sql.files.maxPartitionBytes`) — a
    * compacted file is exactly one scan task.
    */
  private def foldWidth(files: Seq[java.io.File], targetBytes: Long): Int =
    math.max(1, math.ceil(files.map(_.length).sum.toDouble / targetBytes).toInt)

  /** Fold the table at `dir` when its file count exceeds `maxFiles`.
    * Returns true iff a rewrite ran. The no-op path is one listing.
    *
    * The localCheckpoint pins the rows BEFORE the overwrite replaces
    * the files they came from (the [[graft.cdc.CdcPipeline]] COW
    * posture); `coalesce` (not repartition) folds without a shuffle —
    * compaction moves bytes, it should not also exchange them.
    */
  def compact(
      spark: SparkSession,
      dir: String,
      maxFiles: Int = 64,
      targetBytes: Long = 128L << 20
  ): Boolean = {
    val files = dataFiles(dir)
    if (files.size <= maxFiles) false
    else {
      val snap = spark.read.parquet(dir).localCheckpoint(true)
      snap.coalesce(foldWidth(files, targetBytes))
        .write.mode("overwrite").parquet(dir)
      true
    }
  }

  /** The merge-on-read DELETE companion: fold the table at `dir`
    * APPLYING the tombstones accumulated at `delsDir` (a parquet
    * table holding one `keyCol` per deleted row), then clear the
    * tombstone table. Between compactions the read path masks deletes
    * with a broadcast anti-join against `delsDir` (bounded by
    * ingest-rate × cadence); compaction is when the mask becomes
    * physical — the Lucene/Hudi deletion model, which is the only
    * shape that avoids an O(index) rewrite per tombstone (a delete
    * arrives with a KEY, not the vector, so no cell/band pruning can
    * locate it without a secondary index).
    *
    * Unlike [[compact]] this triggers on EITHER file count or the
    * presence of any tombstone (`force`): deletes must eventually
    * become physical even on a quiet table. Returns true iff a
    * rewrite ran.
    */
  def compactWithTombstones(
      spark: SparkSession,
      dir: String,
      delsDir: String,
      keyCol: String,
      maxFiles: Int = 64,
      targetBytes: Long = 128L << 20
  ): Boolean = {
    val files = dataFiles(dir)
    val hasDels = dataFileCount(delsDir) > 0
    if (files.size <= maxFiles && !hasDels) false
    else {
      val base = spark.read.parquet(dir)
      val folded = (if (hasDels)
        base.join(
          broadcast(spark.read.parquet(delsDir).select(keyCol).distinct()),
          Seq(keyCol), "left_anti")
      else base).localCheckpoint(true)
      folded.coalesce(foldWidth(files, targetBytes))
        .write.mode("overwrite").parquet(dir)
      if (hasDels) {
        // tombstones are now physical; an empty dir (not a deleted one)
        // keeps the table's "exists" state for the read path
        val d = java.nio.file.Paths.get(delsDir)
        graft.Fs.walkSeq(d).filter(_ != d).sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.delete)
      }
      true
    }
  }
}
