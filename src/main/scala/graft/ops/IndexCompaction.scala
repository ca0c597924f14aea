package graft.ops

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * All filesystem access goes through the Hadoop FileSystem bound to
  * the path (local behavior identical; HDFS/S3 deployments get the
  * session's hadoop conf), and a fold writes to a SIBLING temp
  * directory that is atomically swapped into place — a crash or
  * executor loss mid-rewrite leaves the original files intact, which
  * matters here more than for CDC state because the streaming index
  * cannot be rebuilt from already-consumed waves. The sibling write
  * also removes the old localCheckpoint pinning: the fold streams
  * source files to new files without staging rows in executor memory.
  *
  * At 100 TB the index tables are additionally partitioned (by band /
  * by cell); [[compactPartitions]] is the cadence driver — one
  * listing of the table root, then an independent per-partition fold
  * of exactly the directories whose file count trips the trigger.
  */
object IndexCompaction {

  private def hadoopConf() =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** The table's data files — one FS listing, no Spark jobs.
    * Underscore/dot names are Spark metadata (`_SUCCESS`, hidden), not
    * data.
    */
  private def dataFiles(dir: String): Seq[FileStatus] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(hadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
  }

  def dataFileCount(dir: String): Int = dataFiles(dir).size

  /** Target output width for a fold: bounded by bytes, never fewer
    * than one. 128 MiB default matches the scan-split size the read
    * path is tuned for (`spark.sql.files.maxPartitionBytes`) — a
    * compacted file is exactly one scan task.
    */
  private def foldWidth(files: Seq[FileStatus], targetBytes: Long): Int =
    math.max(1, math.ceil(files.map(_.getLen).sum.toDouble / targetBytes).toInt)

  /** Write `folded` beside `dir` and atomically swap it into place:
    * tmp write → retire original → promote tmp → drop retired. The
    * only window in which `dir` is absent is between two renames; a
    * failure before the promote leaves the original (live or retired)
    * on disk — never a half-written table.
    *
    * RECOVERY (crash inside the rename window, or a reader racing a
    * future multi-threaded caller and seeing `dir` missing): the two
    * sibling names are deterministic — if `dir` is absent,
    * `dir.__fold_tmp` holds the complete folded table (its write
    * finished before any rename ran) and `dir.__fold_old` holds the
    * retired original; rename EITHER back to `dir` (they contain the
    * same rows) and delete the other. The swap never deletes data
    * before the promote succeeds, so one of the two siblings is
    * always whole. Current callers are single-threaded maintenance
    * jobs (the compaction cadence), which is why the two-rename
    * window is acceptable; a concurrent-reader deployment would put
    * the table name behind a pointer (manifest file) instead of a
    * directory rename.
    */
  private def writeSwapped(folded: DataFrame, dir: String, width: Int): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(hadoopConf())
    val tmp = new Path(dir + ".__fold_tmp")
    val retired = new Path(dir + ".__fold_old")
    fs.delete(tmp, true); fs.delete(retired, true) // stale crash leftovers
    folded.coalesce(width).write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(p, retired), s"compaction swap: could not retire $dir")
    require(fs.rename(tmp, p), s"compaction swap: could not promote $tmp")
    fs.delete(retired, true)
  }

  /** Fold the table at `dir` when its file count exceeds `maxFiles`.
    * Returns true iff a rewrite ran. The no-op path is one listing.
    * `coalesce` (not repartition) folds without a shuffle — compaction
    * moves bytes, it should not also exchange them.
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
      writeSwapped(spark.read.parquet(dir), dir, foldWidth(files, targetBytes))
      true
    }
  }

  /** Fold `dir` to the given RESOLVED content — the semantic
    * compactor the versioned/tombstoned layouts need (s34's graph
    * edge table: latest-version-per-src resolve + tombstone drop,
    * rewritten flat). `folded` may read from `dir`: the swap writes a
    * sibling temp to completion first, so the source files are intact
    * while the resolve scans them, and the atomic-rename crash story
    * above applies unchanged. Output width is sized from the current
    * files so a compacted file stays one scan task.
    */
  def foldSwapped(dir: String, folded: DataFrame,
      targetBytes: Long = 128L << 20): Unit =
    writeSwapped(folded, dir, foldWidth(dataFiles(dir), targetBytes))

  /** The per-partition cadence driver a partitioned index runs on a
    * timer: ONE listing of `tableDir` finds the partition directories
    * (`band=…/`, `cell=…/`), then each directory whose own file count
    * trips `maxFiles` folds independently — cold partitions are never
    * read, never rewritten (their files' mtimes don't move —
    * spec-asserted). Returns the number of partitions folded.
    */
  def compactPartitions(
      spark: SparkSession,
      tableDir: String,
      maxFiles: Int = 64,
      targetBytes: Long = 128L << 20
  ): Int = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(hadoopConf())
    if (!fs.exists(root)) 0
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.contains(".__fold_"))
      .count(st => compact(spark, st.getPath.toString, maxFiles, targetBytes))
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
      val folded =
        if (hasDels)
          base.join(
            broadcast(spark.read.parquet(delsDir).select(keyCol).distinct()),
            Seq(keyCol), "left_anti")
        else base
      writeSwapped(folded, dir, foldWidth(files, targetBytes))
      if (hasDels) clearTombstones(delsDir)
      true
    }
  }

  /** VERSIONED tombstones — the streaming-UPDATE companion (s22). An
    * in-place re-embedding (same key, new vector) appends the new row
    * with a higher `verCol` AND a tombstone `(keyCol, upto)` where
    * `upto` is the new row's version: the tombstone supersedes every
    * row of that key STRICTLY OLDER than `upto`, so the replacement
    * row it rode in with survives both the read-time mask and this
    * physical fold. A plain delete is the same record with
    * `upto = Long.MaxValue` — one tombstone model covers both.
    * Tombstones aggregate to per-key max first (last update wins),
    * so the broadcast stays one row per touched key.
    */
  def compactWithVersionedTombstones(
      spark: SparkSession,
      dir: String,
      delsDir: String,
      keyCol: String,
      verCol: String,
      maxFiles: Int = 64,
      targetBytes: Long = 128L << 20
  ): Boolean = {
    val files = dataFiles(dir)
    val hasDels = dataFileCount(delsDir) > 0
    if (files.size <= maxFiles && !hasDels) false
    else {
      val base = spark.read.parquet(dir)
      val folded =
        if (hasDels) {
          val tombs = spark.read.parquet(delsDir)
            .groupBy(keyCol).agg(max(col("upto")).as("upto"))
          base.join(broadcast(tombs),
            base(keyCol) === tombs(keyCol) && base(verCol) < tombs("upto"),
            "left_anti")
        } else base
      writeSwapped(folded, dir, foldWidth(files, targetBytes))
      if (hasDels) clearTombstones(delsDir)
      true
    }
  }

  /** Applied tombstones clear to an EMPTY dir (not a deleted one) so
    * the read path's "tombstones exist" listing stays valid.
    */
  private def clearTombstones(delsDir: String): Unit = {
    val p = new Path(delsDir)
    val fs = p.getFileSystem(hadoopConf())
    fs.listStatus(p).foreach(st => fs.delete(st.getPath, true))
  }
}
