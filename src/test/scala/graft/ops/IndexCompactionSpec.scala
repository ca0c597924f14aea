package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexCompactionSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def sortedRows(dir: String): Seq[String] = {
    val df = spark.read.parquet(dir)
    val cols = df.columns.sorted.map(col)
    df.select(cols: _*).collect().map(_.toString).toSeq.sorted
  }

  test("N appended waves fold to few files with identical table content") {
    import spark.implicits._
    val dir = s"target/tmp/idxcompact-${System.nanoTime()}/t"
    // 10 waves, one-or-more files each — the daily-append shape
    (0 until 10).foreach { w =>
      Seq.tabulate(5)(i => (w * 100L + i, s"payload-$w-$i"))
        .toDF("doc_id", "v").coalesce(1).write.mode("append").parquet(dir)
    }
    assert(IndexCompaction.dataFileCount(dir) >= 10)
    val before = sortedRows(dir)
    assert(IndexCompaction.compact(spark, dir, maxFiles = 4))
    assert(IndexCompaction.dataFileCount(dir) <= 4,
      "tiny table must fold to the byte-bounded minimum")
    assert(sortedRows(dir) == before, "compaction must be content-identical")
    // idempotent: now under threshold, second call is a no-op
    assert(!IndexCompaction.compact(spark, dir, maxFiles = 4))
  }

  test("no-op compact is FS-metadata only: zero Spark jobs under threshold") {
    import spark.implicits._
    val dir = s"target/tmp/idxcompactnoop-${System.nanoTime()}/t"
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(!IndexCompaction.compact(spark, dir, maxFiles = 4))
      assert(!IndexCompaction.compactWithTombstones(
        spark, dir, s"$dir-dels", "doc_id", maxFiles = 4))
      Thread.sleep(1000) // listener events post asynchronously
      assert(jobs.get() == 0,
        s"no-op compact must not launch Spark jobs (launched ${jobs.get()})")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("tombstone fold makes deletes physical and clears the tombstone table") {
    import spark.implicits._
    val base = s"target/tmp/idxdels-${System.nanoTime()}"
    val dir = s"$base/t"; val dels = s"$base/dels"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    Seq(Tuple1(2L)).toDF("doc_id").coalesce(1).write.mode("append").parquet(dels)
    // any tombstone forces a fold even under the file-count threshold
    assert(IndexCompaction.compactWithTombstones(spark, dir, dels, "doc_id", maxFiles = 64))
    assert(spark.read.parquet(dir).select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L))
    assert(IndexCompaction.dataFileCount(dels) == 0,
      "applied tombstones must not mask again")
    // quiet table, no tombstones → no-op again
    assert(!IndexCompaction.compactWithTombstones(spark, dir, dels, "doc_id", maxFiles = 64))
  }

  test("partition cadence driver folds ONLY the hot partition — cold files untouched") {
    import spark.implicits._
    val root = s"target/tmp/idxparts-${System.nanoTime()}/t"
    // a band-partitioned index: band=0 is hot (10 append waves),
    // band=1 and band=2 are cold (one file each)
    (0 until 10).foreach { w =>
      Seq.tabulate(4)(i => (w * 100L + i, s"p-$w-$i"))
        .toDF("doc_id", "v").coalesce(1).write.mode("append").parquet(s"$root/band=0")
    }
    Seq((1L, "c1")).toDF("doc_id", "v").coalesce(1).write.parquet(s"$root/band=1")
    Seq((2L, "c2")).toDF("doc_id", "v").coalesce(1).write.parquet(s"$root/band=2")
    def mtimes(dir: String): Map[String, Long] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
    val cold = (mtimes(s"$root/band=1"), mtimes(s"$root/band=2"))
    val before = (sortedRows(s"$root/band=0"), sortedRows(s"$root/band=1"))
    assert(IndexCompaction.compactPartitions(spark, root, maxFiles = 4) == 1,
      "exactly the hot partition must trip the per-partition trigger")
    assert(IndexCompaction.dataFileCount(s"$root/band=0") <= 4)
    assert((mtimes(s"$root/band=1"), mtimes(s"$root/band=2")) == cold,
      "cold partitions must not be read, rewritten, or touched")
    assert((sortedRows(s"$root/band=0"), sortedRows(s"$root/band=1")) == before,
      "the per-partition fold must be content-identical")
    // everything under threshold now → whole-table cadence pass is a no-op
    assert(IndexCompaction.compactPartitions(spark, root, maxFiles = 4) == 0)
  }

  test("a versioned tombstone removes strictly-older rows and spares the replacement") {
    import spark.implicits._
    val base = s"target/tmp/idxvdels-${System.nanoTime()}"
    val dir = s"$base/t"; val dels = s"$base/dels"
    // key 2 was re-embedded at ver 2 (rows at ver 0 and 2 coexist);
    // key 3 was hard-deleted (upto = MaxValue); key 1 untouched
    Seq((1L, "a", 0L), (2L, "b-old", 0L), (2L, "b-new", 2L), (3L, "c", 0L))
      .toDF("doc_id", "v", "ver").coalesce(1).write.mode("overwrite").parquet(dir)
    Seq((2L, 2L), (3L, Long.MaxValue))
      .toDF("doc_id", "upto").coalesce(1).write.mode("append").parquet(dels)
    assert(IndexCompaction.compactWithVersionedTombstones(
      spark, dir, dels, "doc_id", "ver", maxFiles = 64))
    val kept = spark.read.parquet(dir).select("doc_id", "v").as[(Long, String)]
      .collect().sorted.toSeq
    assert(kept == Seq((1L, "a"), (2L, "b-new")),
      s"fold must keep the replacement and drop stale + deleted rows, got $kept")
    assert(IndexCompaction.dataFileCount(dels) == 0)
    assert(!IndexCompaction.compactWithVersionedTombstones(
      spark, dir, dels, "doc_id", "ver", maxFiles = 64))
  }

  test("d12's standing index survives an in-gate fold: probe results identical before/after") {
    // drive the REAL gate against a pinned index dir, snapshot its
    // matches, then fold both index tables hard (maxFiles = 1 forces
    // the rewrite) and re-run the second wave's probe shape by
    // re-entering the gate in place — the restart-survival path —
    // asserting the match set is byte-identical
    val idx = java.nio.file.Files.createTempDirectory("graft-idxc-d12-")
    try {
      val first = Dedup.d12StreamDedupWithIndex(spark, sf, idx.toString)
        .collect().map(_.toString).toSeq.sorted
      val shs = s"$idx/shs"; val bands = s"$idx/bands"
      val rowsBefore = (sortedRows(shs), sortedRows(bands))
      assert(IndexCompaction.compact(spark, shs, maxFiles = 1))
      assert(IndexCompaction.compact(spark, bands, maxFiles = 1))
      assert((sortedRows(shs), sortedRows(bands)) == rowsBefore)
      val again = Dedup.d12StreamDedupWithIndex(spark, sf, idx.toString)
        .collect().map(_.toString).toSeq.sorted
      // the re-entered session probes the FOLDED index; every wave-1/
      // wave-2 match recurs (plus re-delivery self-matches against the
      // first run's admitted ids, which prove the folded index still
      // holds them)
      assert(first.toSet.subsetOf(again.toSet),
        "folded index lost matches the unfolded index produced")
    } finally graft.Fs.deleteRecursively(idx)
  }
}
