package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Spill-path evidence: run shuffle-heavy registry queries under a
  * deliberately starved heap and prove they SPILL AND COMPLETE instead
  * of OOMing — the spill-vs-OOM distinction is existential at 100 TB,
  * where some stage always exceeds executor memory, and this sandbox's
  * 128 GiB default never exercises it.
  *
  * Mechanics: `SPARK_DRIVER_MEM` caps the forked JVM (build.sbt wires
  * it into -Xmx), so at e.g. 1200m the unified memory pool shared by
  * all local[N] task threads is a few hundred MB; high-cardinality
  * hash aggregates then overflow to sort-based aggregation and the
  * external sorter's disk spill. A task-level listener sums
  * `memoryBytesSpilled`/`diskBytesSpilled` as the proof the fallback
  * path (not luck) carried the query. Row counts are asserted against
  * the UNSTARVED runs' counts passed through the environment-free
  * fixture (the queries are deterministic), so "completed" means
  * "completed CORRECTLY under pressure".
  *
  * Run (starved, the point):
  *   SPARK_DRIVER_MEM=1200m SPARK_GRAFT_CPUS=8 \
  *     sbt "Test/runMain graft.SpillStress"
  * Prefers the 10× derivative under target/tmp/sf1-derived (built by
  * [[Sf1Stress]]) for real pressure; falls back to sf0.1.
  * Writes SPILLCHECK.json.
  */
object SpillStress {
  /** High-cardinality shuffle shapes: exact-dedup's md5 rollup (hash
    * agg overflow), TF-IDF's (word, doc) explosion (the widest
    * aggregation state in the registry), and the span-dedup gram
    * pipeline (explode + multi-stage shuffle with sorts).
    */
  private val Queries = Seq("d1_exact_dedup", "t25_tfidf", "d10_span_dedup")

  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val heap = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    // Starve the UNIFIED POOL, not the heap: dropping -Xmx below the
    // scan working set (parquet page buffers, 16 tasks x
    // maxPartitionBytes) OOMs in NON-spillable memory — measured at
    // 640m — which is the failure spilling cannot save you from. The
    // spill path lives in the spillable consumers (agg maps, sorters),
    // which cap at spark.memory.fraction x usable heap; shrinking the
    // fraction reproduces a loaded executor (tiny per-task budget,
    // adequate heap) exactly.
    val frac = sys.env.getOrElse("SPARK_GRAFT_MEMFRAC", "0.05")
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.memory.fraction", frac)
      .appName("spill-stress").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 100x sf0.1 documents (the only table these queries read): the
    // 10x derivative's per-task aggregation state still fits the
    // starved pool, so it proves nothing. Built once, reused.
    val dir = "target/tmp/sf10-docs"
    if (!new java.io.File(s"$dir/documents.parquet").isDirectory) {
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val nDocs = docs.count()
      docs.crossJoin(spark.range(0, 100).select(col("id").as("copy")))
        .select(
          (col("doc_id") + col("copy") * nDocs).as("doc_id"),
          when(col("copy") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" shard"), col("copy"))).as("text"),
          col("lang"), col("source"),
          (length(col("text")) + when(col("copy") === 0, 0).otherwise(8)).as("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    val mem = new AtomicLong(0L)
    val disk = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        Option(t.taskMetrics).foreach { m =>
          mem.addAndGet(m.memoryBytesSpilled)
          disk.addAndGet(m.diskBytesSpilled)
        }
    })
    val results = Queries.map { q =>
      mem.set(0L); disk.set(0L)
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // listener events drain asynchronously (the bus-flush API is
      // private[spark]); a generous settle is fine for a >0 proof
      Thread.sleep(2000)
      val (mS, dS) = (mem.get(), disk.get())
      println(f"[spill-stress] $q%-18s rows=$rows%d  ${dt}%6.2fs  spilled mem=${mS / 1048576}%d MiB disk=${dS / 1048576}%d MiB")
      (q, rows, dt, mS, dS)
    }
    spark.stop()
    val spilled = results.count(_._5 > 0)
    val json = results.map { case (q, rows, dt, mS, dS) =>
      f"""  "$q": {"rows": $rows, "sec": $dt%.2f, "mem_spill_bytes": $mS, "disk_spill_bytes": $dS}"""
    }.mkString("{\n", ",\n",
      s""",\n  "heap_mib": $heap, "sf_dir": "$dir", "queries_spilled": $spilled, "errors": 0\n}\n""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SPILLCHECK.json"), json.getBytes("UTF-8"))
    println(s"[spill-stress] wrote SPILLCHECK.json ($spilled/${results.size} queries spilled, heap ${heap} MiB)")
    require(spilled > 0,
      "nothing spilled - lower SPARK_DRIVER_MEM; this run proves nothing about the spill path")
  }
}
