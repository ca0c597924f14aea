package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Spill-path evidence: run the registry's heavyweights under a
  * deliberately starved memory pool and prove they SPILL AND COMPLETE
  * CORRECTLY instead of OOMing — the spill-vs-OOM distinction is
  * existential at 100 TB, where some stage always exceeds executor
  * memory, and this sandbox's 128 GiB default never exercises it.
  *
  * Two modes, so "completed" provably means "completed CORRECTLY":
  *   1. RECORD (SPARK_GRAFT_SPILL_RECORD=1, default memory fraction):
  *      runs every query UNSTARVED and writes the deterministic row
  *      counts to target/tmp/spill_expected.json.
  *   2. STARVED (the default): `spark.memory.fraction` drops to 0.1 —
  *      a loaded executor's tiny per-task budget with an adequate
  *      heap, so the pressure lands in the SPILLABLE consumers (agg
  *      maps, sorters), not the non-spillable scan working set (an
  *      -Xmx squeeze OOMs in parquet page buffers instead; this
  *      query set needs ≥4g — 1200m OOMs non-spillably in the 100×
  *      scan). Each query's row count is asserted against the
  *      recorded unstarved count, and a task-level listener sums
  *      memory/disk spill bytes as the proof the fallback path (not
  *      luck) carried it. Queries whose starved working set still
  *      fits are recorded explicitly as fits-in-pool.
  *
  * Listener counters drain asynchronously; instead of a fixed sleep
  * (which undercounts on a loaded machine or bleeds into the next
  * query), each query POLLS until the counters are stable for
  * [[StableMs]] — queries run sequentially, so a stable counter is a
  * drained counter.
  *
  * Corpora: the three widest document aggregations run on a 100×
  * documents derivative (their 10× per-task state still fits the
  * starved pool and would prove nothing); everything else runs on the
  * [[Sf1Stress]] 10× full-table derivative.
  *
  * Run:
  *   SPARK_GRAFT_SPILL_RECORD=1 SPARK_GRAFT_CPUS=8 sbt "Test/runMain graft.SpillStress"
  *   SPARK_DRIVER_MEM=4g SPARK_GRAFT_CPUS=8 sbt "Test/runMain graft.SpillStress"
  * Writes SPILLCHECK.json (starved mode).
  */
object SpillStress {
  private val StableMs = 1500L
  private val PollCapMs = 20000L

  /** (query, corpus): "docs100" = the 100× documents-only derivative,
    * "sf1" = the 10× full derivative. The set is the registry's
    * heaviest by min-cost in BENCH_full_latest (s33/s32 graph storage,
    * mm13/mm21 codec legs, q54/q59 PageRank, d7 connected components,
    * t34 ranking, d1/t25/d10 the widest aggregation states).
    */
  private val Queries = Seq(
    "d1_exact_dedup" -> "docs100",
    "t25_tfidf" -> "docs100",
    "d10_span_dedup" -> "docs100",
    "s33_graph_stream" -> "sf1",
    "s32_graph_freshness" -> "sf1",
    "mm13_real_decode" -> "sf1",
    "mm21_patch_grid" -> "sf1",
    "q54_pagerank" -> "sf1",
    "q59_pagerank_maint" -> "sf1",
    "d7_dup_clusters" -> "sf1",
    "t34_ppl_buckets" -> "sf1",
    // round-18 continuation: the new graph serving gates — their
    // in-gate standing-graph builds are the widest states they own
    "s36_graph_filtered" -> "sf1",
    "s37_graph_quant" -> "sf1",
    "s38_graph_serve" -> "sf1",
    // round-19: tail-only stored-graph rows. The build-inclusive graph
    // gates above all report near-identical spill because their
    // dominant spiller IS the same deterministic in-gate knnEdges
    // build (the per-query counters reset — see the run loop — so
    // identical bytes mean identical work, not a stale accumulator);
    // that attests the build five times and the maintenance tails
    // zero. These rows run s33's ingest and s34's delete+fold against
    // a RECORD-mode PREBUILT stored index (copied fresh per run — the
    // gates mutate it), so their spill prices ONLY the walk +
    // ingest/repair/fold path under starvation.
    "s33_ingest_tail" -> "sf1",
    "s34_delete_tail" -> "sf1")

  private val ExpectedPath = "target/tmp/spill_expected.json"

  /** The unstarved prebuilt stored graph the tail rows re-enter
    * (RECORD mode builds it; STARVED mode only copies it).
    */
  private val PrebuiltIdx = "target/tmp/spill-graph-idx"

  /** Run `f` against a fresh copy of the prebuilt index. */
  private def withIdxCopy(f: String => Long): Long = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-spill-idx-")
    try {
      graft.Fs.copyRecursively(java.nio.file.Paths.get(PrebuiltIdx), tmp)
      f(tmp.toString)
    } finally graft.Fs.deleteRecursively(tmp)
  }

  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val record = sys.env.contains("SPARK_GRAFT_SPILL_RECORD")
    val heap = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    // 0.15 is the measured floor for this query set: at 0.05 q54's
    // pair-distinct cannot acquire even its first aggregation page
    // (AGGREGATE_OUT_OF_MEMORY), and at 0.1 the round-18 graph
    // serving gates hit the same wall in their walk folds — the
    // starvation floor is the hash agg's minimum page budget, not
    // the data volume. At 0.15 the wide-state queries still spill
    // tens of GiB. NOTE: fraction and pageSize moved together in
    // round 18 (0.1/64m -> 0.15/2m) and the floor claim is for the
    // PAIR — the whole set was re-run green under 0.15/2m, and the
    // old 0.1 floor was measured under the default page size, so the
    // two records are not directly comparable knob-for-knob.
    val frac = if (record) "0.6"
      else sys.env.getOrElse("SPARK_GRAFT_MEMFRAC", "0.15")
    // storageFraction drops with the pool: the gates pin reused frames
    // via localCheckpoint, and at fraction 0.05 the default 0.5
    // PROTECTED storage half starves execution below its minimum page
    // budget — q54's pair distinct then throws AGGREGATE_OUT_OF_MEMORY
    // instead of spilling (measured). Letting storage yield to disk is
    // exactly what a loaded executor does.
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.memory.fraction", frac)
      .config("spark.memory.storageFraction", if (record) "0.5" else "0.1")
      // starved mode shrinks the page unit too: the OOM floor is the
      // MINIMUM PAGE a consumer must acquire before it can spill —
      // a stage chaining several consumers per task (the s36 serving
      // build: agg + window sort + broadcast build) exceeds the
      // default page budget at 8 tasks even though every consumer
      // spills fine once it holds a page. Spark sizes pages down
      // automatically on small executors; this pins the same
      // behavior under the artificially starved pool.
      .config("spark.buffer.pageSize", if (record) "64m" else "2m")
      .appName(if (record) "spill-record" else "spill-stress").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 100× sf0.1 documents for the three doc-aggregation queries
    val docsDir = "target/tmp/sf10-docs"
    if (!new java.io.File(s"$docsDir/documents.parquet").isDirectory) {
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
        .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    }
    // 10× full-table derivative for everything else (shared with
    // Sf1Full — q54/q59 need the shifted orders/lineitem too)
    val sf1Dir = "target/tmp/sf1-derived-full"
    if (!new java.io.File(s"$sf1Dir/lineitem.parquet").isDirectory) {
      Sf1Stress.buildSf1(spark, "/root/testdata/sf0.1", sf1Dir)
      Sf1Full.buildRest(spark, "/root/testdata/sf0.1", sf1Dir)
    }
    val dirs = Map("docs100" -> docsDir, "sf1" -> sf1Dir)
    // the stored graph the tail-only rows re-enter: built UNSTARVED in
    // RECORD mode (the whole point — the build's spill must not
    // confound the tails'), required present in starved mode
    if (record) {
      if (!new java.io.File(s"$PrebuiltIdx/nodes").isDirectory) {
        graft.ops.Similarity.graphBootstrapStored(spark, sf1Dir, PrebuiltIdx, 8)
        ()
      }
    } else require(new java.io.File(s"$PrebuiltIdx/nodes").isDirectory,
      s"no $PrebuiltIdx — run the RECORD pass first (it prebuilds the stored graph)")
    // tail-only rows dispatch outside the registry: the registered
    // gates own their bootstrap; these re-enter the prebuilt state
    def runQuery(q: String, corpus: String): Long = {
      val dir = dirs(corpus)
      q match {
        case "s33_ingest_tail" =>
          withIdxCopy(idx => graft.ops.Similarity.s33WithDir(spark, dir, idx).count())
        case "s34_delete_tail" =>
          withIdxCopy(idx => graft.ops.Similarity.s34WithDir(spark, dir, idx).count())
        case _ => SparkEntry.queries(q)(spark, dir).count()
      }
    }

    val mem = new AtomicLong(0L)
    val disk = new AtomicLong(0L)
    val ends = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        Option(t.taskMetrics).foreach { m =>
          mem.addAndGet(m.memoryBytesSpilled)
          disk.addAndGet(m.diskBytesSpilled)
        }
        ends.incrementAndGet()
        ()
      }
    })
    // poll until the async listener bus has drained: counters stable
    // for StableMs (capped) — between sequential queries nothing else
    // produces task ends, so stability == drained
    def settle(): Unit = {
      val t0 = System.nanoTime()
      var last = (mem.get(), disk.get(), ends.get())
      var stableSince = System.nanoTime()
      while ((System.nanoTime() - t0) / 1e6 < PollCapMs &&
          (System.nanoTime() - stableSince) / 1e6 < StableMs) {
        Thread.sleep(100)
        val now = (mem.get(), disk.get(), ends.get())
        if (now != last) { last = now; stableSince = System.nanoTime() }
      }
    }

    val expected: Map[String, Long] =
      if (record) Map.empty
      else {
        val f = new java.io.File(ExpectedPath)
        require(f.isFile,
          s"no $ExpectedPath — run the RECORD pass first (SPARK_GRAFT_SPILL_RECORD=1)")
        val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toLong).toMap
      }

    val results = Queries.map { case (q, corpus) =>
      mem.set(0L); disk.set(0L); ends.set(0L)
      val t0 = System.nanoTime()
      val rows = runQuery(q, corpus)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      settle()
      val (mS, dS) = (mem.get(), disk.get())
      if (!record) {
        val want = expected.getOrElse(q,
          sys.error(s"$q missing from $ExpectedPath — re-run the RECORD pass"))
        require(rows == want,
          s"$q under pressure returned $rows rows; unstarved run recorded $want")
      }
      println(f"[spill-stress] $q%-22s rows=$rows%d  ${dt}%6.2fs  spilled mem=${mS / 1048576}%d MiB disk=${dS / 1048576}%d MiB")
      (q, corpus, rows, dt, mS, dS)
    }
    spark.stop()
    if (record) {
      val json = results.map { case (q, _, rows, _, _, _) => s"""  "$q": $rows""" }
        .mkString("{\n", ",\n", "\n}\n")
      new java.io.File("target/tmp").mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(ExpectedPath), json.getBytes("UTF-8"))
      println(s"[spill-stress] RECORD mode: wrote $ExpectedPath (no starvation applied)")
    } else {
      val spilled = results.count(_._6 > 0)
      val json = results.map { case (q, corpus, rows, dt, mS, dS) =>
        val status = if (dS > 0) "spilled" else "fits_in_pool"
        f"""  "$q": {"rows": $rows, "rows_match_unstarved": true, "corpus": "$corpus", "sec": $dt%.2f, "mem_spill_bytes": $mS, "disk_spill_bytes": $dS, "status": "$status"}"""
      }.mkString("{\n", ",\n",
        s""",\n  "heap_mib": $heap, "memory_fraction": $frac, "queries_spilled": $spilled, "errors": 0\n}\n""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("SPILLCHECK.json"), json.getBytes("UTF-8"))
      println(s"[spill-stress] wrote SPILLCHECK.json ($spilled/${results.size} queries spilled, heap ${heap} MiB, fraction $frac)")
      require(spilled > 0,
        "nothing spilled - lower the pool; this run proves nothing about the spill path")
    }
  }
}
