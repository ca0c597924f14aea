package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot sf1 spot-stress for the heaviest LLM-pipeline operators.
  *
  * The harness ships no sf1 testdata, so this builds an
  * sf1-EQUIVALENT derivative of sf0.1 under target/tmp: documents and
  * embeddings replicated 10× with shifted ids (doc/vec counts match
  * what the driver's sf1 would hold), and replicas carry a per-copy
  * suffix token so the corpus is a realistic near-duplicate field —
  * the adversarial shape for the dedup family — instead of pure
  * exact copies. Each query runs once at sf0.1 and once at the
  * derived sf1; the ratio documents how the plan scales (10× data on
  * fixed cores ⇒ ~10× time is linear scaling; a super-linear blowup
  * flags a partition-count or memory trap). Results go to
  * BENCH_sf1_spot.json.
  *
  * Run: SPARK_DRIVER_MEM=32g sbt "Test/runMain graft.Sf1Stress"
  */
object Sf1Stress {
  /** LLM-pipeline ops plus the CDC protocol path: latest-wins
    * materialization (scan shape), the binlog byte codec roundtrip
    * (row-local codec CPU at 1M events), and the full-protocol
    * capstone (snapshot bootstrap ∪ GTID-gated incremental). The
    * heavy CDC gates build their state once per (JVM, dir) — the
    * first rep pays the build, the min-of-3 prices the read path,
    * and both are reported.
    */
  private val Queries =
    Seq("d10_span_dedup", "s9_pq_adc", "p4_full_pipeline",
      "d9_gram_coverage", "d4_simhash", "t34_ppl_buckets",
      "s11_ivf_search", "p5_retrieval",
      "d12_stream_dedup", "p6_stream_ingest", "s12_ann_recall",
      // round-12 additions: fixed-size eval/delta sides against the
      // 10× corpus — the increment/eval cost story under scale
      "s13_recall_drift", "s14_knn_label", "p7_cdc_curation",
      "t35_boilerplate", "mm8_audio_dedup",
      // round-13: incremental df maintenance — fixed batch, 10× corpus
      "p8_df_maint",
      // round-13 second batch: exact-substring spans, filtered/hybrid
      // search (fixed query sample, 10× corpus), per-asset scene
      // segmentation, incremental index maintenance (fixed batch)
      "d13_substring_dedup", "s15_filtered_ann", "s16_hybrid_rrf",
      "mm9_scene_detect", "p9_index_maint", "s17_stream_index",
      "mm10_pair_curation",
      // round-13 third batch: binary-sketch scan+funnel, row-local
      // rule panel, chunk explode + per-doc windows, two-scan
      // chunked validation — each should track the scan linearly
      "s18_hamming", "t36_gopher_rules", "mm11_interleave", "p10_mm_shards",
      "cdc_chunk_checksum", "cdc_topk_maint", "t37_vocab_coverage",
      // round-13 fourth batch: gram funnels, iterative closure,
      // query-bounded sweep (s19 runs separately, k-scaled like d11)
      "d14_bloom_decontam", "t38_split_leakage", "q52_hierarchy",
      "s20_nprobe_sweep", "mm12_stream_image",
      "cdc_latest_state", "cdc_binlog_replay", "cdc_full_protocol",
      // round-17: the trained classifier — R bounded passes over the
      // pinned linear-built feature frame; must track the scan
      "t51_quality_clf")

  def buildSf1(spark: SparkSession, from: String, to: String): Unit = {
    val docs = spark.read.parquet(s"$from/documents.parquet")
    val nDocs = docs.count()
    val embs = spark.read.parquet(s"$from/embeddings.parquet")
    val nEmbs = embs.count()
    val copies = spark.range(0, 10).select(col("id").as("copy"))
    docs.crossJoin(copies)
      .select(
        (col("doc_id") + col("copy") * nDocs).as("doc_id"),
        // copy 0 keeps the original text; replicas append a suffix
        // token -> near-duplicates, not byte-identical clones
        when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" shard"), col("copy"))).as("text"),
        col("lang"), col("source"),
        (length(col("text")) + when(col("copy") === 0, 0).otherwise(7)).as("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$to/documents.parquet")
    embs.crossJoin(copies)
      .select(Seq((col("vec_id") + col("copy") * nEmbs).as("vec_id"),
        // replicas are coordinate-ROTATED (copy k reads dims shifted
        // by 7k mod 64) — norm- and distribution-preserving, copy 0
        // keeps the original bits, and the ten copies of a vector are
        // mutually decorrelated: ten realistic shards, which is what
        // a 10× embedding corpus looks like. EXACT (or jittered)
        // clones instead degenerate every derived kNN graph into
        // disjoint same-vector 10-cliques — 9 near-copies saturate a
        // degree-8 adjacency at cos ≈ 1 — so graph walks can never
        // leave their entry cliques (measured: visited sets collapse
        // to entry + copies and the filtered serving gates return
        // zero rows). The near-duplicate-field realism the dedup
        // family needs stays on the DOCUMENTS side (suffix tokens).
        expr("transform(sequence(0, 63), i -> " +
          "element_at(embedding, CAST((i + copy * 7) % 64 AS INT) + 1))")
          .as("embedding")) ++
        embs.columns.filterNot(c => c == "vec_id" || c == "embedding")
          .map(col): _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$to/embeddings.parquet")
    // events: 10× the change feed over the SAME key space — each copy
    // appends after the last (event_id is the feed position), so keys
    // see 10× the churn. ts rides through in whatever physical layout
    // the fixture generation shipped (nanos-long or timestamp[us] —
    // FIXTURES.md); the derivative re-writes the same type and
    // Tables.normalizeEventsTs branches on it at read time.
    val events = spark.read.parquet(s"$from/events.parquet")
    val nEvents = events.count()
    events.crossJoin(copies)
      .select(Seq((col("event_id") + col("copy") * nEvents).as("event_id")) ++
        events.columns.filterNot(_ == "event_id").map(col): _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$to/events.parquet")
    // customer: 10× under shifted contiguous keys — the chunked
    // checksum validation scans this; its planted drift classes are
    // modular in the key, so they recur across the derived range.
    val cust = spark.read.parquet(s"$from/customer.parquet")
    val nCust = cust.count()
    cust.crossJoin(copies)
      .select(Seq((col("c_custkey") + col("copy") * nCust).as("c_custkey")) ++
        cust.columns.filterNot(_ == "c_custkey").map(col): _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$to/customer.parquet")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .appName("sf1-stress").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = s"target/tmp/sf1-derived"
    buildSf1(spark, sf01, sf1)

    // MIN of 3 reps: this host's documented noise spikes (single
    // queries randomly 3-6x for one run) poison even medians — one
    // run recorded a d4 median of 8.6 s whose min was 1.5 s, and a
    // t34 single-shot of 19x whose cold-JVM truth is ~3.6x. Noise
    // only ever ADDS time, so for a SCALING harness (ratios of plan
    // cost, not absolute throughput) the min is the right estimator.
    // The first rep is reported alongside: for the gate-state CDC
    // queries it prices the one-time state build.
    def timed3(f: => Long): (Double, Double, Long) = {
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      // (first = cold/build cost, min = plan cost, rows)
      (ts.head, ts.min, rows)
    }
    def time(name: String, dir: String): (Double, Double, Long) =
      timed3(SparkEntry.queries(name)(spark, dir).count())
    // d11 runs with its documented scale knob: k clusters ∝ corpus
    // size (8 at sf0.1, 80 at the 10× derivative), holding expected
    // cell size — and so the per-cell pairwise cost — constant. The
    // gate query pins k=8; this is the same plan at production shape.
    // Measured decomposition at sf1 (see PLANS.md): the 2-pass Lloyd
    // TRAINING dominates the ratio (fresh codegen compile of the
    // k-wide assignment expression per pass); the claims under test
    // are flat — final assignment 0.37 s, pairwise phase 0.21 s.
    // Production trains once per index lifetime (s10's standing
    // codebook), so the training constant amortizes away.
    // s35's off-shape rank-1 outcome per leg (None = not run): the
    // relaxed burst-copy check's machine-checkable trace — lands in
    // the JSON footer so an off-shape recall regression is a recorded
    // boolean, not a stdout line nothing collects
    var s35Burst01: Option[Boolean] = None
    var s35Burst1: Option[Boolean] = None
    // s43's sweep tables per leg (hops, beam, hits, cands): with s40's
    // this answers WHICH axis recovers recall cheaper at 10×
    var s43SweepLast: Array[(Int, Int, Long, Long)] = Array.empty
    var s43Sweep01: Array[(Int, Int, Long, Long)] = Array.empty
    var s43Sweep1: Array[(Int, Int, Long, Long)] = Array.empty
    // s40's sweep tables per leg (beam, nprobe, hits, cands): the 10×
    // table is the knob-recovery evidence and lands in the JSON footer
    var s40SweepLast: Array[(Int, Int, Long, Long)] = Array.empty
    var s40Sweep01: Array[(Int, Int, Long, Long)] = Array.empty
    var s40Sweep1: Array[(Int, Int, Long, Long)] = Array.empty
    // s46's choice row per scale (family, beam, nprobe, hops, fetch_k,
    // hits, cands, refines): does the winning family hold at 10×?
    var s46ChoiceLast: Option[(String, Int, Int, Int, Int, Long, Long, Long)] = None
    var s46Choice01: Option[(String, Int, Int, Int, Int, Long, Long, Long)] = None
    var s46Choice1: Option[(String, Int, Int, Int, Int, Long, Long, Long)] = None
    def timeD11(dir: String, k: Int): (Double, Double, Long) = timed3 {
      val base = graft.ops.Dedup.d11Base(spark, dir)
      val assigned = graft.ops.Similarity
        .assignCells(base, graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))
      graft.ops.Dedup.d11From(assigned).count()
    }
    val results = Queries.map { q =>
      val (f01, t01, n01) = time(q, sf01)
      val (f1, t1, n1) = time(q, sf1)
      println(f"[sf1-stress] $q%-18s sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      q -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      val (f01, t01, n01) = timeD11(sf01, 8)
      val (f1, t1, n1) = timeD11(sf1, 80)
      println(f"[sf1-stress] d11_semantic_dedup (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "d11_semantic_dedup_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // the neighbor graph at production shape: k ∝ corpus keeps the
      // per-cell candidate population — each vector meets ~2·N/k
      // peers — constant, so graph cost stays linear in the corpus
      def timeS19(dir: String, k: Int) = timed3 {
        val base = graft.ops.Similarity.quantized(spark, dir)
        graft.ops.Similarity.s19From(base, graft.ops.Similarity
          .collectCents(graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))).count()
      }
      val (f01, t01, n01) = timeS19(sf01, 8)
      val (f1, t1, n1) = timeS19(sf1, 80)
      println(f"[sf1-stress] s19_knn_graph (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s19_knn_graph_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // graph SEARCH at production shape: the registered gate's cost
      // is ~all graph BUILD (s19's knob — k ∝ corpus keeps it
      // linear); the walk itself reads hops × beam × degree edges
      // per query, independent of corpus size
      def timeS28(dir: String, k: Int) = timed3 {
        val base = graft.ops.Similarity.quantized(spark, dir)
        graft.ops.Similarity.s28From(base, graft.ops.Similarity
          .collectCents(graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))).count()
      }
      val (f01, t01, n01) = timeS28(sf01, 8)
      val (f1, t1, n1) = timeS28(sf1, 80)
      println(f"[sf1-stress] s28_graph_search (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s28_graph_search_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // graph INSERT at production shape: the standing-graph build
      // carries the s19 knob; the maintenance itself is per-insert
      // constant (walk) + batch-bounded repair, so with the batch
      // growing 10x alongside the corpus the whole op should stay
      // ~linear
      def timeS29(dir: String, k: Int) = timed3 {
        val base = graft.ops.Similarity.quantized(spark, dir)
        graft.ops.Similarity.s29From(base, graft.ops.Similarity
          .collectCents(graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))).count()
      }
      val (f01, t01, n01) = timeS29(sf01, 8)
      val (f1, t1, n1) = timeS29(sf1, 80)
      println(f"[sf1-stress] s29_graph_insert (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s29_graph_insert_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // graph DELETE at production shape: tombstone set and repairs
      // grow 10x with the corpus, each repair degree-bounded
      def timeS30(dir: String, k: Int) = timed3 {
        val base = graft.ops.Similarity.quantized(spark, dir)
        graft.ops.Similarity.s30From(base, graft.ops.Similarity
          .collectCents(graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))).count()
      }
      val (f01, t01, n01) = timeS30(sf01, 8)
      val (f1, t1, n1) = timeS30(sf1, 80)
      println(f"[sf1-stress] s30_graph_delete (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s30_graph_delete_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // refinement at production shape: the descent round's local join
      // is degree^2-bounded per node, linear in the corpus at fixed k
      def timeS31(dir: String, k: Int) = timed3 {
        val base = graft.ops.Similarity.quantized(spark, dir)
        graft.ops.Similarity.s31From(base, graft.ops.Similarity
          .collectCents(graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))).count()
      }
      val (f01, t01, n01) = timeS31(sf01, 8)
      val (f1, t1, n1) = timeS31(sf1, 80)
      println(f"[sf1-stress] s31_graph_refine (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s31_graph_refine_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // the freshness capstone at production shape: the build carries
      // the knob; walks and maintenance are corpus-independent, so the
      // ratio prices the build + fixed walk-scheduling overhead
      def timeS32(dir: String, k: Int) = timed3 {
        val base = graft.ops.Similarity.quantized(spark, dir)
        graft.ops.Similarity.s32From(base, graft.ops.Similarity
          .collectCents(graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))).count()
      }
      val (f01, t01, n01) = timeS32(sf01, 8)
      val (f1, t1, n1) = timeS32(sf1, 80)
      println(f"[sf1-stress] s32_graph_freshness (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s32_graph_freshness_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // the stored streaming ingest at production shape: a fresh index
      // dir per rep (the bootstrap IS part of the unit — stream
      // machinery and searches re-enter stored state), k through the
      // persisted codebook
      def timeS33(dir: String, k: Int) = timed3 {
        val idx = java.nio.file.Files.createTempDirectory("graft-s33-k-")
        try graft.ops.Similarity.s33WithDir(spark, dir, idx.toString, k).count()
        finally graft.Fs.deleteRecursively(idx)
      }
      val (f01, t01, n01) = timeS33(sf01, 8)
      val (f1, t1, n1) = timeS33(sf1, 80)
      println(f"[sf1-stress] s33_graph_stream (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s33_graph_stream_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // stored DELETE + compaction at production shape: tombstones and
      // repairs grow 10x with the corpus (each repair degree-bounded);
      // fresh dir per rep, the bootstrap build carries the knob
      def timeS34(dir: String, k: Int) = timed3 {
        val idx = java.nio.file.Files.createTempDirectory("graft-s34-k-")
        try graft.ops.Similarity.s34WithDir(spark, dir, idx.toString, k).count()
        finally graft.Fs.deleteRecursively(idx)
      }
      val (f01, t01, n01) = timeS34(sf01, 8)
      val (f1, t1, n1) = timeS34(sf1, 80)
      println(f"[sf1-stress] s34_graph_delete_stored (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s34_graph_delete_stored_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // rebalance at production shape: the burst and the hot cell grow
      // 10x with the corpus; split seeds are control-plane and the
      // rewire pair join is subcell-bounded — the bound it restores
      // the burst outcome is the RETURN value of the run it describes
      // (not shared mutable state a parallel s35 could overwrite)
      def timeS35(dir: String, k: Int,
          rec: Option[Boolean] => Unit) = timed3 {
        val (df, flag) = graft.ops.Similarity.s35WithKFlag(spark, dir, k)
        rec(Some(flag))
        df.count()
      }
      val (f01, t01, n01) = timeS35(sf01, 8, s35Burst01 = _)
      val (f1, t1, n1) = timeS35(sf1, 80, s35Burst1 = _)
      println(f"[sf1-stress] s35_graph_rebalance (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s35_graph_rebalance_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // filtered search at production shape: ONE label-blind build
      // (the knob) serves both traversal policies; the walks' serving
      // cost is corpus-independent, the truth leg is the linear
      // evaluation scan
      def timeS36(dir: String, k: Int) = timed3 {
        val base = graft.ops.Similarity.labeledQuantized(spark, dir)
        graft.ops.Similarity.s36From(base, graft.ops.Similarity
          .collectCents(graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))).count()
      }
      val (f01, t01, n01) = timeS36(sf01, 8)
      val (f1, t1, n1) = timeS36(sf1, 80)
      println(f"[sf1-stress] s36_graph_filtered (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s36_graph_filtered_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // compressed traversal at production shape: build carries the
      // knob; hops read int8 codes (8x fewer bytes), the rerank fetch
      // is bounded by queries x QuantFetch — corpus-independent
      def timeS37(dir: String, k: Int) = timed3 {
        val base = graft.ops.Similarity.s37BaseOf(spark, dir)
        graft.ops.Similarity.s37From(base, graft.ops.Similarity
          .collectCents(graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))).count()
      }
      val (f01, t01, n01) = timeS37(sf01, 8)
      val (f1, t1, n1) = timeS37(sf1, 80)
      println(f"[sf1-stress] s37_graph_quant (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s37_graph_quant_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // the assembled serving path at production shape: one build
      // (the knob), then corpus-independent filtered+compressed
      // serving with the bounded rerank fetch
      def timeS38(dir: String, k: Int) = timed3 {
        val base = graft.ops.Similarity.serveBaseOf(spark, dir)
        graft.ops.Similarity.s38From(base, graft.ops.Similarity
          .collectCents(graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))).count()
      }
      val (f01, t01, n01) = timeS38(sf01, 8)
      val (f1, t1, n1) = timeS38(sf1, 80)
      println(f"[sf1-stress] s38_graph_serve (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s38_graph_serve_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // stored serving at production shape: fresh index dir per rep
      // (the bootstrap build carries the knob, s33/s34's stance), then
      // serve -> delete tail -> masked serve
      def timeS39(dir: String, k: Int) = timed3 {
        val idx = java.nio.file.Files.createTempDirectory("graft-s39-k-")
        try graft.ops.Similarity.s39WithDir(spark, dir, idx.toString, k).count()
        finally graft.Fs.deleteRecursively(idx)
      }
      val (f01, t01, n01) = timeS39(sf01, 8)
      val (f1, t1, n1) = timeS39(sf1, 80)
      println(f"[sf1-stress] s39_graph_serve_stored (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s39_graph_serve_stored_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // SERVE-ONLY at production shape: the stored index prebuilds
      // ONCE per dir OUTSIDE the timer, so this row prices exactly the
      // serving read path (pruned masked resolve + int8 walk + fetch +
      // rerank + the truth-evaluation scan) — the de-confounded number
      // the build-inclusive gate rows can't show
      def timeS39Serve(dir: String, k: Int) = {
        val idx = java.nio.file.Files.createTempDirectory("graft-s39-serve-")
        try {
          val cents = graft.ops.Similarity.graphBootstrapServe(
            spark, dir, idx.toString, k)
          val qs = graft.ops.Similarity.s39QueriesOf(spark, dir)
            .localCheckpoint(true)
          timed3(graft.ops.Similarity
            .s39ServePass(spark, idx.toString, qs, cents).count())
        } finally graft.Fs.deleteRecursively(idx)
      }
      val (f01, t01, n01) = timeS39Serve(sf01, 8)
      val (f1, t1, n1) = timeS39Serve(sf1, 80)
      println(f"[sf1-stress] s39_serve_only (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s39_serve_only_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // the serving sweep at production shape; the 10x sweep TABLE is
      // the deliverable (which beam/nprobe recovers registered recall
      // on the bigger corpus) — captured from the timed reps and
      // emitted into the JSON footer
      def runS40(dir: String, k: Int) = {
        val base = graft.ops.Similarity.serveBaseOf(spark, dir)
        graft.ops.Similarity.s40From(base, graft.ops.Similarity.collectCents(
          graft.ops.Similarity.trainCodebook(base, iters = 2, k = k)))
      }
      def timeS40(dir: String, k: Int) = timed3 {
        val rows = runS40(dir, k).collect()
        s40SweepLast = rows.map(r => (r.getInt(0), r.getInt(1),
          r.getLong(2), r.getLong(3)))
        rows.length.toLong
      }
      val (f01, t01, n01) = timeS40(sf01, 8)
      s40Sweep01 = s40SweepLast
      val (f1, t1, n1) = timeS40(sf1, 80)
      s40Sweep1 = s40SweepLast
      s40Sweep1.foreach { case (b, np, hits, cands) =>
        println(s"[sf1-stress] s40 sweep sf1: beam=$b nprobe=$np hits=$hits/25 cands=$cands")
      }
      println(f"[sf1-stress] s40_serve_sweep (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s40_serve_sweep_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // the hops × beam sweep at production shape — the second axis of
      // the knob-recovery table: does one more hop recover registered
      // recall cheaper than 4× beam on the 10× corpus?
      def runS43(dir: String, k: Int) = {
        val base = graft.ops.Similarity.serveBaseOf(spark, dir)
        graft.ops.Similarity.s43From(base, graft.ops.Similarity.collectCents(
          graft.ops.Similarity.trainCodebook(base, iters = 2, k = k)))
      }
      def timeS43(dir: String, k: Int) = timed3 {
        val rows = runS43(dir, k).collect()
        s43SweepLast = rows.map(r => (r.getInt(0), r.getInt(1),
          r.getLong(2), r.getLong(3)))
        rows.length.toLong
      }
      val (f01, t01, n01) = timeS43(sf01, 8)
      s43Sweep01 = s43SweepLast
      val (f1, t1, n1) = timeS43(sf1, 80)
      s43Sweep1 = s43SweepLast
      s43Sweep1.foreach { case (h, b, hits, cands) =>
        println(s"[sf1-stress] s43 sweep sf1: hops=$h beam=$b hits=$hits/25 cands=$cands")
      }
      println(f"[sf1-stress] s43_hops_sweep (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s43_hops_sweep_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // the stored IVF/PQ serving weld at production shape: fresh
      // index dir per rep (bootstrap carries the knob — the JVM seed
      // cache makes reps 2-3 pay the copy, rep 1 the build), then
      // serve -> versioned tombstones -> masked serve -> physical
      // fold -> served again
      def timeS41(dir: String, k: Int) = timed3 {
        val idx = java.nio.file.Files.createTempDirectory("graft-s41-k-")
        try graft.ops.Similarity.s41WithDir(spark, dir, idx.toString, k).count()
        finally graft.Fs.deleteRecursively(idx)
      }
      val (f01, t01, n01) = timeS41(sf01, 8)
      val (f1, t1, n1) = timeS41(sf1, 80)
      println(f"[sf1-stress] s41_ivf_serve_stored (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s41_ivf_serve_stored_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    } :+ {
      // the cross-family advisor at production shape: the deliverable
      // is the CHOICE at each scale — whether the winning family (and
      // its operating point) HOLDS when the corpus grows 10× at
      // production k. The choice row is captured from the timed reps
      // and emitted into the JSON footer.
      def timeS46(dir: String, k: Int) = timed3 {
        val rows = graft.ops.Similarity.s46From(spark, dir, k).collect()
        s46ChoiceLast = rows.headOption.map(r => (r.getString(0), r.getInt(1),
          r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))
        rows.length.toLong
      }
      val (f01, t01, n01) = timeS46(sf01, 8)
      s46Choice01 = s46ChoiceLast
      val (f1, t1, n1) = timeS46(sf1, 80)
      s46Choice1 = s46ChoiceLast
      (s46Choice01, s46Choice1) match {
        case (Some(c01), Some(c1)) => println(
          s"[sf1-stress] s46 choice sf0.1: $c01   sf1: $c1   " +
            (if (c01._1 == c1._1) "family HOLDS" else "family FLIPS"))
        case _ => ()
      }
      println(f"[sf1-stress] s46_index_advisor (k 8 -> 80) sf0.1 $t01%7.2fs (first $f01%.2fs, $n01%d rows)   sf1 $t1%7.2fs (first $f1%.2fs, $n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "s46_index_advisor_k_scaled" -> ((f01, t01, n01, f1, t1, n1))
    }
    def sweepJson(t: Array[(Int, Int, Long, Long)]): String =
      t.map { case (b, np, h, c) =>
        s"""{"beam": $b, "nprobe": $np, "hits": $h, "cands": $c}""" }
        .mkString("[", ", ", "]")
    def hopsJson(t: Array[(Int, Int, Long, Long)]): String =
      t.map { case (hp, b, h, c) =>
        s"""{"hops": $hp, "beam": $b, "hits": $h, "cands": $c}""" }
        .mkString("[", ", ", "]")
    def choiceJson(c: Option[(String, Int, Int, Int, Int, Long, Long, Long)]): String =
      c.map { case (fam, b, np, hp, f, h, ca, r) =>
        s"""{"family": "$fam", "beam": $b, "nprobe": $np, "hops": $hp, "fetch_k": $f, "hits": $h, "cands": $ca, "refines": $r}""" }
        .getOrElse("null")
    val json = results.map { case (q, (f01, t01, n01, f1, t1, n1)) =>
      f"""  "$q": {"sf0_1_sec": $t01%.3f, "sf0_1_first_sec": $f01%.3f, "sf0_1_rows": $n01, "sf1_sec": $t1%.3f, "sf1_first_sec": $f1%.3f, "sf1_rows": $n1, "ratio": ${t1 / t01}%.2f}"""
    }.mkString("{\n", ",\n",
      s""",\n  "s35_q0_burst_rank1": {"sf0_1": ${s35Burst01.map(_.toString).getOrElse("null")}, "sf1": ${s35Burst1.map(_.toString).getOrElse("null")}},""" +
      s"""\n  "s40_sweep": {"sf0_1": ${sweepJson(s40Sweep01)}, "sf1": ${sweepJson(s40Sweep1)}},""" +
      s"""\n  "s43_sweep": {"sf0_1": ${hopsJson(s43Sweep01)}, "sf1": ${hopsJson(s43Sweep1)}},""" +
      s"""\n  "s46_choice": {"sf0_1": ${choiceJson(s46Choice01)}, "sf1": ${choiceJson(s46Choice1)}},""" +
      s"""\n  "estimator": "min_of_3; *_first_sec = rep 1 (cold/build)", "scale_factor_ratio": 10, "errors": 0\n}\n""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_sf1_spot.json"), json.getBytes("UTF-8"))
    spark.stop()
    println("[sf1-stress] wrote BENCH_sf1_spot.json")
  }
}
