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
  private val Queries =
    Seq("d10_span_dedup", "s9_pq_adc", "p4_full_pipeline",
      "d9_gram_coverage", "d4_simhash", "t34_ppl_buckets",
      "s11_ivf_search", "p5_retrieval")

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
      .select(Seq((col("vec_id") + col("copy") * nEmbs).as("vec_id")) ++
        embs.columns.filterNot(_ == "vec_id").map(col): _*)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$to/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .appName("sf1-stress").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = s"target/tmp/sf1-derived"
    buildSf1(spark, sf01, sf1)

    // Median of 3, like Bench: this host's documented noise spikes
    // (single queries randomly 3-6x for one run) would otherwise make
    // a single-shot ratio meaningless — one spiked run recorded
    // t34_ppl_buckets at 19x when its cold-JVM truth is ~3.6x.
    def med(f: => Long): (Double, Long) = {
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      (ts.sorted.apply(1), rows)
    }
    def time(name: String, dir: String): (Double, Long) =
      med(SparkEntry.queries(name)(spark, dir).count())
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
    def timeD11(dir: String, k: Int): (Double, Long) = med {
      val base = graft.ops.Dedup.d11Base(spark, dir)
      val assigned = graft.ops.Similarity
        .assignCells(base, graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))
      graft.ops.Dedup.d11From(assigned).count()
    }
    val results = Queries.map { q =>
      val (t01, n01) = time(q, sf01)
      val (t1, n1) = time(q, sf1)
      println(f"[sf1-stress] $q%-18s sf0.1 $t01%7.2fs ($n01%d rows)   sf1 $t1%7.2fs ($n1%d rows)   ratio ${t1 / t01}%5.2fx")
      q -> ((t01, n01, t1, n1))
    } :+ {
      val (t01, n01) = timeD11(sf01, 8)
      val (t1, n1) = timeD11(sf1, 80)
      println(f"[sf1-stress] d11_semantic_dedup (k 8 -> 80) sf0.1 $t01%7.2fs ($n01%d rows)   sf1 $t1%7.2fs ($n1%d rows)   ratio ${t1 / t01}%5.2fx")
      "d11_semantic_dedup_k_scaled" -> ((t01, n01, t1, n1))
    }
    val json = results.map { case (q, (t01, n01, t1, n1)) =>
      f"""  "$q": {"sf0_1_sec": $t01%.3f, "sf0_1_rows": $n01, "sf1_sec": $t1%.3f, "sf1_rows": $n1, "ratio": ${t1 / t01}%.2f}"""
    }.mkString("{\n", ",\n", s""",\n  "scale_factor_ratio": 10, "errors": 0\n}\n""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_sf1_spot.json"), json.getBytes("UTF-8"))
    spark.stop()
    println("[sf1-stress] wrote BENCH_sf1_spot.json")
  }
}
