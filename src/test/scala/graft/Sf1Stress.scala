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

    def time(name: String, dir: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (dt, n)
    }
    // d11 runs with its documented scale knob: k clusters ∝ corpus
    // size (8 at sf0.1, 80 at the 10× derivative), holding expected
    // cell size — and so the per-cell pairwise cost — constant. The
    // gate query pins k=8; this is the same plan at production shape.
    def timeD11(dir: String, k: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val base = graft.ops.Dedup.d11Base(spark, dir)
      val assigned = graft.ops.Similarity
        .assignCells(base, graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))
      val n = graft.ops.Dedup.d11From(assigned).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (dt, n)
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
