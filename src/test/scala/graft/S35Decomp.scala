package graft

import org.apache.spark.sql.functions._

/** Decompose s35's k-scaled ratio (the D11KScaled pattern): the gate
  * times as ~9× at 10× data, and the question is WHICH leg — the
  * stale-graph build premise (knnEdges over a corpus whose hot cell
  * holds the whole burst: quadratic in the pile BY CONSTRUCTION —
  * that pathology is the reason rebalance exists) or the rebalance
  * itself (detect → recursive split → subcell rewire → re-search,
  * which the recursive split is supposed to keep linear). This
  * harness times the build alone beside the full gate at both scales;
  * full − build ≈ the rebalance tail.
  *
  * Run: SPARK_DRIVER_MEM=32g sbt "Test/runMain graft.S35Decomp"
  */
object S35Decomp {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .appName("s35-decomp").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf1 = "target/tmp/sf1-derived"
    if (!new java.io.File(s"$sf1/embeddings.parquet").isDirectory)
      Sf1Stress.buildSf1(spark, "/root/testdata/sf0.1", sf1)
    def timed2(f: => Long): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }.min
    import graft.ops.Similarity
    for ((dir, k) <- Seq(("/root/testdata/sf0.1", 8), (sf1, 80))) {
      val build = timed2 {
        val base = Similarity.quantized(spark, dir)
        val cents = Similarity.collectCents(Similarity.trainCodebook(base, 2, k))
        val corpus = base.filter(col("vec_id") >= 5).select(col("vec_id"), col("q"))
          .unionByName(Similarity.s35Burst(spark, base))
        Similarity.knnEdges(corpus, cents, 8).count()
      }
      val full = timed2(Similarity.s35WithK(spark, dir, k).count())
      println(f"[s35-decomp] $dir%-28s k=$k%-3d build=$build%7.2fs  full=$full%7.2fs  rebalance_tail=${full - build}%7.2fs")
    }
    spark.stop()
  }
}
