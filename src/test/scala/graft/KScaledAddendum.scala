package graft

/** Spot 10× measurements for graph ops added after the round's full
  * Sf1Stress run, at PRODUCTION shape (the s19/d11 knob: k cells ∝
  * corpus so per-cell population — and so the in-gate graph-build
  * cost — stays constant). s33 inherits s32's scale story (identical
  * semantics plus storage/stream machinery whose cost is
  * batch-bounded), so the composed s32 is the measured unit. Writes
  * BENCH_sf1_spot_addendum.json; the round's main BENCH_sf1_spot.json
  * artifact is left untouched.
  *
  * Run: SPARK_DRIVER_MEM=32g sbt "Test/runMain graft.KScaledAddendum"
  */
object KScaledAddendum {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .appName("k-scaled-addendum").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "target/tmp/sf1-derived"
    if (!new java.io.File(s"$sf1/embeddings.parquet").isDirectory)
      Sf1Stress.buildSf1(spark, sf01, sf1)
    def timed3(f: => Long): (Double, Double, Long) = {
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      (ts.head, ts.min, rows)
    }
    import graft.ops.Similarity
    def run(dir: String, k: Int, body: (org.apache.spark.sql.DataFrame,
        Array[(Long, Seq[Double], Long)]) => org.apache.spark.sql.DataFrame) =
      timed3 {
        val base = Similarity.quantized(spark, dir)
        body(base, Similarity.collectCents(
          Similarity.trainCodebook(base, iters = 2, k = k))).count()
      }
    val cases: Seq[(String, (org.apache.spark.sql.DataFrame,
        Array[(Long, Seq[Double], Long)]) => org.apache.spark.sql.DataFrame)] = Seq(
      "s31_graph_refine_k_scaled" -> (Similarity.s31From _),
      "s32_graph_freshness_k_scaled" -> (Similarity.s32From _))
    // s33 through the storage layer: a fresh index dir per rep (the
    // bootstrap IS part of the unit — stream machinery and searches
    // re-enter stored state), k scaled through the persisted codebook
    def runS33(dir: String, k: Int) = timed3 {
      val idx = java.nio.file.Files.createTempDirectory("graft-s33-k-")
      try Similarity.s33WithDir(spark, dir, idx.toString, k).count()
      finally graft.Fs.deleteRecursively(idx)
    }
    val results = cases.map { case (name, body) =>
      val (f01, t01, n01) = run(sf01, 8, body)
      val (f1, t1, n1) = run(sf1, 80, body)
      println(f"[k-addendum] $name%-28s sf0.1 $t01%7.2fs (first $f01%.2fs)   sf1 $t1%7.2fs (first $f1%.2fs)   ratio ${t1 / t01}%5.2fx")
      (name, f01, t01, n01, f1, t1, n1)
    } :+ {
      val (f01, t01, n01) = runS33(sf01, 8)
      val (f1, t1, n1) = runS33(sf1, 80)
      println(f"[k-addendum] s33_graph_stream_k_scaled    sf0.1 $t01%7.2fs (first $f01%.2fs)   sf1 $t1%7.2fs (first $f1%.2fs)   ratio ${t1 / t01}%5.2fx")
      ("s33_graph_stream_k_scaled", f01, t01, n01, f1, t1, n1)
    }
    val json = results.map { case (q, f01, t01, n01, f1, t1, n1) =>
      f"""  "$q": {"sf0_1_sec": $t01%.3f, "sf0_1_first_sec": $f01%.3f, "sf0_1_rows": $n01, "sf1_sec": $t1%.3f, "sf1_first_sec": $f1%.3f, "sf1_rows": $n1, "ratio": ${t1 / t01}%.2f}"""
    }.mkString("{\n", ",\n",
      s""",\n  "estimator": "min_of_3; *_first_sec = rep 1 (cold/build)", "scale_factor_ratio": 10, "errors": 0\n}\n""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_sf1_spot_addendum.json"), json.getBytes("UTF-8"))
    spark.stop()
    println("[k-addendum] wrote BENCH_sf1_spot_addendum.json")
  }
}
