package graft

/** Targeted timing of the d11 k-scaled training path (the one
  * super-linear item named by round 12): sf0.1 with k=8 vs the sf1
  * derivative with k=80 (SemDeDup's k ∝ corpus). Prints first/min of
  * 3 and the ratio — the full picture lands in BENCH_sf1_spot.json
  * via [[Sf1Stress]]; this exists to iterate on the assignment plan
  * without paying the 20-query sweep.
  *
  * Run: sbt "Test/runMain graft.D11KScaled"
  */
object D11KScaled {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .appName("d11-k-scaled").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "target/tmp/sf1-derived"
    if (!new java.io.File(s"$sf1/documents.parquet").exists())
      Sf1Stress.buildSf1(spark, sf01, sf1)
    def timeD11(dir: String, k: Int): (Double, Double, Long) = {
      var rows = 0L
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val base = graft.ops.Dedup.d11Base(spark, dir)
        val assigned = graft.ops.Similarity
          .assignCells(base, graft.ops.Similarity.trainCodebook(base, iters = 2, k = k))
        rows = graft.ops.Dedup.d11From(assigned).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      (ts.head, ts.min, rows)
    }
    val (f01, t01, n01) = timeD11(sf01, 8)
    val (f1, t1, n1) = timeD11(sf1, 80)
    println(f"[d11-k] sf0.1 k=8  first $f01%.2fs min $t01%.2fs rows $n01")
    println(f"[d11-k] sf1   k=80 first $f1%.2fs min $t1%.2fs rows $n1")
    println(f"[d11-k] ratio ${t1 / t01}%.2fx (target < 5x)")
    spark.stop()
  }
}
