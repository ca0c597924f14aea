package graft.ops

// One-off: re-measure the s41 k-scaled pair on a quiet host (the full
// Sf1Stress run timed its sf0.1 leg right after the s40 sweep's 100 s
// build leg — host pressure inverted the ratio).
object S41Spot {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).appName("s41-spot").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeS41(dir: String, k: Int): (Double, Double) = {
      val ts = (1 to 3).map { _ =>
        val idx = java.nio.file.Files.createTempDirectory("graft-s41-spot-")
        val t0 = System.nanoTime()
        try Similarity.s41WithDir(spark, dir, idx.toString, k).count()
        finally graft.Fs.deleteRecursively(idx)
        (System.nanoTime() - t0) / 1e9
      }
      (ts.head, ts.tail.min)
    }
    val (f01, t01) = timeS41("/root/testdata/sf0.1", 8)
    val (f1, t1) = timeS41("target/tmp/sf1-derived", 80)
    println(f"[s41-spot] sf0.1 $t01%.2fs (first $f01%.2fs)  sf1 $t1%.2fs (first $f1%.2fs)  ratio ${t1 / t01}%.2fx")
    spark.stop()
  }
}
