package graft

/** Throwaway A/B harness: time registered queries under ad-hoc session
  * conf overrides (SPARK_GRAFT_CONF="k=v;k2=v2"). Never shipped —
  * measurement only, to size config effects before deciding anything.
  */
object ConfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val confs = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .split(";").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    var b = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    confs.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { case (k, v) => println(s"conf: $k=$v") }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).count() catch { case e: Throwable => println(s"$name warm failed: $e") }
      spark.catalog.clearCache()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"$name%-26s ${ts.map(t => f"$t%.2f").mkString(" ")}  min=${ts.min}%.2f")
    }
    spark.stop()
  }
}
