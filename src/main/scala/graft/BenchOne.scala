package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing harness: `runMain graft.BenchOne q3 d2 ...`
  * runs each named query N times at SPARK_GRAFT_SF_DIR and prints every
  * rep's wall time — used to separate real plan cost from this host's
  * documented noise spikes before believing any BENCH_r number.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq
    val all = SparkEntry.queries
    names.foreach { arg =>
      val matched = all.keys.filter(k => k == arg || k.startsWith(arg + "_") || k.startsWith(arg))
      matched.toSeq.sorted.foreach { name =>
        val fn = all(name)
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          dt
        }
        println(f"$name%-24s ${ts.map(t => f"$t%.2f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
