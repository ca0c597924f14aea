package graft.ops

import org.apache.spark.sql.functions._

/** Round-21 plan-evidence dumper (attribution tool only, never in the
  * bench path): writes
  *  - the d19 single-pass tuning plan BEFORE its eager pin (the
  *    registered query's own explain is just a checkpoint scan), and
  *  - the EXECUTED q54 round-loop plan, where the per-round edge-side
  *    exchanges dedup to ReusedExchange (reuse is an AQE runtime
  *    property, invisible in an initial explain).
  * Run: Test/runMain graft.ops.R21Evidence <outDir>
  */
object R21Evidence {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r21")
    val spark = graft.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def write(name: String, txt: String): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, name), txt.getBytes("UTF-8"))
      println(s"[evidence] wrote $name")
    }
    locally {
      val (lazyOut, pinned) = Dedup.d19Lazy(spark, sf)
      write("d19_lsh_tuning_after_lazy.txt",
        lazyOut.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      pinned.foreach(_.unpersist(blocking = false))
    }
    locally {
      val pairs = Relational3.prPairs(spark, sf).localCheckpoint(true)
      val edges = Relational3.prEdges(pairs)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val edgesDeg = edges.join(deg, "src").localCheckpoint(false)
      var ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      (1 to 5).foreach { _ => ranks = Relational3.prRound(edgesDeg, ranks, 1000L) }
      ranks.collect()
      write("q54_round_loop_executed.txt",
        ranks.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    }
    spark.stop()
  }
}
