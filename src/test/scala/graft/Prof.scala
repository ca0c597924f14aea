package graft

import org.apache.spark.scheduler._

/** Job-level profiler for one registered query:
  * `Test/runMain graft.Prof <name> [reps]` runs the query (after one
  * untimed warm rep) and prints every Spark job with its wall time,
  * task count, summed task time, and the driver-side GAP since the
  * previous job ended — the number that separates "the cluster is
  * computing" from "the driver is planning/collecting/waiting".
  * Attribution tool only; nothing here ships in the bench.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val spark = GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name => profile(spark, sfDir, name, reps) }
    spark.stop()
  }

  private def profile(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, name: String, reps: Int): Unit = {
    val fn = SparkEntry.queries(name)

    case class JobRec(id: Int, desc: String, start: Long, var end: Long = 0L,
        var tasks: Int = 0, var taskMs: Long = 0L, var stages: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(j.jobId, JobRec(j.jobId, d, j.time, stages = j.stageIds.size))
        order.add(j.jobId)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val r = jobs.get(j.jobId); if (r != null) r.end = j.time
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val sid = t.stageId
        // attribute to the job containing this stage: approximate by
        // the most recent unfinished job — good enough for sequential
        // gates; concurrent jobs get merged into whichever is open
        val it = jobs.values().iterator()
        var best: JobRec = null
        while (it.hasNext) {
          val r = it.next()
          if (r.end == 0L || r.end >= t.taskInfo.finishTime) {
            if (best == null || r.start > best.start) best = r
          }
        }
        if (best != null) {
          best.synchronized {
            best.tasks += 1
            if (t.taskMetrics != null)
              best.taskMs += t.taskMetrics.executorRunTime
          }
        }
      }
    }
    // warm rep (uninstrumented): first-call costs out of the window
    try fn(spark, sfDir).count() catch { case e: Throwable => println(s"warm failed: $e") }
    spark.catalog.clearCache()
    (1 to reps).foreach { rep =>
      jobs.clear(); order.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      Thread.sleep(300) // let queued listener events drain
      var prevEnd = 0L
      var firstStart = 0L
      var jobMs = 0L; var gapMs = 0L
      println(f"== $name rep $rep wall=$wall%.2fs ==")
      val ids = order.toArray(Array.empty[Integer]).map(_.toInt)
      ids.foreach { id =>
        val r = jobs.get(id)
        if (r != null && r.end > 0) {
          if (firstStart == 0L) firstStart = r.start
          val gap = if (prevEnd == 0L) 0L else math.max(0L, r.start - prevEnd)
          val dur = r.end - r.start
          jobMs += dur; gapMs += gap
          println(f"job ${r.id}%3d  dur=${dur}%5dms gap=${gap}%5dms stages=${r.stages}%2d tasks=${r.tasks}%4d taskSum=${r.taskMs}%6dms  ${r.desc.take(70)}")
          prevEnd = math.max(prevEnd, r.end)
        }
      }
      println(f"== jobs=${ids.length} jobMs=${jobMs}ms gapMs=${gapMs}ms wall=$wall%.2fs (pre-first-job + tail = ${math.round(wall * 1000) - jobMs - gapMs}ms) ==")
    }
  }
}
