package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** FULL-registry sf1 stress: every query in [[SparkEntry.queries]]
  * timed at sf0.1 and at a derived 10× corpus, closing the "scales in
  * the 41-op spot table ⇒ scales everywhere" inference gap — the
  * relational/sketch/CDC-gate majority gets a measured 10× ratio, not
  * an argued one.
  *
  * The derivative extends [[Sf1Stress.buildSf1]] (documents /
  * embeddings / events / customer) with the remaining TPC-H-ish
  * tables. Keys are 0-based contiguous in the fixtures (verified:
  * count == max+1 for every keyed table), so shifting each copy by
  * the parent table's ROW COUNT is collision-free and keeps every
  * foreign-key pair consistent (orders.o_custkey shifts by the
  * customer count, lineitem.l_orderkey by the orders count, …) — the
  * derived corpus joins like a real sf1, it isn't ten disconnected
  * islands keyed into each other's rows.
  *
  * Estimator: min-of-3 per (query, sf) — the Sf1Stress noise
  * rationale; first rep reported alongside (prices the one-time state
  * build of the GateTmp CDC gates). d11/s19 run AS REGISTERED
  * (k pinned at 8): their production shape scales k with the corpus
  * and is separately measured in BENCH_sf1_spot.json's `_k_scaled`
  * entries; the pinned ratio here documents what the knob buys.
  *
  * Run: SPARK_DRIVER_MEM=32g sbt "Test/runMain graft.Sf1Full"
  */
object Sf1Full {

  def buildRest(spark: SparkSession, from: String, to: String): Unit = {
    val copies = spark.range(0, 10).select(col("id").as("copy"))
    def count(t: String): Long = spark.read.parquet(s"$from/$t.parquet").count()
    val (nCust, nOrd, nPart, nSupp) =
      (count("customer"), count("orders"), count("part"), count("supplier"))
    def rep(table: String, shifts: Map[String, Long]): Unit = {
      val df = spark.read.parquet(s"$from/$table.parquet")
      val cols = df.columns.map { c =>
        shifts.get(c) match {
          case Some(n) => (col(c) + col("copy") * n).as(c)
          case None => col(c)
        }
      }
      df.crossJoin(copies).select(cols.toSeq: _*)
        .repartition(32).write.mode("overwrite").parquet(s"$to/$table.parquet")
    }
    rep("orders", Map("o_orderkey" -> nOrd, "o_custkey" -> nCust))
    rep("lineitem",
      Map("l_orderkey" -> nOrd, "l_partkey" -> nPart, "l_suppkey" -> nSupp))
    rep("part", Map("p_partkey" -> nPart))
    rep("supplier", Map("s_suppkey" -> nSupp))
    // dimensions stay fixed: nation/region are constant-size at any sf
    for (t <- Seq("nation", "region"))
      spark.read.parquet(s"$from/$t.parquet")
        .write.mode("overwrite").parquet(s"$to/$t.parquet")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .appName("sf1-full").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "target/tmp/sf1-derived-full"
    Sf1Stress.buildSf1(spark, sf01, sf1)
    buildRest(spark, sf01, sf1)

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
    // optional prefix filter (the BenchOne convention): a filtered run
    // spot-measures late additions without overwriting the full-run
    // artifact below
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      if (args.isEmpty) all
      else all.filter(n => args.exists(n.startsWith))
    }
    var errors = 0
    val results = names.flatMap { q =>
      try {
        val (f01, t01, n01) = timed3(SparkEntry.queries(q)(spark, sf01).count())
        val (f1, t1, n1) = timed3(SparkEntry.queries(q)(spark, sf1).count())
        println(f"[sf1-full] $q%-22s sf0.1 $t01%7.2fs   sf1 $t1%7.2fs   ratio ${t1 / t01}%5.2fx ($n1%d rows)")
        Some(q -> ((f01, t01, n01, f1, t1, n1)))
      } catch {
        case e: Exception =>
          errors += 1
          println(s"[sf1-full] ERROR $q: ${e.toString.take(300)}")
          None
      }
    }
    def row(q: String, r: (Double, Double, Long, Double, Double, Long)): String = {
      val (f01, t01, n01, f1, t1, n1) = r
      f""""$q": {"sf0_1_sec": $t01%.3f, "sf0_1_first_sec": $f01%.3f, "sf0_1_rows": $n01, "sf1_sec": $t1%.3f, "sf1_first_sec": $f1%.3f, "sf1_rows": $n1, "ratio": ${t1 / t01}%.2f}"""
    }
    val path = java.nio.file.Paths.get("BENCH_sf1_full.json")
    if (args.isEmpty) {
      val json = results.map { case (q, r) => "  " + row(q, r) }
        .mkString("{\n", ",\n",
          s""",\n  "estimator": "min_of_3; *_first_sec = rep 1 (cold/build)", "scale_factor_ratio": 10, "n_queries": ${results.size}, "errors": $errors\n}\n""")
      java.nio.file.Files.write(path, json.getBytes("UTF-8"))
      println(s"[sf1-full] wrote BENCH_sf1_full.json (${results.size} queries, $errors errors)")
    } else {
      // filtered run MERGES into the standing artifact: each measured
      // query's line is replaced (or appended before the metadata
      // tail), n_queries recounted — late additions get sweep rows
      // without re-running the whole registry
      val lines = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
        .linesIterator.toBuffer
      results.foreach { case (q, r) =>
        val entry = s"""  ${row(q, r)},"""
        val at = lines.indexWhere(_.trim.startsWith(s""""$q":"""))
        if (at >= 0) lines(at) = entry
        else {
          val tailAt = lines.indexWhere(_.trim.startsWith("\"estimator\""))
          lines.insert(tailAt, entry)
        }
      }
      val n = lines.count(_.trim.matches(""""(cdc|[a-z])[a-z0-9_]*":.*\{.*"""))
      val merged = lines.map(l =>
        if (l.trim.startsWith("\"n_queries\"")) l // inline with estimator tail
        else l).mkString("\n")
        .replaceAll(""""n_queries": \d+""", s""""n_queries": $n""")
      java.nio.file.Files.write(path, (merged + "\n").getBytes("UTF-8"))
      println(s"[sf1-full] merged ${results.size} queries into BENCH_sf1_full.json ($errors errors, now $n entries)")
    }
    spark.stop()
  }
}
