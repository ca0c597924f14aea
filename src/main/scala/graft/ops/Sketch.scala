package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Sketch-based approximate aggregates — the cardinality-estimation
  * member of the pipeline family. `approx_count_distinct` (HLL++) is
  * the built-in answer, but its hash is engine-internal: no external
  * system can reproduce the estimate, so it can't sit under a
  * cross-engine correctness gate. The KMV bottom-k sketch
  * ([[graft.functions.KmvAgg]]) trades that away: a shared 48-bit
  * hash (hex digits of md5 — both engines produce identical md5 hex)
  * plus exact integer estimation arithmetic make the ESTIMATE itself
  * oracle-checkable bit-for-bit.
  *
  * Scale shape: one hash aggregation; each (group, partition) partial
  * ships ≤ k longs, so the shuffle is O(groups × k) regardless of
  * input rows — same topology as a plain count(*) rollup.
  */
object Sketch {

  /** Shared Spark-SQL/DuckDB fragment: 48-bit integer from the first
    * 12 hex chars of md5 of `e` — uniform on [0, 2^48), identical in
    * both engines (md5 hex + ascii arithmetic only; both parse the
    * int-overflowing coefficient literals as BIGINT).
    */
  private def h48Sql(e: String): String = {
    def hexv(k: Int) =
      s"CAST(CASE WHEN ascii(substr(md5($e),$k,1)) >= 97 " +
        s"THEN ascii(substr(md5($e),$k,1)) - 87 " +
        s"ELSE ascii(substr(md5($e),$k,1)) - 48 END AS BIGINT)"
    (1 to 12).map(k => s"(${hexv(k)}) * ${1L << (4 * (12 - k))}")
      .mkString("(", " + ", ")")
  }

  // ---- sk1: KMV distinct-count sketch -------------------------------------

  /** Distinct `l_partkey` per return flag, three ways: exact
    * (countDistinct — the yardstick), the KMV sketch summary
    * (n_kept, kth minimum), and the KMV estimate
    * `(k−1)·2^48 DIV kth` — integer DIV, so the oracle's `//`
    * reproduces it exactly. At 100 TB the exact column is the
    * expensive one (distinct shuffles the full key set); the sketch
    * column ships 64 longs per (group, partition) and would be the
    * only one a real pipeline keeps.
    */
  private def sk1KmvDistinct(s: SparkSession, d: String): DataFrame = {
    val kmv = udaf(graft.functions.KmvAgg)
    Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        expr(h48Sql("CAST(l_partkey AS STRING)")).as("h"),
        col("l_partkey"))
      .groupBy("grp")
      .agg(
        countDistinct(col("l_partkey")).as("n_exact"),
        kmv(col("h")).as("kmv"))
      .select(
        col("grp"), col("n_exact"),
        col("kmv._1").as("n_kept"),
        col("kmv._2").as("kth"),
        expr("CASE WHEN kmv._1 < 64 THEN CAST(kmv._1 AS BIGINT) " +
          "ELSE 17732923532771328 DIV kmv._2 END").as("est"))
      .orderBy("grp")
  }

  private val sk1Oracle: String = {
    val h = h48Sql("CAST(l_partkey AS VARCHAR)")
    s"""WITH hv AS (
       |  SELECT DISTINCT l_returnflag AS grp, $h AS h FROM lineitem),
       |r AS (
       |  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn,
       |         count(*) OVER (PARTITION BY grp) AS n_h
       |  FROM hv),
       |sk AS (
       |  SELECT grp,
       |         CAST(least(max(n_h), 64) AS INT) AS n_kept,
       |         CAST(coalesce(max(CASE WHEN rn = 64 THEN h END), 0) AS BIGINT) AS kth
       |  FROM r GROUP BY grp)
       |SELECT sk.grp, e.n_exact, sk.n_kept, sk.kth,
       |       CASE WHEN sk.n_kept < 64 THEN CAST(sk.n_kept AS BIGINT)
       |            ELSE 17732923532771328 // sk.kth END AS est
       |FROM sk JOIN (
       |  SELECT l_returnflag AS grp, count(DISTINCT l_partkey) AS n_exact
       |  FROM lineitem GROUP BY 1) e ON sk.grp = e.grp
       |ORDER BY sk.grp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk1_kmv_distinct" -> (sk1KmvDistinct _)
  )

  val oracles: Map[String, String] = Map(
    "sk1_kmv_distinct" -> sk1Oracle
  )
}
