package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cdc.ChangeFeed

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (plus the north-star LLM-pipeline
  * ops) registers here as a named query over the harness tables, with
  * a DuckDB-equivalent oracle in [[oracleSql]]. Column names/types are
  * aligned between both sides (the driver compare hashes values under
  * sorted column names).
  */
object SparkEntry {

  /** Flagship: materialize current state from the CDC event feed
    * (latest-wins per key, deletes drop the key) — the derived
    * capability that makes go-cdc's event model queryable.
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    cdcLatestState(spark, "/root/testdata/sf0.001")

  private def cdcLatestState(s: SparkSession, dir: String): DataFrame = {
    val feed = ChangeFeed.fromEvents(Tables.events(s, dir))
    ChangeFeed
      .latestState(feed)
      .select(
        col("pk").as("user_id"),
        col("pos").as("last_pos"),
        col("op"),
        col("value"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k")
      )
      .orderBy("user_id")
  }

  /** TPC-H Q1-style pricing summary: the partial-agg showcase — one
    * shuffle on two low-cardinality keys, everything else map-side.
    */
  private def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        graft.ops.Exact.dsum(col("l_quantity")).as("sum_qty"),
        graft.ops.Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        graft.ops.Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        graft.ops.Exact.davg(col("l_quantity")).as("avg_qty"),
        graft.ops.Exact.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_latest_state" -> (cdcLatestState _),
    "q1_pricing_summary" -> (q1PricingSummary _)
  ) ++ graft.ops.Relational.queries ++ graft.ops.Text.queries ++
    graft.ops.Dedup.queries ++ graft.ops.Similarity.queries ++
    graft.ops.Relational2.queries ++ graft.ops.Multimodal.queries ++
    graft.ops.Relational3.queries ++ graft.ops.Pipeline.queries ++
    graft.ops.Sketch.queries ++ graft.cdc.CdcQueries.queries

  /** Queries whose first call per data-dir pays a one-time durable
    * state build (see [[graft.cdc.CdcQueries.statefulGateQueries]]).
    * [[graft.Bench]]'s full-registry untimed warm-up at the target SF
    * subsumes prebuilding these; the set documents which queries that
    * warm-up is load-bearing for (and lets other harnesses prebuild
    * selectively).
    */
  def statefulQueries: Set[String] = graft.cdc.CdcQueries.statefulGateQueries

  def oracleSql: Map[String, String] = Map(
    "cdc_latest_state" -> graft.cdc.CdcQueries.latestStateOracle,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) ++ graft.ops.Relational.oracles ++ graft.ops.Text.oracles ++
    graft.ops.Dedup.oracles ++ graft.ops.Similarity.oracles ++
    graft.ops.Relational2.oracles ++ graft.ops.Multimodal.oracles ++
    graft.ops.Relational3.oracles ++ graft.ops.Pipeline.oracles ++
    graft.ops.Sketch.oracles ++ graft.cdc.CdcQueries.oracles
}
