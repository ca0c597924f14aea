package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The relational query surface over the harness tables: scans,
  * filters/projections, joins (shuffle, broadcast, semi, anti),
  * aggregations (hash agg, distinct, rollup), window functions
  * (ranking, lag, running frames), sort/limit/top-k, set operations
  * and scalar string/date/JSON functions.
  *
  * Design notes for 100 TB:
  *   - filters/projections sit directly on the parquet scan so
  *     Catalyst pushes them into the reader (PushedFilters/ReadSchema);
  *   - small dimensions (region/nation/part/supplier) are broadcast
  *     explicitly — no shuffle of the fact table for those joins;
  *   - aggregations use partial (map-side) aggregation for free via
  *     groupBy; distinct counts shuffle once on the group key;
  *   - every query ends in a deterministic ORDER BY so results are
  *     stable under any partitioning.
  *
  * Float determinism: per-row scalar arithmetic is emitted raw
  * (identical IEEE ops -> identical bits in every engine); aggregated
  * money values go through [[Exact.dsum]]/[[Exact.davg]] (exact
  * DECIMAL(18,4) accumulation surfaced as double), so partial-agg
  * reordering cannot flip the oracle compare.
  */
object Relational {

  private val cutoff98 = lit("1998-09-02").cast("timestamp")

  /** Filter + projection straight over the scan — the predicate and
    * the 5-column ReadSchema both push into parquet.
    */
  private def q2FilterPushdown(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
          col("l_discount") > 0.05
      )
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        col("l_quantity")
      )
      .orderBy("l_orderkey", "l_linenumber")

  /** TPC-H Q3-style: segment filter -> two joins -> agg -> top 10. */
  private def q3TopOrders(s: SparkSession, d: String): DataFrame =
    Tables
      .customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  /** Semi join (EXISTS): order count per priority where some line has
    * quantity > 45. No distinct needed — semi join dedups by design.
    */
  private def q4SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .join(
        Tables.lineitem(s, d).filter(col("l_quantity") > 45).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"),
        "left_semi"
      )
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")

  /** Anti join (NOT EXISTS): customers with no order since 2001. */
  private def q5AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables
      .customer(s, d)
      .join(
        Tables
          .orders(s, d)
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"),
        "left_anti"
      )
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        min(col("c_custkey")).as("min_custkey"),
        Exact.dsum(col("c_acctbal")).as("sum_acctbal")
      )
      .orderBy("c_mktsegment")

  /** Broadcast the `part` dimension under the fact scan: the fact side
    * never shuffles — the plan that must survive a 100x scale-up.
    */
  private def q6BroadcastJoin(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines")
      )
      .orderBy("p_brand")

  /** Ranking window: top-3 orders per customer by price. */
  private def q7TopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables
      .orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** Analytic windows: running-sum frame, rank with ties, lag — all
    * over one (suppkey, shipdate, orderkey, linenumber) sort, so the
    * three functions share a single window exchange.
    */
  private def q8RunningWindow(s: SparkSession, d: String): DataFrame = {
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRank = Window.partitionBy(col("l_suppkey")).orderBy(col("l_shipdate"))
    Tables
      .lineitem(s, d)
      .select(
        col("l_suppkey"),
        col("l_orderkey"),
        col("l_linenumber"),
        sum(col("l_quantity")).over(frame).as("running_qty"),
        rank().over(wRank).as("day_rank"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty")
      )
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  /** Global top-k -> Spark's TakeOrderedAndProject (no full sort). */
  private def q9GlobalTopk(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_partkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  /** INTERSECT / EXCEPT / UNION in one result, tagged. */
  private def q10SetOps(s: SparkSession, d: String): DataFrame = {
    // INTERSECT ∪ EXCEPT partitions `rich` by membership in `buyers`,
    // so both branches collapse into ONE left join: distinct the buyer
    // keys (map-side partial dedup, one shuffle) and tag each rich
    // customer by match. The naive intersect/except pair scans orders
    // TWICE and shuffles both sides of each set op — 4 shuffles and 2
    // orders scans vs 2 and 1 here. No forced broadcast: the distinct
    // buyer set scales with the customer count, so AQE picks broadcast
    // only when the post-dedup size actually fits. `rich` needs no
    // distinct: c_custkey is the customer PK (set semantics preserved).
    val rich = Tables.customer(s, d).filter(col("c_acctbal") > 7500)
      .select(col("c_custkey").as("custkey"))
    val buyers = Tables.orders(s, d).select(col("o_custkey").as("custkey")).distinct()
    rich.join(buyers.withColumn("hit", lit(1)), Seq("custkey"), "left")
      .select(
        when(col("hit").isNotNull, "rich_buyer").otherwise("rich_no_orders").as("tag"),
        col("custkey"))
      .orderBy("tag", "custkey")
  }

  /** Distinct aggregation: one shuffle on the group key, distinct
    * resolved via partial sets (Spark expands to two-phase agg).
    */
  private def q11DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"),
        Exact.dsum(col("o_totalprice")).as("sum_price")
      )
      .orderBy("o_orderpriority")

  /** ROLLUP over the region->nation hierarchy with grouping flags;
    * NULL group keys are coalesced to 'ALL' for a NULL-free compare.
    */
  private def q12Rollup(s: SparkSession, d: String): DataFrame =
    Tables
      .customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        Exact.dsum(col("c_acctbal")).as("sum_acctbal"),
        grouping(col("r_name")).cast("int").as("g_region"),
        grouping(col("n_name")).cast("int").as("g_nation")
      )
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_customers"),
        col("sum_acctbal"),
        col("g_region"),
        col("g_nation")
      )
      .orderBy("region", "nation")

  /** Scalar string functions, all codegen'd builtins. */
  private def q13StringFuncs(s: SparkSession, d: String): DataFrame =
    Tables
      .part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type5"),
        regexp_replace(col("p_brand"), "Brand#", "B").as("brand_short"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        instr(col("p_name"), "a").as("first_a")
      )
      .orderBy("p_partkey")

  /** Scalar date functions. dayofweek is normalized to DuckDB's
    * 0=Sunday convention on the oracle side.
    */
  private def q14DateFuncs(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        quarter(col("o_orderdate")).as("o_quarter"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        dayofweek(col("o_orderdate")).as("o_dow"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_2002")
      )
      .orderBy("o_orderkey")

  /** CASE WHEN bucketing + agg. */
  private def q15CaseWhen(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .withColumn(
        "bucket",
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .when(col("o_totalprice") < 300000, "large")
          .otherwise("jumbo")
      )
      .groupBy(col("o_orderstatus"), col("bucket"))
      .agg(count(lit(1)).as("n"), Exact.davg(col("o_totalprice")).as("avg_price"))
      .orderBy("o_orderstatus", "bucket")

  /** 5-way star join: broadcast the whole dimension chain, shuffle
    * only customer-orders-lineitem on their join keys.
    */
  private def q16StarJoin(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines")
      )
      .orderBy("r_name", "n_name")

  /** TPC-H Q17-style: join against a per-part aggregate subquery.
    * Threshold `0.5*avg(qty)` is exact (integer-valued doubles), so
    * the strict `<` cannot diverge between engines.
    */
  private def q17AvgQtySubquery(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val halfAvg = li
      .groupBy(col("l_partkey").as("pk"))
      .agg((avg(col("l_quantity")) * 0.5).as("half_avg"))
    li.join(halfAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg((Exact.dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q18-style: HAVING on a grouped sum, then join back. */
  private def q18Having(s: SparkSession, d: String): DataFrame = {
    val big = Tables
      .lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    big
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"), col("sum_qty"))
      .orderBy("o_orderkey")
  }

  /** IN-list + range predicates — everything lands in PushedFilters. */
  private def q19InRange(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .filter(
        col("l_returnflag").isin("A", "R") &&
          col("l_quantity") >= 10 && col("l_quantity") <= 20 &&
          col("l_shipdate") >= lit("1998-01-01").cast("timestamp")
      )
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue")
      )
      .orderBy("l_returnflag")

  /** JSON scalar extraction over the events props column. */
  private def q20Json(s: SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_filter_pushdown" -> (q2FilterPushdown _),
    "q3_top_orders" -> (q3TopOrders _),
    "q4_semi_join" -> (q4SemiJoin _),
    "q5_anti_join" -> (q5AntiJoin _),
    "q6_broadcast_join" -> (q6BroadcastJoin _),
    "q7_topk_per_group" -> (q7TopkPerGroup _),
    "q8_running_window" -> (q8RunningWindow _),
    "q9_global_topk" -> (q9GlobalTopk _),
    "q10_set_ops" -> (q10SetOps _),
    "q11_distinct_agg" -> (q11DistinctAgg _),
    "q12_rollup" -> (q12Rollup _),
    "q13_string_funcs" -> (q13StringFuncs _),
    "q14_date_funcs" -> (q14DateFuncs _),
    "q15_case_when" -> (q15CaseWhen _),
    "q16_star_join" -> (q16StarJoin _),
    "q17_avg_qty_subquery" -> (q17AvgQtySubquery _),
    "q18_having" -> (q18Having _),
    "q19_in_range" -> (q19InRange _),
    "q20_json" -> (q20Json _)
  )

  val oracles: Map[String, String] = Map(
    "q2_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS revenue, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |             JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_semi_join" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |       min(c_custkey) AS min_custkey, CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q6_broadcast_join" ->
      """SELECT p_brand, CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q7_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q8_running_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       sum(l_quantity) OVER (PARTITION BY l_suppkey
        |           ORDER BY l_shipdate, l_orderkey, l_linenumber
        |           ROWS UNBOUNDED PRECEDING) AS running_qty,
        |       CAST(rank() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate) AS INT) AS day_rank,
        |       lag(l_quantity, 1) OVER (PARTITION BY l_suppkey
        |           ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_qty
        |FROM lineitem ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q9_global_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_partkey
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q10_set_ops" ->
      """SELECT 'rich_buyer' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7500
        |  INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'rich_no_orders' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 7500
        |  EXCEPT SELECT o_custkey FROM orders)
        |ORDER BY tag, custkey""".stripMargin,
    "q11_distinct_agg" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs,
        |       count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q12_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_customers, CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal,
        |       CAST(grouping(r_name) AS INT) AS g_region,
        |       CAST(grouping(n_name) AS INT) AS g_nation
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""".stripMargin,
    "q13_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        |       CAST(length(p_name) AS INT) AS name_len,
        |       substr(p_type, 1, 5) AS type5,
        |       replace(p_brand, 'Brand#', 'B') AS brand_short,
        |       concat_ws('-', p_brand, p_type) AS brand_type,
        |       CAST(strpos(p_name, 'a') AS INT) AS first_a
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q14_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS INT) AS o_year,
        |       CAST(month(o_orderdate) AS INT) AS o_month,
        |       CAST(quarter(o_orderdate) AS INT) AS o_quarter,
        |       CAST(day(o_orderdate) AS INT) AS o_day,
        |       CAST(dayofweek(o_orderdate) + 1 AS INT) AS o_dow,
        |       date_trunc('month', o_orderdate) AS month_start,
        |       CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q15_case_when" ->
      """SELECT o_orderstatus,
        |       CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 150000 THEN 'medium'
        |            WHEN o_totalprice < 300000 THEN 'large'
        |            ELSE 'jumbo' END AS bucket,
        |       count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price
        |FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, bucket""".stripMargin,
    "q16_star_join" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |              JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q17_avg_qty_subquery" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem l JOIN (SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg
        |                      FROM lineitem GROUP BY 1) a ON l.l_partkey = a.pk
        |WHERE l.l_quantity < a.half_avg""".stripMargin,
    "q18_having" ->
      """SELECT c_custkey, o_orderkey, o_totalprice, sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
        |      GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big
        |JOIN orders ON big.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q19_in_range" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 10 AND 20
        |  AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q20_json" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
