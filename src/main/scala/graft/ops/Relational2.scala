package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Second wave of relational coverage: temporal joins (as-of, range),
  * grouping sets, pivot, exact percentiles, deterministic variance,
  * array aggregation, scalar math, full-outer join, sessionization and
  * tumbling time windows.
  *
  * Float determinism: no engine-native stddev/var (partial-agg
  * reorder flips bits) — variance is computed from exact integer sums
  * with an identical double formula on both sides; percentiles
  * interpolate between integer-valued doubles; time windows compare
  * on exact counts/min/max, never on reordered double sums.
  */
object Relational2 {

  // ---- q21: as-of join -----------------------------------------------------

  /** For every event, the most recent order of the same customer at
    * or before the event time (the classic enrich-stream-with-dim
    * as-of join). Implementation: equi-join on the key plus range
    * predicate, then latest-wins window — the shuffle is on the join
    * key, and AQE handles per-key skew. Tie-break: latest orderdate,
    * then highest orderkey.
    */
  private def q21AsofJoin(s: SparkSession, d: String): DataFrame = {
    // As-of WITHOUT a join: tag-union-sort. The textbook plan (equi-join
    // on the key, then rank-1 per event) materializes every
    // (event, earlier-order) pair first — quadratic per key when both
    // sides are dense, the classic as-of blow-up at scale. Here orders
    // and events union into one stream, shuffle ONCE on the key, and a
    // single ordered window pass gives each event the most recent order
    // via last(ignoreNulls) over the running frame: O(n log n) per key,
    // no intermediate explosion. Sort ties: at equal time the order row
    // sorts before the event row (tag 0 < 1 ⇒ `o_orderdate <= ts` is
    // inclusive); among same-date orders the max o_orderkey wins
    // (matches the oracle's ORDER BY o_orderdate DESC, o_orderkey DESC
    // rank 1).
    val oType = "struct<o_orderkey:bigint,o_orderdate:timestamp,o_totalprice:double>"
    val ord = Tables.orders(s, d).select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"), lit(0).as("tag"),
      lit(null).cast("bigint").as("event_id"),
      struct(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")).as("o"))
    val ev = Tables.events(s, d).select(
      col("user_id").as("k"), col("ts").as("t"), lit(1).as("tag"),
      col("event_id"), lit(null).cast(oType).as("o"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("tag"), col("o.o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(ev)
      .withColumn("last_o", last(col("o"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("last_o").isNotNull)
      .select(col("event_id"), col("k").as("user_id"),
        col("last_o.o_orderkey").as("o_orderkey"),
        col("last_o.o_orderdate").as("o_orderdate"),
        col("last_o.o_totalprice").as("o_totalprice"))
      .orderBy("event_id")
  }

  private val q21Oracle: String =
    """SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice FROM (
      |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
      |         row_number() OVER (PARTITION BY e.event_id
      |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
      |WHERE rn = 1 ORDER BY event_id""".stripMargin

  // ---- q22: range (interval) join -----------------------------------------

  /** Event pairs of the same user within a 6-hour window — the
    * interval self-join. The equi key (user) carries the shuffle;
    * the range predicate filters within each key group.
    */
  private def q22RangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    ev.as("a")
      .join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          col("b.ts") >= col("a.ts") &&
          col("b.ts") <= col("a.ts") + expr("INTERVAL 6 HOURS"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("a.user_id")).as("n_users"))
      .orderBy("type_a", "type_b")
  }

  private val q22Oracle: String =
    """SELECT a.event_type AS type_a, b.event_type AS type_b,
      |       count(*) AS n_pairs, count(DISTINCT a.user_id) AS n_users
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
      |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin

  // ---- q23: grouping sets --------------------------------------------------

  /** GROUPING SETS through the SQL surface (region x priority,
    * region, grand total) — the general form rollup/cube specialize.
    */
  private def q23GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders")
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    Tables.nation(s, d).createOrReplaceTempView("graft_nation")
    Tables.region(s, d).createOrReplaceTempView("graft_region")
    s.sql(
      """SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |       CAST(grouping(r_name) AS INT) AS g_region,
        |       CAST(grouping(o_orderpriority) AS INT) AS g_priority
        |FROM graft_orders
        |JOIN graft_customer ON o_custkey = c_custkey
        |JOIN graft_nation ON c_nationkey = n_nationkey
        |JOIN graft_region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), ())
        |ORDER BY region, priority""".stripMargin)
  }

  private val q23Oracle: String =
    """SELECT coalesce(r_name, 'ALL') AS region,
      |       coalesce(o_orderpriority, 'ALL') AS priority,
      |       count(*) AS n,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |       CAST(grouping(r_name) AS INT) AS g_region,
      |       CAST(grouping(o_orderpriority) AS INT) AS g_priority
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), ())
      |ORDER BY region, priority""".stripMargin

  // ---- q24: pivot ----------------------------------------------------------

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Pivot priorities into columns per order status. Spark's pivot
    * with an explicit value list stays a single two-phase hash agg
    * (no extra shuffle for value discovery).
    */
  private def q24Pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderstatus")

  private val q24Oracle: String = {
    val cols = priorities
      .map(p => s"""count(*) FILTER (o_orderpriority = '$p') AS "$p"""")
      .mkString(",\n       ")
    s"""SELECT o_orderstatus,
       |       $cols
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  }

  // ---- q25: exact percentiles ---------------------------------------------

  /** Exact percentile_cont over integer-valued doubles: the
    * interpolation lands on exact integers or exact midpoints, so
    * both engines produce identical doubles.
    */
  private def q25Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5D)").as("p50"),
        expr("percentile(l_quantity, 0.9D)").as("p90"),
        expr("percentile(l_quantity, 0.99D)").as("p99"),
        min(col("l_quantity")).as("qmin"),
        max(col("l_quantity")).as("qmax")
      )
      .orderBy("l_returnflag")

  private val q25Oracle: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.5) AS p50,
      |       quantile_cont(l_quantity, 0.9) AS p90,
      |       quantile_cont(l_quantity, 0.99) AS p99,
      |       min(l_quantity) AS qmin, max(l_quantity) AS qmax
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q26: deterministic variance ----------------------------------------

  /** Population variance/stddev of l_discount without engine-native
    * var_pop (whose partial-agg reordering flips double bits):
    * quantize to integer cents, accumulate exact integer sums, apply
    * one identical double formula. sqrt is IEEE-exact.
    */
  private def q26Variance(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("d100", expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"))
      .groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("d100")).as("s1"),
        sum(col("d100") * col("d100")).as("s2")
      )
      .withColumn("mean_disc", col("s1").cast("double") / col("n") / 100.0)
      .withColumn("var_disc",
        (col("s2").cast("double") / 10000.0 -
          (col("s1").cast("double") / 100.0) * (col("s1").cast("double") / 100.0) / col("n")) / col("n"))
      .withColumn("stddev_disc", sqrt(col("var_disc")))
      .select("l_linestatus", "n", "mean_disc", "var_disc", "stddev_disc")
      .orderBy("l_linestatus")

  private val q26Oracle: String =
    """SELECT l_linestatus, n,
      |       CAST(s1 AS DOUBLE) / n / 100.0 AS mean_disc,
      |       (CAST(s2 AS DOUBLE) / 10000.0
      |          - (CAST(s1 AS DOUBLE) / 100.0) * (CAST(s1 AS DOUBLE) / 100.0) / n) / n AS var_disc,
      |       sqrt((CAST(s2 AS DOUBLE) / 10000.0
      |          - (CAST(s1 AS DOUBLE) / 100.0) * (CAST(s1 AS DOUBLE) / 100.0) / n) / n) AS stddev_disc
      |FROM (
      |  SELECT l_linestatus, count(*) AS n,
      |         CAST(sum(d100) AS BIGINT) AS s1,
      |         CAST(sum(d100 * d100) AS BIGINT) AS s2
      |  FROM (SELECT l_linestatus, CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d100
      |        FROM lineitem)
      |  GROUP BY l_linestatus)
      |ORDER BY l_linestatus""".stripMargin

  // ---- q27: array aggregation ---------------------------------------------

  /** Array aggregation with deterministic rendering: collect, dedup,
    * sort, join to a scalar string (collect order is partition-
    * dependent, so the sort is the determinism barrier).
    */
  private def q27ArrayAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy(col("o_orderpriority"))
      .agg(
        array_sort(array_distinct(collect_list(col("o_year")))).as("years"),
        countDistinct(col("o_year")).as("n_years")
      )
      .select(
        col("o_orderpriority"),
        array_join(col("years"), ",").as("years_csv"),
        size(col("years")).as("n_elems"),
        element_at(col("years"), 1).as("first_year"),
        element_at(col("years"), -1).as("last_year"),
        col("n_years")
      )
      .orderBy("o_orderpriority")

  private val q27Oracle: String =
    """SELECT o_orderpriority,
      |       array_to_string(years, ',') AS years_csv,
      |       CAST(len(years) AS INT) AS n_elems,
      |       years[1] AS first_year, years[-1] AS last_year,
      |       n_years
      |FROM (
      |  SELECT o_orderpriority,
      |         list_sort(list_distinct(list(CAST(year(o_orderdate) AS INT)))) AS years,
      |         count(DISTINCT year(o_orderdate)) AS n_years
      |  FROM orders GROUP BY o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin

  // ---- q28: scalar math ----------------------------------------------------

  /** Scalar math over money columns, restricted to IEEE-exact
    * operations (sqrt, abs, floor/ceil, modulo, x*x) — no
    * transcendentals, whose bits vary by libm.
    */
  private def q28MathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_linenumber") === 1)
      .select(
        col("l_orderkey"),
        abs(col("l_extendedprice") - 30000.0).as("abs_dev"),
        sqrt(col("l_extendedprice")).as("sqrt_price"),
        floor(col("l_extendedprice") / 1000).cast("bigint").as("price_k"),
        ceil(col("l_extendedprice") / 1000).cast("bigint").as("price_k_up"),
        (col("l_orderkey") % 97).as("key_mod"),
        (col("l_discount") * col("l_discount")).as("disc_sq"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate")
      )
      .orderBy("l_orderkey")

  private val q28Oracle: String =
    """SELECT l_orderkey,
      |       abs(l_extendedprice - 30000.0) AS abs_dev,
      |       sqrt(l_extendedprice) AS sqrt_price,
      |       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
      |       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_up,
      |       l_orderkey % 97 AS key_mod,
      |       l_discount * l_discount AS disc_sq,
      |       greatest(l_tax, l_discount) AS max_rate,
      |       least(l_tax, l_discount) AS min_rate
      |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin

  // ---- q29: full outer join ------------------------------------------------

  /** Full outer join of two derived aggregates with disjoint key
    * coverage, classified by match side.
    */
  private def q29FullOuter(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(Exact.dsum(col("o_totalprice")).as("spend"))
      .filter(col("spend") > 400000.0)
    val bal = Tables.customer(s, d)
      .filter(col("c_acctbal") > 7000.0)
      .select(col("c_custkey"), col("c_acctbal"))
    spend.join(bal, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        when(col("o_custkey").isNotNull && col("c_custkey").isNotNull, "both")
          .when(col("o_custkey").isNotNull, "spender_only")
          .otherwise("balance_only").as("side"),
        coalesce(col("spend"), lit(0.0)).as("spend"),
        coalesce(col("c_acctbal"), lit(0.0)).as("acctbal")
      )
      .orderBy("custkey")
  }

  private val q29Oracle: String =
    """SELECT coalesce(o_custkey, c_custkey) AS custkey,
      |       CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NOT NULL THEN 'both'
      |            WHEN o_custkey IS NOT NULL THEN 'spender_only'
      |            ELSE 'balance_only' END AS side,
      |       coalesce(spend, 0.0) AS spend,
      |       coalesce(c_acctbal, 0.0) AS acctbal
      |FROM (SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
      |      FROM orders GROUP BY o_custkey
      |      HAVING CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) > 400000.0) s
      |FULL OUTER JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 7000.0) b
      |  ON o_custkey = c_custkey
      |ORDER BY custkey""".stripMargin

  // ---- q30: sessionization (gaps-and-islands) ------------------------------

  /** Batch sessionization: a session breaks after a 6-hour silence.
    * lag + conditional cumulative sum — the batch analog of streaming
    * session windows, one shuffle on user.
    */
  private def q30Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 21600, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        max(col("session_end").cast("long") - col("session_start").cast("long")).as("max_session_secs")
      )
      .orderBy("user_id")
  }

  private val q30Oracle: String =
    """SELECT user_id, count(*) AS n_sessions,
      |       max(n_events) AS max_session_events,
      |       max(CAST(date_diff('second', session_start, session_end) AS BIGINT)) AS max_session_secs
      |FROM (
      |  SELECT user_id, session_id, count(*) AS n_events,
      |         min(ts) AS session_start, max(ts) AS session_end
      |  FROM (
      |    SELECT user_id, ts,
      |           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                  ROWS UNBOUNDED PRECEDING) AS session_id
      |    FROM (
      |      SELECT user_id, ts, event_id,
      |             CASE WHEN lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |                    OR date_diff('second', lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 21600
      |                  THEN 1 ELSE 0 END AS new_session
      |      FROM events))
      |  GROUP BY user_id, session_id)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- q31: tumbling time windows -----------------------------------------

  /** Daily tumbling windows over the event stream (batch form of the
    * streaming windowed aggregation; identical epoch-aligned UTC
    * buckets in both engines). Compare on exact aggregates only.
    */
  private def q31Tumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .select(col("w.start").as("day_start"), col("event_type"),
        col("n"), col("sum_k"), col("min_v"), col("max_v"))
      .orderBy("day_start", "event_type")

  private val q31Oracle: String =
    """SELECT time_bucket(INTERVAL 1 DAY, ts) AS day_start, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       min(value) AS min_v, max(value) AS max_v
      |FROM events GROUP BY 1, 2 ORDER BY day_start, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_asof_join" -> (q21AsofJoin _),
    "q22_range_join" -> (q22RangeJoin _),
    "q23_grouping_sets" -> (q23GroupingSets _),
    "q24_pivot" -> (q24Pivot _),
    "q25_percentiles" -> (q25Percentiles _),
    "q26_variance" -> (q26Variance _),
    "q27_array_agg" -> (q27ArrayAgg _),
    "q28_math_funcs" -> (q28MathFuncs _),
    "q29_full_outer" -> (q29FullOuter _),
    "q30_sessionize" -> (q30Sessionize _),
    "q31_tumbling" -> (q31Tumbling _)
  )

  val oracles: Map[String, String] = Map(
    "q21_asof_join" -> q21Oracle,
    "q22_range_join" -> q22Oracle,
    "q23_grouping_sets" -> q23Oracle,
    "q24_pivot" -> q24Oracle,
    "q25_percentiles" -> q25Oracle,
    "q26_variance" -> q26Oracle,
    "q27_array_agg" -> q27Oracle,
    "q28_math_funcs" -> q28Oracle,
    "q29_full_outer" -> q29Oracle,
    "q30_sessionize" -> q30Oracle,
    "q31_tumbling" -> q31Oracle
  )
}
