package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Relational wave 3: correlated subqueries, CUBE, lateral explode,
  * window frames, regex scalars — the remaining breadth of the SQL
  * surface, each with a DuckDB oracle.
  *
  * Determinism rules (same as waves 1–2): total sort keys everywhere;
  * windowed sums go through DECIMAL(18,4) so frame association can't
  * produce float drift (DuckDB evaluates windowed aggregates with a
  * segment tree — a different addition order than Spark's running
  * frame); regexes stay in the RE2 ∩ Java-regex common subset and the
  * DuckDB `regexp_replace` gets the `'g'` flag Spark implies.
  */
object Relational3 {

  // ---- q32: correlated EXISTS / NOT EXISTS --------------------------------

  /** Planned through Spark's subquery rewrite (RewritePredicateSubquery
    * turns these into semi/anti joins — `.explain` shows one of each):
    * orders with a max-quantity line and no high-discount line.
    */
  private def q32Exists(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT o.o_orderkey, o.o_totalprice
         |FROM parquet.`$d/orders.parquet` o
         |WHERE EXISTS (SELECT 1 FROM parquet.`$d/lineitem.parquet` l
         |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 50)
         |  AND NOT EXISTS (SELECT 1 FROM parquet.`$d/lineitem.parquet` l
         |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
         |ORDER BY o.o_orderkey""".stripMargin)

  private val q32Oracle: String =
    """SELECT o.o_orderkey, o.o_totalprice
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 50)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l
      |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.09)
      |ORDER BY o.o_orderkey""".stripMargin

  // ---- q33: CUBE ----------------------------------------------------------

  private def q33Cube(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status")
      )
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_rows"), col("sum_qty"), col("g_flag"), col("g_status")
      )
      .orderBy("flag", "status", "g_flag", "g_status")

  private val q33Oracle: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
       |       coalesce(l_linestatus, 'ALL') AS status,
       |       count(*) AS n_rows,
       |       ${Exact.sqlSum("l_quantity")} AS sum_qty,
       |       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       |       CAST(GROUPING(l_linestatus) AS INT) AS g_status
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY flag, status, g_flag, g_status""".stripMargin

  // ---- q34: lateral explode (generator in the plan) -----------------------

  /** posexplode = Spark's Generate node — the lateral-view form of
    * unnest; bounded to the first 5 words of 20 docs so the output is
    * small and totally ordered.
    */
  private def q34Lateral(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        posexplode(slice(Text.wordsCol(col("text")), 1, 5)).as(Seq("pos", "word")))
      .orderBy("doc_id", "pos")

  private val q34Oracle: String = {
    // DuckDB 1.0's generate_series table function can't lateral-join
    // on a column — unnest a per-row struct list instead
    val ws = Text.wordsSql("text")
    s"""SELECT doc_id, CAST(t.pos AS INT) AS pos, t.word AS word
       |FROM (SELECT doc_id,
       |             unnest(list_transform(generate_series(0, len(words)-1),
       |                    i -> {'pos': i, 'word': words[i+1]})) AS t
       |      FROM (SELECT doc_id, list_slice($ws, 1, 5) AS words
       |            FROM documents WHERE doc_id < 20))
       |ORDER BY doc_id, pos""".stripMargin
  }

  // ---- q35: window frames -------------------------------------------------

  private def q35Frames(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderpriority"),
        sum(col("o_totalprice").cast("decimal(18,4)"))
          .over(w.rowsBetween(-2, Window.currentRow))
          .cast("double").as("mov_sum"),
        first_value(col("o_totalprice")).over(w).as("first_price"),
        last_value(col("o_totalprice"))
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
          .as("last_price"),
        ntile(4).over(w).as("quartile")
      )
      .orderBy("o_orderkey")
  }

  private val q35Oracle: String =
    """SELECT o_orderkey, o_orderpriority,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |           PARTITION BY o_orderpriority ORDER BY o_orderkey
      |           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum,
      |       first_value(o_totalprice) OVER (
      |           PARTITION BY o_orderpriority ORDER BY o_orderkey) AS first_price,
      |       last_value(o_totalprice) OVER (
      |           PARTITION BY o_orderpriority ORDER BY o_orderkey
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_price,
      |       CAST(ntile(4) OVER (
      |           PARTITION BY o_orderpriority ORDER BY o_orderkey) AS INT) AS quartile
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---- q36: regex scalars -------------------------------------------------

  private def q36Regex(s: SparkSession, d: String): DataFrame =
    Tables
      .part(s, d)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_word"),
        regexp_replace(col("p_type"), "[AEIOU]", "_").as("devoweled"),
        col("p_brand").rlike("^Brand#[0-9]+$").as("brand_ok")
      )
      .orderBy("p_partkey")

  private val q36Oracle: String =
    """SELECT p_partkey,
      |       regexp_extract(p_name, '(\w+)$', 1) AS last_word,
      |       regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devoweled,
      |       regexp_matches(p_brand, '^Brand#[0-9]+$') AS brand_ok
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---- q37: cohort retention ----------------------------------------------

  /** Cohort analysis over the event feed: users grouped by first-seen
    * day, activity counted per day offset — the standard retention
    * matrix. Two hash aggs + one shuffle join on user_id; all date
    * arithmetic is exact integers.
    */
  private def q37Retention(s: SparkSession, d: String): DataFrame = {
    val days = Tables
      .events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohorts = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    days
      .join(cohorts, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  private val q37Oracle: String =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id)
      |SELECT c.cohort_day,
      |       CAST(date_diff('day', c.cohort_day, d.day) AS INT) AS day_offset,
      |       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
      |FROM days d JOIN cohorts c ON d.user_id = c.user_id
      |GROUP BY c.cohort_day, date_diff('day', c.cohort_day, d.day)
      |ORDER BY cohort_day, day_offset""".stripMargin

  // ---- q38: salted skew-safe aggregation ----------------------------------

  /** The salting pattern for skewed group keys: phase one aggregates
    * on (key, salt) — spreading one hot key over 8 reducers — phase
    * two merges the partials on the key alone. Result is identical to
    * the direct aggregation (the oracle computes the direct form);
    * decimal partials keep the merge exact. With 3 distinct
    * returnflags over 32 partitions the skew is real: unsalted, 3
    * reducers do all the work.
    */
  private def q38SaltedAgg(s: SparkSession, d: String): DataFrame =
    Tables
      .lineitem(s, d)
      .withColumn("salt", pmod(col("l_orderkey"), lit(8)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)")).as("part_qty"),
        count(lit(1)).as("part_n")
      )
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("part_qty")).cast("double").as("sum_qty"),
        sum(col("part_n")).as("n_rows")
      )
      .orderBy("l_returnflag")

  private val q38Oracle: String =
    s"""SELECT l_returnflag, ${Exact.sqlSum("l_quantity")} AS sum_qty,
       |       count(*) AS n_rows
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---- q39: analytic rank ratios ------------------------------------------

  /** percent_rank / cume_dist / dense_rank — exact rationals
    * ((rank−1)/(n−1), rank/n), so the doubles agree bit-for-bit across
    * engines; o_orderkey makes every ordering total.
    */
  private def q39PercentRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
    Tables
      .orders(s, d)
      .select(
        col("o_orderkey"),
        col("o_orderpriority"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        dense_rank().over(w).as("dr")
      )
      .orderBy("o_orderkey")
  }

  private val q39Oracle: String =
    """SELECT o_orderkey, o_orderpriority,
      |       percent_rank() OVER w AS pr,
      |       cume_dist() OVER w AS cd,
      |       CAST(dense_rank() OVER w AS INT) AS dr
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ---- q40: array higher-order functions ----------------------------------

  /** The array-HOF scalar surface (transform / aggregate / zip_with /
    * reverse / slice / sort) over quantized embeddings — all integer
    * arithmetic so both engines agree exactly.
    */
  private def q40ArrayOps(s: SparkSession, d: String): DataFrame =
    Tables
      .embeddings(s, d)
      .filter(col("vec_id") < 1000)
      .withColumn("q", expr("transform(embedding, x -> CAST(floor(x * 100) AS BIGINT))"))
      .select(
        col("vec_id"),
        expr("aggregate(q, 0L, (acc, x) -> acc + x)").as("q_sum"),
        expr("aggregate(zip_with(q, reverse(q), (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
          .as("pal_dot"),
        // joined, not an array column: the driver compare hashes
        // scalars (same convention as q27)
        expr("array_join(sort_array(slice(q, 1, 5)), ',')").as("first5_csv")
      )
      .orderBy("vec_id")

  private val q40Oracle: String =
    """SELECT vec_id,
      |       CAST(list_sum(q) AS BIGINT) AS q_sum,
      |       CAST(list_sum(list_transform(generate_series(1, len(q)),
      |            i -> q[i] * q[len(q) - i + 1])) AS BIGINT) AS pal_dot,
      |       array_to_string(list_sort(list_slice(q, 1, 5)), ',') AS first5_csv
      |FROM (SELECT vec_id,
      |             list_transform(embedding::DOUBLE[],
      |                            x -> CAST(floor(x * 100) AS BIGINT)) AS q
      |      FROM embeddings WHERE vec_id < 1000)
      |ORDER BY vec_id""".stripMargin

  // ---- q41: date truncation + interval arithmetic -------------------------

  private def q41DateTrunc(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        max(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("last_due"),
        min(dayofweek(col("o_orderdate"))).as("min_dow")
      )
      .orderBy("month")

  private val q41Oracle: String =
    """SELECT date_trunc('month', o_orderdate) AS month,
      |       count(*) AS n_orders,
      |       max(o_orderdate + INTERVAL 30 DAY) AS last_due,
      |       CAST(min(dayofweek(o_orderdate) + 1) AS INT) AS min_dow
      |FROM orders GROUP BY date_trunc('month', o_orderdate)
      |ORDER BY month""".stripMargin

  // ---- q42: conditional / boolean aggregates ------------------------------

  private def q42CondAgg(s: SparkSession, d: String): DataFrame =
    Tables
      .orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count_if(col("o_totalprice") > 200000).as("n_big"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        bool_or(col("o_orderstatus") === "F").as("any_final"),
        Exact.dsum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0))
          .as("open_total")
      )
      .orderBy("o_orderpriority")

  private val q42Oracle: String =
    """SELECT o_orderpriority,
      |       count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
      |       bool_and(o_totalprice > 0) AS all_positive,
      |       bool_or(o_orderstatus = 'F') AS any_final,
      |       CAST(sum(CAST(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END
      |                     AS DECIMAL(18,4))) AS DOUBLE) AS open_total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- q43: skew-safe salted join -----------------------------------------

  /** A deliberately skewed equi-join — 80% of lineitem rows share one
    * hot key — made shuffle-safe by salting (the join-side twin of
    * q38's salted aggregation): the big side adds a uniform salt in
    * [0, 8), the dim side replicates 8x, and the join key becomes
    * (sk, salt), spreading the hot key over 8 reducers instead of one
    * straggler. The join is hinted SHUFFLE_HASH — a broadcast would
    * mask the very skew the query demonstrates; AQE's skew-join does
    * this re-split adaptively for sort-merge plans, salting is the
    * plan-stable form that also covers pre-AQE engines. The oracle
    * runs the plain UNSALTED join — the rewrite must be invisible in
    * the result.
    */
  private def q43SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val R = 8
    val line = Tables
      .lineitem(s, d)
      .select(
        expr("CASE WHEN l_orderkey % 10 < 8 THEN 0 ELSE l_orderkey % 1000 END").as("sk"),
        col("l_extendedprice"),
        pmod(hash(col("l_partkey"), col("l_suppkey")), lit(R)).as("salt"))
    val dim = s.range(0, 1000)
      .select(col("id").as("sk"), concat(lit("grp-"), col("id") % 7).as("label"))
      .withColumn("salt", explode(sequence(lit(0), lit(R - 1))))
    line
      .join(dim.hint("shuffle_hash"), Seq("sk", "salt"))
      .groupBy(col("label"))
      .agg(
        Exact.dsum(col("l_extendedprice")).as("total_price"),
        count(lit(1)).as("n_items"))
      .orderBy("label")
  }

  private val q43Oracle: String =
    """SELECT 'grp-' || (sk % 7) AS label,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
      |       count(*) AS n_items
      |FROM (SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
      |             ELSE l_orderkey % 1000 END AS sk, l_extendedprice
      |      FROM lineitem) l
      |JOIN (SELECT i AS sk FROM generate_series(0, 999) t(i)) d USING (sk)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q51: AQE skew-join split (the adaptive half of the triangle) -------

  /** The ADAPTIVE answer to the skew q50 detects and q43/q38 mitigate
    * by hand: the same planted 90%-hot-key join, deliberately left
    * UNSALTED, with AQE's `OptimizeSkewedJoin` doing the re-split at
    * runtime — the oversized shuffle partition is cut into
    * advisory-sized slices and the dim side's matching partition is
    * replicated per slice, exactly what q43's (key, salt) rewrite
    * does statically. Runs in a CHILD session (the d7 isolation
    * pattern): the skew thresholds are tuned so the harness-scale
    * shuffle exhibits the same relative skew a 100 TB shuffle would
    * against the production defaults, broadcast is disabled (it would
    * dissolve the demonstration — at real scale the dim exceeds the
    * threshold), and the parent session's conf is never touched. The
    * oracle runs the plain join: the adaptive split must be invisible
    * in the result. PlanAuditSpec pins the `skew=true` marker on the
    * executed sort-merge join, so a regression that stops the split
    * from firing fails CI, not just the bench.
    */
  private def q51AqeSkew(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4k")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val line = Tables
      .lineitem(s, d)
      // AQE splits a skewed reduce partition by MAP-INDEX ranges, so a
      // single-mapper shuffle (the harness table is one parquet file →
      // one scan task) is structurally unsplittable no matter how
      // skewed. A real 100 TB scan has thousands of map tasks; the
      // round-robin repartition restores that topology at harness
      // scale so the demonstration exercises the production mechanism.
      .repartition(16)
      .select(
        expr("CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_orderkey % 1000 END")
          .as("sk"),
        col("l_extendedprice"))
    val dim = s.range(0, 1000)
      .select(col("id").as("sk"), concat(lit("grp-"), col("id") % 7).as("label"))
    line
      .join(dim, Seq("sk"))
      .groupBy(col("label"))
      .agg(
        Exact.dsum(col("l_extendedprice")).as("total_price"),
        count(lit(1)).as("n_items"))
      .orderBy("label")
  }

  private val q51Oracle: String =
    """SELECT 'grp-' || (sk % 7) AS label,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
      |       count(*) AS n_items
      |FROM (SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
      |             ELSE l_orderkey % 1000 END AS sk, l_extendedprice
      |      FROM lineitem) l
      |JOIN (SELECT i AS sk FROM generate_series(0, 999) t(i)) d USING (sk)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- q44: runtime bloom-filter join --------------------------------------

  /** Runtime-filter demonstration: a selective dimension filter whose
    * predicate cannot be pushed to the fact scan statically — Spark's
    * runtime bloom filter (`spark.sql.optimizer.runtime.bloomFilter`)
    * builds a bloom of the surviving join keys at execution time and
    * injects `bloom_filter_might_contain` INTO the fact scan, pruning
    * most of the 100 TB side before the shuffle. The default
    * application-side threshold (10 GB) is tuned for real clusters;
    * the query lowers it so the plan at harness scale is the plan at
    * 100 TB (temporarily — conf restored after the plan is built;
    * PLANS.md carries the evidence). Results are independent of
    * whether the filter fires — the oracle checks semantics, the plan
    * carries the scale story.
    */
  private def q44BloomJoin(s: SparkSession, d: String): DataFrame = {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // broadcast would bypass the runtime filter (and its demo): at
      // real scale the filtered dim is over the broadcast threshold
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      Tables.lineitem(s, d)
        .join(
          Tables.orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 250000),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          Exact.dsum(col("l_extendedprice")).as("total_price"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("o_orderpriority")
        // force plan+execution inside the conf window
        .localCheckpoint(true)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  private val q44Oracle: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
      |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- q45: bucketed co-located join (zero-exchange sort-merge) -----------

  /** The layout investment a 100 TB warehouse makes once and amortizes
    * over every subsequent join on the key: both fact tables are
    * pre-bucketed on their join key (`bucketBy(8)`, one file per
    * bucket via a matching `repartition` — Spark's bucketing and
    * `repartition` share the Murmur3 hash, so partition i IS bucket
    * i), after which the orderkey join plans as a sort-merge whose
    * join subtree contains NO Exchange: each task reads bucket i of
    * both tables and merges locally. The only shuffle left in the
    * query is the tiny 5-group rollup above the join. `hint("merge")`
    * pins the strategy so an sf-scale broadcast can't bypass the
    * demonstration (at real scale neither side broadcasts). The write
    * happens once per (JVM, sf dir) — the amortization is the point —
    * into the gitignored `spark-warehouse/`.
    */
  /** Once-per-(JVM, sf dir) managed-table writer, shared by the
    * layout-investment queries (q45, q49): drops any stale catalog
    * entry AND leftover warehouse location from a previous JVM
    * (`saveAsTable` refuses with LOCATION_ALREADY_EXISTS otherwise),
    * runs the writer, and caches the table name per sf dir.
    */
  private def writeOnce(
      cache: java.util.concurrent.ConcurrentHashMap[String, String],
      s: SparkSession, d: String, prefix: String)(
      writer: String => Unit): String =
    cache.computeIfAbsent(
      d, { _ =>
        // Collision-resistant per-dir table name: a 32-bit hashCode
        // collision between two data dirs in one JVM would DROP and
        // silently serve the wrong table; 64 bits of md5 cannot.
        val dig = java.security.MessageDigest.getInstance("MD5")
          .digest(d.getBytes("UTF-8")).take(8)
          .map(b => f"${b & 0xff}%02x").mkString
        val t = s"${prefix}_$dig"
        s.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        writer(t)
        t
      })

  private val q45LiWritten =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val q45OrdWritten =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def q45BucketedJoin(s: SparkSession, d: String): DataFrame = {
    val liT = writeOnce(q45LiWritten, s, d, "graft_b_li") { t =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(t)
    }
    val ordT = writeOnce(q45OrdWritten, s, d, "graft_b_ord") { t =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(t)
    }
    s.table(ordT).hint("merge")
      .join(s.table(liT).hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  private val q45Oracle: String =
    s"""SELECT o_orderpriority,
       |       ${Exact.sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |       count(*) AS n_items
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---- q46: z-order clustering (multi-dimensional data skipping) ----------

  /** Bit j of `x`, arithmetic-only (`DIV`/`%`/`*` — identical in both
    * engines; `divOp` spells the integer division, Spark `DIV` vs
    * DuckDB `//`), interleaved x↔even bits, y↔odd bits.
    */
  private def zSql(x: String, y: String, divOp: String): String =
    (0 until 8).flatMap { j =>
      Seq(
        s"(($x $divOp ${1L << j}) % 2) * ${1L << (2 * j)}",
        s"(($y $divOp ${1L << j}) % 2) * ${1L << (2 * j + 1)}")
    }.mkString("(", " + ", ")")

  /** Z-order clustering — the multi-dimensional answer to single-key
    * range layout: interleaving the bits of (partkey, suppkey) maps
    * each row to a point on a space-filling curve, so any contiguous
    * z-range covers a small rectangle in (x, y). Range-partitioned by
    * z at 100 TB, every file's parquet min/max stats then bound BOTH
    * columns at once and a two-column box predicate prunes files the
    * way a one-column predicate prunes a sorted layout. The query
    * materializes exactly that argument as data: 64 z-buckets standing
    * in for files, each with its min/max footer stats, `hits_box`
    * (would the pruner touch it for x∈[32,63] ∧ y∈[96,127]?) and
    * `n_box` (rows actually in the box) — every skipped bucket
    * provably contains zero matching rows, and the box concentrates in
    * ~1/16 of the buckets instead of all of them.
    */
  private def q46ZOrder(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        (col("l_partkey") % 256).as("x"),
        (col("l_suppkey") % 256).as("y"))
      .select(col("x"), col("y"),
        expr(zSql("x", "y", "DIV")).as("z"))
      .groupBy(expr("z DIV 1024").as("zb"))
      .agg(
        count(lit(1)).as("n"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"),
        sum(when(col("x").between(32, 63) && col("y").between(96, 127), 1L)
          .otherwise(0L)).as("n_box"))
      .withColumn("hits_box",
        (col("x_min") <= 63 && col("x_max") >= 32 &&
          col("y_min") <= 127 && col("y_max") >= 96).cast("int"))
      .select("zb", "n", "x_min", "x_max", "y_min", "y_max", "n_box", "hits_box")
      .orderBy("zb")

  private val q46Oracle: String = {
    val z = zSql("x", "y", "//")
    s"""WITH pts AS (
       |  SELECT x, y, $z AS z FROM (
       |    SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem)),
       |b AS (
       |  SELECT z // 1024 AS zb, count(*) AS n,
       |         min(x) AS x_min, max(x) AS x_max,
       |         min(y) AS y_min, max(y) AS y_max,
       |         CAST(sum(CASE WHEN x BETWEEN 32 AND 63 AND y BETWEEN 96 AND 127
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_box
       |  FROM pts GROUP BY 1)
       |SELECT zb, n, x_min, x_max, y_min, y_max, n_box,
       |       CAST(x_min <= 63 AND x_max >= 32 AND
       |            y_min <= 127 AND y_max >= 96 AS INT) AS hits_box
       |FROM b ORDER BY zb""".stripMargin
  }

  // ---- q47: blocked fuzzy join (edit-distance matching) -------------------

  /** Fuzzy string matching as a JOIN, made scale-shaped by BLOCKING:
    * an edit-distance join is a cross product by definition, so the
    * plan first equi-joins on a block key (the 7-char brand prefix a
    * single-char typo can't move) and only runs codegen'd
    * `levenshtein` inside each tiny block — the same
    * bucket-then-verify topology as LSH dedup, applied to data
    * cleaning. Typos are PLANTED deterministically (every 7th part's
    * brand gets its last char replaced by 'X', a character no clean
    * brand contains), and the result counts exact and distance-1
    * matches per clean brand — including the honest ambiguity of a
    * typo sitting at distance 1 from several brands.
    */
  private def q47FuzzyJoin(s: SparkSession, d: String): DataFrame = {
    val dirty = Tables.part(s, d)
      .select(when(col("p_partkey") % 7 === 0,
        expr("concat(substr(p_brand, 1, length(p_brand) - 1), 'X')"))
        .otherwise(col("p_brand")).as("brand_dirty"))
      .withColumn("blk", expr("substr(brand_dirty, 1, 7)"))
    val dict = Tables.part(s, d)
      .select(col("p_brand").as("brand")).distinct()
      .withColumn("blk", expr("substr(brand, 1, 7)"))
    dirty
      .join(broadcast(dict), Seq("blk"))
      .filter(expr("levenshtein(brand_dirty, brand) <= 1"))
      .groupBy(col("brand"))
      .agg(
        sum(when(col("brand_dirty") === col("brand"), 1L).otherwise(0L))
          .as("n_exact"),
        sum(when(col("brand_dirty") =!= col("brand"), 1L).otherwise(0L))
          .as("n_fuzzy"))
      .orderBy("brand")
  }

  private val q47Oracle: String =
    """SELECT brand,
      |       CAST(sum(CASE WHEN brand_dirty = brand THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
      |       CAST(sum(CASE WHEN brand_dirty <> brand THEN 1 ELSE 0 END) AS BIGINT) AS n_fuzzy
      |FROM (
      |  SELECT CASE WHEN p_partkey % 7 = 0
      |              THEN substr(p_brand, 1, length(p_brand) - 1) || 'X'
      |              ELSE p_brand END AS brand_dirty
      |  FROM part) dirty
      |JOIN (SELECT DISTINCT p_brand AS brand FROM part) dict
      |  ON substr(brand_dirty, 1, 7) = substr(brand, 1, 7)
      | AND levenshtein(brand_dirty, brand) <= 1
      |GROUP BY brand ORDER BY brand""".stripMargin

  // ---- q49: dynamic partition pruning (runtime partition skipping) --------

  /** The runtime companion to q45's static layout: the fact table is
    * written PARTITIONED by a derived month column (the once-per-table
    * layout investment again), and the month filter arrives only
    * through a JOIN against a tiny dimension — no literal predicate on
    * the fact anywhere in the query. Dynamic partition pruning turns
    * the dim's broadcast into an IN-subquery on the fact scan
    * (`dynamicpruning#` in the plan, PlanAuditSpec-asserted), so the
    * scan opens 3 of 12 month directories at RUNTIME. At 100 TB this
    * is the difference between reading a quarter and reading the
    * decade: star-schema queries prune by what the dim filter selects,
    * with no ETL-time knowledge of the predicate.
    */
  private val dppWritten =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def q49Dpp(s: SparkSession, d: String): DataFrame = {
    val factT = writeOnce(dppWritten, s, d, "graft_p_li") { t =>
      Tables.lineitem(s, d)
        .select(col("l_extendedprice"), col("l_discount"),
          month(col("l_shipdate")).as("l_month"))
        .repartition(col("l_month"))
        .write.mode("overwrite").partitionBy("l_month")
        .saveAsTable(t)
    }
    val dim = s.range(1, 13)
      .select(col("id").cast("int").as("m_month"),
        (((col("id") - 1) / 3).cast("int") + 1).as("m_quarter"))
    s.table(factT)
      .join(broadcast(dim.filter(col("m_quarter") === 1)),
        col("l_month") === col("m_month"))
      .groupBy(col("l_month"))
      .agg(
        Exact.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("l_month")
  }

  private val q49Oracle: String =
    s"""SELECT l_month, ${Exact.sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |       count(*) AS n_items
       |FROM (SELECT l_extendedprice, l_discount,
       |             CAST(month(l_shipdate) AS INT) AS l_month FROM lineitem) f
       |JOIN (SELECT m_month, ((m_month - 1) // 3) + 1 AS m_quarter
       |      FROM (SELECT CAST(unnest(generate_series(1, 12)) AS INT) AS m_month)) d
       |  ON f.l_month = d.m_month
       |WHERE d.m_quarter = 1
       |GROUP BY l_month ORDER BY l_month""".stripMargin

  // ---- q50: key-skew profile (the salting decision input) -----------------

  /** The DETECT half whose MITIGATE halves are q38 (salted agg), q43
    * (salted join) and AQE's skew split, and whose streaming sibling
    * is sk3's count-min: before choosing a skew strategy you measure
    * the key distribution. One shuffle on the key builds the
    * key-frequency table (the same exchange any aggregate on this key
    * would pay anyway); the profile itself is then a constant-size
    * rollup — row/key counts, the heaviest key's per-mille share, the
    * top-10 keys' combined share, and a `skew_flag` that trips when
    * one key exceeds a 32-partition fair share (the local[32] analog
    * of "one task gets more than its slice"). All integer arithmetic;
    * ties broken by key so top-10 is deterministic.
    */
  private def q50SkewProfile(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
    val top10 = counts
      .orderBy(col("n").desc, col("user_id"))
      .limit(10)
      .agg(sum(col("n")).as("top10_rows"))
    counts
      .agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("n")).as("max_key_rows"))
      .crossJoin(top10)
      .select(
        col("n_rows"), col("n_keys"), col("max_key_rows"),
        expr("(1000 * max_key_rows) DIV n_rows").as("top1_permille"),
        expr("(1000 * top10_rows) DIV n_rows").as("top10_permille"),
        expr("CAST(32 * max_key_rows >= n_rows AS INT)").as("skew_flag"))
  }

  private val q50Oracle: String =
    """WITH counts AS (
      |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
      |top10 AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS top10_rows FROM (
      |    SELECT n FROM counts ORDER BY n DESC, user_id LIMIT 10)),
      |prof AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
      |         max(n) AS max_key_rows
      |  FROM counts)
      |SELECT n_rows, n_keys, max_key_rows,
      |       (1000 * max_key_rows) // n_rows AS top1_permille,
      |       (1000 * top10_rows) // n_rows AS top10_permille,
      |       CAST(32 * max_key_rows >= n_rows AS INT) AS skew_flag
      |FROM prof, top10""".stripMargin

  // ---- q48: funnel analysis (ordered event-sequence matching) -------------

  /** Sequenced funnel: how many users VIEW, then CLICK after that
    * view, then PURCHASE after that click — order matters, so each
    * stage anchors on the previous stage's position, not mere
    * co-occurrence. Three aggregates all shuffled on the SAME key
    * (user_id), so a cluster co-partitions the whole funnel after one
    * exchange; each stage is a conditional min over a filtered scan,
    * and the final rollup is a count of non-nulls — no window with an
    * unbounded frame, no self-join explosion.
    */
  private def q48Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val v = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("event_id"))).as("v_pos"))
    val c = ev.join(v, Seq("user_id"))
      .groupBy("user_id", "v_pos")
      .agg(min(when(col("event_type") === "click" && col("event_id") > col("v_pos"),
        col("event_id"))).as("c_pos"))
    val p = ev.join(c, Seq("user_id"))
      .groupBy("user_id", "v_pos", "c_pos")
      .agg(min(when(col("event_type") === "purchase" && col("event_id") > col("c_pos"),
        col("event_id"))).as("p_pos"))
    p.agg(
      count(lit(1)).as("n_users"),
      sum(col("v_pos").isNotNull.cast("long")).as("n_view"),
      sum(col("c_pos").isNotNull.cast("long")).as("n_view_click"),
      sum(col("p_pos").isNotNull.cast("long")).as("n_full_funnel"))
  }

  private val q48Oracle: String =
    """WITH v AS (
      |  SELECT user_id,
      |         min(CASE WHEN event_type = 'view' THEN event_id END) AS v_pos
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, v.v_pos,
      |         min(CASE WHEN e.event_type = 'click' AND e.event_id > v.v_pos
      |                  THEN e.event_id END) AS c_pos
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  GROUP BY e.user_id, v.v_pos),
      |p AS (
      |  SELECT e.user_id, c.v_pos, c.c_pos,
      |         min(CASE WHEN e.event_type = 'purchase' AND e.event_id > c.c_pos
      |                  THEN e.event_id END) AS p_pos
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  GROUP BY e.user_id, c.v_pos, c.c_pos)
      |SELECT count(*) AS n_users,
      |       CAST(sum(CASE WHEN v_pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |       CAST(sum(CASE WHEN c_pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
      |       CAST(sum(CASE WHEN p_pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      |FROM p""".stripMargin

  // ---- q52: hierarchy closure (recursive CTE, Spark-style) -----------------

  /** Hierarchical rollup — the recursive-CTE capability class (org
    * charts, bill-of-materials, category trees) that Spark SQL lacks
    * natively. The customer keys form a synthetic tree
    * (`parent(c) = (c−1) DIV 2`, root 0), and every node's (root,
    * depth) is computed by POINTER DOUBLING: each round every node's
    * pointer jumps to its pointer's pointer, accumulating distance,
    * so convergence takes O(log depth) self-joins instead of O(depth)
    * — 5 rounds cover depth ≤ 32. This is the
    * d7 connected-components technique applied to ancestry, and the
    * ONLY shape that survives deep hierarchies at scale: the naive
    * iterate-one-level loop is a full shuffle per LEVEL, the doubling
    * loop a shuffle per log(level). The oracle walks the same tree
    * with DuckDB's `WITH RECURSIVE` — declarative recursion checked
    * against log-step iteration.
    *
    * Per round: one self-join of the (node, ptr, dist) frame keyed on
    * the pointer — N-row sides, keyed exchange, no growth (the frame
    * never exceeds one row per node, unlike an ancestor-pair closure
    * which is N·depth).
    */
  private def q52Hierarchy(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
    var ptr = cust.select(
      col("c_custkey").as("node"),
      when(col("c_custkey") > 0, expr("(c_custkey - 1) DIV 2")).otherwise(0L).as("ptr"),
      when(col("c_custkey") > 0, 1L).otherwise(0L).as("dist"))
    // 5 doubling rounds: after round k every pointer has jumped up to
    // 2^k edges (or parked at the root, whose self-loop adds 0) —
    // 32 edges covers 4-billion-node binary trees, and the 10× stress
    // corpus is already 17 deep (4 rounds would silently truncate it)
    (1 to 5).foreach { _ =>
      val hop = ptr.select(col("node").as("p_node"),
        col("ptr").as("p_ptr"), col("dist").as("p_dist"))
      ptr = ptr.join(hop, col("ptr") === col("p_node"))
        .select(col("node"), col("p_ptr").as("ptr"),
          (col("dist") + col("p_dist")).as("dist"))
        .localCheckpoint(true) // pin each round; 5 rounds, not one 32-join plan
    }
    // convergence check: every pointer must have parked at the root.
    // A corpus deeper than 2^5 = 32 would otherwise TRUNCATE depths
    // silently; failing loudly here is one ≤8-byte aggregate on a
    // frame that is already checkpointed (no recompute).
    val maxPtr = ptr.agg(max(col("ptr"))).head().getLong(0)
    require(maxPtr == 0L,
      s"hierarchy deeper than 32 levels (max residual ptr $maxPtr): add doubling rounds")
    ptr.join(cust, col("node") === col("c_custkey"))
      .groupBy(col("dist").as("depth"))
      .agg(count(lit(1)).as("n_nodes"),
        Exact.dsum(col("c_acctbal")).as("sum_acctbal"),
        min(col("node")).as("min_node"), max(col("node")).as("max_node"))
      .orderBy("depth")
  }

  private val q52Oracle: String =
    """WITH RECURSIVE walk(node, anc, d) AS (
      |  SELECT c_custkey, CAST((c_custkey - 1) // 2 AS BIGINT), CAST(1 AS BIGINT)
      |  FROM customer WHERE c_custkey > 0
      |  UNION ALL
      |  SELECT node, CAST((anc - 1) // 2 AS BIGINT), d + 1 FROM walk WHERE anc > 0),
      |depths AS (
      |  SELECT node, d AS depth FROM walk WHERE anc = 0
      |  UNION ALL
      |  SELECT c_custkey, CAST(0 AS BIGINT) FROM customer WHERE c_custkey = 0)
      |SELECT depth, count(*) AS n_nodes,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal,
      |       min(node) AS min_node, max(node) AS max_node
      |FROM depths JOIN customer ON c_custkey = node
      |GROUP BY depth ORDER BY depth""".stripMargin

  // ---- q53: exact quantiles via histogram narrowing (no global sort) -------

  /** EXACT order statistics (p50/p90/p99 of l_extendedprice) without a
    * global sort: pass 1 takes (n, min, max); pass 2 histograms the
    * column into B = 1024 equi-width buckets (one map-side-combined
    * agg, ≤B output rows to the driver — control-plane); the driver
    * locates, per target rank, the bucket containing it; pass 3 ranks
    * ONLY those buckets' rows (≈ targets/B of the data) and picks the
    * residual rank. q25 is the engine-native `percentile` (exact, but
    * it collects each group's values); this is the shape that survives
    * 100 TB — three fully-parallel scans, and the only sort touches
    * ~0.1% of the rows. Pathological skew (one bucket holding most of
    * the mass) would recurse the same narrowing inside the bucket;
    * one level suffices here and the recursion adds nothing to the
    * contract.
    *
    * Rank definition: k_p = ceil(p·n/100) = (p·n + 99) DIV 100, the
    * k-th smallest (1-based). The oracle computes the same k-th
    * smallest by brute-force window over the full sort — the
    * histogram machinery must reproduce the sorted answer exactly,
    * which is the point of the gate. Bucket ids are doubles
    * Spark-side only (never compared with the oracle); membership in
    * passes 2 and 3 uses the IDENTICAL expression, so the narrowing
    * is self-consistent, and the k-th value of a multiset is
    * tie-permutation-independent.
    */
  private def q53ExactQuantile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nBuckets = 1024
    val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("v"))
    val head = li.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    val (n, lo, hi) = (head.getLong(0), head.getDouble(1), head.getDouble(2))
    val pcts = Seq(50, 90, 99)
    if (hi == lo) // degenerate: every rank answers the single value
      return pcts.map(p => (p, (p.toLong * n + 99) / 100, n, lo))
        .toDF("pct", "k", "n", "value").orderBy("pct")
    val w = (hi - lo) / nBuckets
    val bucketCol =
      least(floor((col("v") - lit(lo)) / lit(w)), lit(nBuckets - 1)).cast("int")
    val hist = li.groupBy(bucketCol.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val cums = hist.scanLeft(0L)(_ + _._2) // cums(i) = rows before hist(i)
    val targets = pcts.map { p =>
      val k = (p.toLong * n + 99) / 100
      val idx = cums.indexWhere(_ >= k) - 1 // first prefix ≥ k closes bucket idx
      (p, k, hist(idx)._1, k - cums(idx))
    }
    val tdf = targets.toDF("pct", "k", "b", "j")
    val cand = li.withColumn("b", bucketCol)
      .join(broadcast(tdf.select(col("b")).distinct()), "b")
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("b")).orderBy(col("v"))))
    cand.join(broadcast(tdf), Seq("b"))
      .filter(col("rn") === col("j"))
      .select(col("pct"), col("k"), lit(n).as("n"), col("v").as("value"))
      .orderBy("pct")
  }

  /** Brute force on purpose: the full-sort k-th smallest the narrowing
    * plan must reproduce exactly.
    */
  private val q53Oracle: String =
    """WITH v AS (SELECT l_extendedprice AS v FROM lineitem),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      |t AS (SELECT unnest([50, 90, 99]) AS pct),
      |ks AS (SELECT t.pct, (t.pct * nn.n + 99) // 100 AS k, nn.n FROM t, nn),
      |o AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v)
      |SELECT ks.pct, ks.k, ks.n, o.v AS value
      |FROM ks JOIN o ON o.rn = ks.k ORDER BY ks.pct""".stripMargin

  // ---- q54: PageRank over the customer–supplier trade graph ----------------

  /** Supplier node ids offset past the customer key space. */
  private val PrSuppBase = 1000000L

  /** PageRank iterations — fixed, unrolled identically in the oracle. */
  private val PrRounds = 5

  /** Total scaled rank mass: r sums to ~10¹² across nodes. */
  private val PrMass = 1000000000000L

  /** Graph centrality — PageRank (Page et al. 1999) over the
    * customer↔supplier trade graph (distinct (o_custkey, l_suppkey)
    * pairs, one edge each way), the link-analysis capability class
    * (host authority for crawl prioritization, entity importance)
    * no other operator here covers. d7/q52 answer CONNECTIVITY by
    * pointer doubling; PageRank is the spectral question — a fixed
    * power-iteration round count, each round one edge-keyed join +
    * one dst-keyed aggregate. Arithmetic is integer-scaled throughout
    * (rank mass [[PrMass]] ≈ 10¹², damping 85/100, every division a
    * floor DIV) so both engines produce bit-identical ranks — the t32
    * discipline; production would run doubles and loosen the gate to
    * tolerance. Bidirectionality means every node has out-degree ≥ 1:
    * no dangling-mass term, and every node receives mass every round.
    *
    * Scale shape: the edge list (with out-degree folded in) is built
    * once and pinned; each round shuffles the N-row rank frame on the
    * join key and the edge frame on dst — no growth, no all-pairs,
    * O(log-free) fixed rounds. The node count is the only driver
    * scalar (control plane). At 100 TB the edge list is the big side:
    * it stays partition-stable across rounds (one partitioner, reused
    * exchange) while the rank frame streams past it — the classic
    * distributed power-iteration layout.
    */
  private def q54PageRank(s: SparkSession, d: String): DataFrame = {
    // the distinct is the expensive leg — pin it ONCE; everything
    // downstream (edges, degrees, init ranks, the final join) derives
    // from the pinned frame instead of re-running the join+distinct
    val pairs = prPairs(s, d).localCheckpoint(true)
    val edges = prEdges(pairs)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true) // N rows — the loop and the final join reread it
    // out-degree folded into the edge list once. The edge side's
    // one-exchange-per-query contract comes from EXCHANGE REUSE, not a
    // pinned artifact: because the round loop below builds ONE lazy
    // plan (no per-round pin), every round's join plans the identical
    // edge-side exchange and Spark dedups them into a single
    // materialized shuffle (ReusedExchange) — probed round-21 after
    // two pinned variants measured worse here: a localCheckpoint pin
    // records UnknownPartitioning under AQE (so every round
    // re-exchanged anyway — the PlanAuditSpec round-body contract
    // caught it), and a persist() pin exposes its layout but pays a
    // ~0.9 s columnar cache build at this SF and re-broadcasts per
    // round once per-round pins split the plan. One plan + reuse gives
    // the scale shape for free: the edge table shuffles once per
    // QUERY; each round adds only its N-row rank exchange and the
    // dst-keyed rollup. The lazy checkpoint is the barrier that lets
    // rounds share ONE materialized edge frame instead of re-merging
    // edges⋈deg from the two reused upstream shuffles per round.
    val edgesDeg = edges.join(deg, "src").localCheckpoint(false)
    val n = deg.count() // every node sources an edge (bidirectional)
    val teleport = (15L * PrMass) / (100L * n)
    var ranks = deg.select(col("src").as("node"), lit(PrMass / n).as("r"))
    (1 to PrRounds).foreach { _ =>
      // NO per-round pin: the whole round chain stays ONE lazy plan,
      // so the edge-side exchange is planned once and REUSED across
      // every round (a per-round localCheckpoint forced one physical
      // plan per round — one edge exchange+sort EACH); the rank
      // lineage is linear in rounds (each round references ranks
      // once), so the plan stays Catalyst-sized at PrRounds depth
      ranks = prRound(edgesDeg, ranks, teleport)
    }
    ranks.join(deg, col("node") === col("src"))
      .select(col("node").as("node_id"), col("deg").as("out_deg"), col("r").as("rank"))
      .orderBy("node_id")
  }

  /** Distinct trading pairs — exposed (pre-checkpoint) for the audit. */
  private[ops] def prPairs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
      .distinct()

  /** Both edge directions off the pinned pair list — row-local. */
  private[ops] def prEdges(pairs: DataFrame): DataFrame =
    pairs.select(col("c").as("src"), (col("sk") + PrSuppBase).as("dst"))
      .union(pairs.select((col("sk") + PrSuppBase).as("src"), col("c").as("dst")))

  /** One power-iteration round — exposed (pre-checkpoint) so the plan
    * audit can pin its shape: an edge-keyed join, a dst-keyed
    * map-side-combinable aggregate, nothing else.
    */
  private[ops] def prRound(edgesDeg: DataFrame, ranks: DataFrame,
      teleport: Long): DataFrame =
    edgesDeg
      .join(ranks, col("src") === col("node"))
      .select(col("dst"), expr("r DIV deg").as("contrib"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("contrib")).as("insum"))
      .select(col("node"),
        (lit(teleport) + expr("(85 * insum) DIV 100")).as("r"))

  private val q54Oracle: String = {
    val rounds = (1 to PrRounds).map { k =>
      s"""r$k AS MATERIALIZED (
         |  SELECT t.node, tp.t + (85 * t.insum) // 100 AS r
         |  FROM (SELECT e.dst AS node, CAST(sum(p.r // e.deg) AS BIGINT) AS insum
         |        FROM edges e JOIN r${k - 1} p ON p.node = e.src
         |        GROUP BY e.dst) t, tp)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
       |e0 AS (
       |  SELECT c AS src, sk + $PrSuppBase AS dst FROM pairs
       |  UNION ALL
       |  SELECT sk + $PrSuppBase AS src, c AS dst FROM pairs),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY src),
       |edges AS MATERIALIZED (
       |  SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg ON deg.src = e0.src),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
       |tp AS (SELECT CAST((15 * $PrMass) // (100 * n) AS BIGINT) AS t FROM nn),
       |r0 AS MATERIALIZED (
       |  SELECT src AS node, CAST($PrMass // n AS BIGINT) AS r FROM deg, nn),
       |$rounds
       |SELECT d.src AS node_id, d.deg AS out_deg, CAST(p.r AS BIGINT) AS rank
       |FROM r$PrRounds p JOIN deg d ON d.src = p.node
       |ORDER BY node_id""".stripMargin
  }

  // ---- q59: incremental PageRank maintenance (the cdc × q54 weld) ----------

  /** Orders placed before this date build the STANDING graph; later
    * orders arrive as the change feed's insert half.
    */
  private val PrCutoff = "2000-01-01"

  /** Standing-pair delete slice — the change feed's delete half. */
  private[ops] val PrDelMod = 53L
  private[ops] val PrDelRem = 6L

  /** [[prPairs]] restricted to an order predicate — the slice the
    * standing graph and the insert feed are each built from.
    */
  private[ops] def prPairsWhere(s: SparkSession, d: String,
      cond: org.apache.spark.sql.Column): DataFrame =
    Tables.orders(s, d).filter(cond)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
      .distinct()

  /** The incremental half of q59, factored for the plan audit and the
    * spec's incremental==full check: given the PINNED standing state
    * (degree-folded adjacency, degree table) and the change
    * batch (`ins` pairs admitted as never-seen, `dels` ⊆ standing),
    * maintain the graph without rebuilding it. Scale shape:
    *  - the degree delta is a DELTA-sized aggregate; the new degree
    *    table is one src-keyed resolve of the N-row degree frame —
    *    the same frame every power round shuffles anyway, so
    *    maintenance adds no new scale term (a production run with a
    *    STORED degree table does the broadcast upsert instead);
    *  - the EDGE table — the 100 TB side — never shuffles: untouched
    *    adjacency survives through a broadcast anti-join on the
    *    touched-node set, and only the touched slice (delta-bounded)
    *    is rebuilt, its joins all broadcast.
    * Returns (edgesDeg, deg) for the perturbed graph, both pinned.
    */
  private[ops] def q59MaintainGraph(edgesDeg0: DataFrame,
      deg0: DataFrame, ins: DataFrame, dels: DataFrame,
      pin: Boolean = true): (DataFrame, DataFrame) = {
    // `pin` pins the reused intermediates (LAZILY — the t40 trick: the
    // materialization rides the first consuming job instead of costing
    // a barrier each); the plan audit passes false so the whole
    // derivation stays one inspectable tree
    def cp(df: DataFrame) = if (pin) df.localCheckpoint(false) else df
    // net degree movement per endpoint; groupBy keeps dw=0 rows, so
    // this frame's key set IS the touched-node set (every endpoint of
    // an inserted or deleted pair, both edge directions)
    val degDelta = cp(prEdges(ins).select(col("src"), lit(1L).as("w"))
      .unionByName(prEdges(dels).select(col("src"), lit(-1L).as("w")))
      .groupBy("src").agg(sum(col("w")).as("dw")))
    val touched = cp(degDelta.select("src"))
    // degree resolve: standing + delta, drop drained nodes (all edges
    // deleted), admit new endpoints — one keyed exchange of the
    // rank-frame-sized table
    val deg1 = cp(deg0.join(degDelta, Seq("src"), "full")
      .select(col("src"),
        (coalesce(col("deg"), lit(0L)) + coalesce(col("dw"), lit(0L))).as("deg"))
      .filter(col("deg") > 0))
    val deg1T = cp(deg1.join(broadcast(touched), Seq("src"), "left_semi"))
    // ^ delta-bounded: degrees of touched nodes only
    // touched adjacency rebuilt: surviving standing edges of touched
    // sources (semi on the broadcast touched set, anti on the
    // broadcast deleted-edge set) plus the inserted edges, re-keyed
    // to the new degrees — every join broadcast, delta-bounded output
    val rebuilt = edgesDeg0.select(col("src"), col("dst"))
      .join(broadcast(touched), Seq("src"), "left_semi")
      .join(broadcast(prEdges(dels)), Seq("src", "dst"), "left_anti")
      .unionByName(prEdges(ins))
      .join(broadcast(deg1T), Seq("src"))
    // untouched adjacency survives verbatim — the standing edge table
    // is scanned, never shuffled
    val edgesDeg1 = cp(edgesDeg0
      .join(broadcast(touched), Seq("src"), "left_anti")
      .unionByName(rebuilt))
    (edgesDeg1, deg1)
  }

  /** Incremental PageRank maintenance — the thrice-asked cdc × q54
    * weld. A change batch perturbs the trade graph (deletes: the
    * [[PrDelMod]] modulus slice of standing pairs; inserts: pairs
    * first traded after [[PrCutoff]], admitted through the never-seen
    * dedup gate), the graph is maintained INCREMENTALLY
    * ([[q59MaintainGraph]] — the edge table never shuffles), and the
    * power iteration WARM-STARTS from the standing rank vector
    * instead of re-running from scratch.
    *
    * Convergence claim, stated honestly: the integer-floor iteration
    * has NO exact fixed point in general — measured on this fixture,
    * a from-uniform run lands in a 2-cycle after ~113 rounds and a
    * warm run reaches a fixed point up to ~33 scaled units away
    * (floor-quantization noise, ~3·10⁻¹¹ of the mass) — so the gate
    * pins what IS exact: after the same [[PrRounds]]-round budget on
    * the SAME maintained graph, the warm iterate's residual
    * ‖T(r)−r‖₁ (distance-to-fixed-point witness, one extra round) is
    * strictly smaller than the from-scratch iterate's — measured
    * 2.3× smaller at sf0.001/0.01/0.1 — with BOTH iterates, BOTH
    * per-node residuals, and the maintained out-degrees riding every
    * output row of the DuckDB oracle, which rebuilds the perturbed
    * graph from scratch and replays both trajectories exactly.
    * `rank_cold` is literally q54 re-run on the perturbed graph, so
    * the row-level claim is "the incrementally-maintained graph is
    * bit-identical to a rebuild, and here is the warm-start dividend
    * on it".
    *
    * Scale: the standing build is q54's (one distinct + 5 rounds);
    * maintenance is delta-broadcast ([[q59MaintainGraph]]); each
    * round shuffles only the N-row rank frame against the pinned
    * edge list. At 100 TB the standing pairs/degrees/ranks are
    * STORED artifacts (the p8 stance — built in-gate to stay
    * self-contained) and the whole gate costs one delta pass plus
    * 2·[[PrRounds]]+2 rank-frame rounds.
    */
  /** One power round advancing the warm AND cold vectors together —
    * one edge join, one dst rollup, two running columns. The cold leg
    * exists only as q54-from-scratch's comparison point, so it rides
    * the warm leg's join for free instead of doubling the round jobs.
    */
  private[ops] def prRound2(edgesDeg: DataFrame, ranks: DataFrame,
      teleport: Long): DataFrame =
    edgesDeg
      .join(ranks, col("src") === col("node"))
      .select(col("dst"),
        expr("rw DIV deg").as("cw"), expr("rc DIV deg").as("cc"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("cw")).as("iw"), sum(col("cc")).as("ic"))
      .select(col("node"),
        (lit(teleport) + expr("(85 * iw) DIV 100")).as("rw"),
        (lit(teleport) + expr("(85 * ic) DIV 100")).as("rc"))

  private def q59PagerankMaint(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit(PrCutoff).cast("timestamp")
    // standing state: pair first-trade dates, degree table,
    // degree-folded edges, ranks after the q54 round budget — STORED
    // artifacts, now literally (the p8 stance the doc commits to): a
    // production deployment maintains a standing PageRank against
    // warehouse tables, it does not rebuild the graph and re-converge
    // from scratch per change batch. Built once per JVM
    // ([[graft.IndexSeed.shared]] — deterministic integer arithmetic,
    // so reading the store is bit-identical to rebuilding), read-only
    // thereafter: the gate's own cost is what it claims — the delta
    // maintenance plus the warm/cold round budget.
    val st = graft.IndexSeed.shared(s"q59-standing|$d") { dir =>
      // ONE pass derives both feed halves: per trading pair, the date
      // it FIRST traded — standing pairs are those first seen before
      // the cutoff, and the insert feed is exactly the never-seen
      // pairs (first traded after), so the admission anti-join q54's
      // two-slice formulation would need is free
      val ft = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .agg(min(col("o_orderdate")).as("first_traded"))
        .localCheckpoint(true)
      ft.write.mode("overwrite").parquet(s"$dir/first_traded")
      val pairs0 = ft.filter(col("first_traded") < cutoff).select("c", "sk")
      val deg0 = prEdges(pairs0).groupBy("src").agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      deg0.write.mode("overwrite").parquet(s"$dir/deg0")
      val edgesDeg0 = prEdges(pairs0).join(deg0, "src").localCheckpoint(true)
      edgesDeg0.write.mode("overwrite").parquet(s"$dir/edges_deg0")
      val n0 = deg0.count()
      val t0 = (15L * PrMass) / (100L * n0)
      // the build's round loop rides the q54 one-plan exchange reuse:
      // no per-round pin, so the write below plans all PrRounds rounds
      // as ONE job tree whose identical edge-side exchanges dedup
      var standing = deg0.select(col("src").as("node"), lit(PrMass / n0).as("r"))
      (1 to PrRounds).foreach { _ =>
        standing = prRound(edgesDeg0, standing, t0)
      }
      standing.write.mode("overwrite").parquet(s"$dir/standing")
    }
    val firstTraded = s.read.parquet(s"$st/first_traded")
    val pairs0 = firstTraded.filter(col("first_traded") < cutoff)
      .select("c", "sk")
    val deg0 = s.read.parquet(s"$st/deg0")
    val edgesDeg0 = s.read.parquet(s"$st/edges_deg0")
    val standing = s.read.parquet(s"$st/standing")
    // the change batch — delta-bounded both halves
    val dels = pairs0
      .filter((col("c") * 31 + col("sk")) % PrDelMod === PrDelRem)
      .localCheckpoint(true)
    val ins = firstTraded.filter(col("first_traded") >= cutoff)
      .select("c", "sk")
      .localCheckpoint(true)
    val (edgesDeg1Raw, deg1) = q59MaintainGraph(edgesDeg0, deg0, ins, dels)
    // the maintained edge list reuses its exchange the q54 way: the
    // warm/cold loop and the residual witness below stay ONE lazy
    // plan, so the edge side shuffles once for the whole maintenance
    // query and each round adds only the rank frame + the dst rollup.
    val edgesDeg1 = edgesDeg1Raw.localCheckpoint(false)
    val n1 = deg1.count()
    val t1 = (15L * PrMass) / (100L * n1)
    // warm start: standing ranks carried forward (new nodes seeded at
    // the uniform init, drained nodes dropped with their degree row);
    // cold start: q54's own from-scratch init on the same graph. Both
    // vectors advance through the SAME round job (prRound2)
    var r2 = deg1.join(standing, col("src") === col("node"), "left")
      .select(col("src").as("node"),
        coalesce(col("r"), lit(PrMass / n1)).as("rw"),
        lit(PrMass / n1).as("rc"))
    (1 to PrRounds).foreach { _ =>
      r2 = prRound2(edgesDeg1, r2, t1) // one plan — see the q54 note
    }
    // residual witness: ONE more application of the round map —
    // |T(r) − r| per node, exact in both engines
    val r2next = prRound2(edgesDeg1, r2, t1)
      .select(col("node").as("node_id"),
        col("rw").as("rw1"), col("rc").as("rc1"))
    val out = deg1.select(col("src").as("node_id"), col("deg").as("out_deg"))
      .join(r2.select(col("node").as("node_id"),
        col("rw").as("rank_warm"), col("rc").as("rank_cold")), "node_id")
      .join(r2next, "node_id")
      .select(col("node_id"), col("out_deg"), col("rank_warm"), col("rank_cold"),
        abs(col("rw1") - col("rank_warm")).as("res_warm"),
        abs(col("rc1") - col("rank_cold")).as("res_cold"))
      .localCheckpoint(false) // lazy: materializes under the sums agg

    // the convergence claim, enforced in-gate: warm-start must sit
    // strictly closer to the perturbed graph's fixed point than the
    // from-scratch run at the same round budget
    val sums = out.agg(sum(col("res_warm")), sum(col("res_cold"))).head
    require(sums.getLong(0) < sums.getLong(1),
      s"warm start did not dominate: residual ${sums.getLong(0)} >= ${sums.getLong(1)}")
    out.orderBy("node_id")
  }

  /** Unrolled integer power rounds r{p}1..r{p}k over `edges`
    * (src, dst, deg) with teleport table tp{p}, from a given r{p}0.
    */
  private def prRoundsSql(p: String, edges: String, k: Int): String =
    (1 to k).map { i =>
      s"""r$p$i AS MATERIALIZED (
         |  SELECT t.node, tp$p.t + (85 * t.insum) // 100 AS r
         |  FROM (SELECT e.dst AS node, CAST(sum(q.r // e.deg) AS BIGINT) AS insum
         |        FROM $edges e JOIN r$p${i - 1} q ON q.node = e.src
         |        GROUP BY e.dst) t, tp$p)""".stripMargin
    }.mkString(",\n")

  private val q59Oracle: String =
    s"""WITH p0 AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |  WHERE o.o_orderdate < TIMESTAMP '$PrCutoff'),
       |dels AS MATERIALIZED (
       |  SELECT c, sk FROM p0 WHERE (c * 31 + sk) % $PrDelMod = $PrDelRem),
       |ins AS MATERIALIZED (
       |  SELECT c, sk FROM (
       |    SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sk
       |    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |    WHERE o.o_orderdate >= TIMESTAMP '$PrCutoff') pn
       |  WHERE NOT EXISTS (SELECT 1 FROM p0 WHERE p0.c = pn.c AND p0.sk = pn.sk)),
       |p1 AS MATERIALIZED (
       |  SELECT c, sk FROM p0
       |  WHERE NOT EXISTS (SELECT 1 FROM dels d WHERE d.c = p0.c AND d.sk = p0.sk)
       |  UNION ALL SELECT c, sk FROM ins),
       |e0 AS (SELECT c AS src, sk + $PrSuppBase AS dst FROM p0
       |       UNION ALL SELECT sk + $PrSuppBase AS src, c AS dst FROM p0),
       |deg0 AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY src),
       |edges0 AS MATERIALIZED (
       |  SELECT e0.src, e0.dst, deg0.deg FROM e0 JOIN deg0 USING (src)),
       |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg0),
       |tpB AS (SELECT CAST((15 * $PrMass) // (100 * n) AS BIGINT) AS t FROM n0),
       |rB0 AS MATERIALIZED (
       |  SELECT src AS node, CAST($PrMass // n AS BIGINT) AS r FROM deg0, n0),
       |${prRoundsSql("B", "edges0", PrRounds)},
       |e1 AS (SELECT c AS src, sk + $PrSuppBase AS dst FROM p1
       |       UNION ALL SELECT sk + $PrSuppBase AS src, c AS dst FROM p1),
       |deg1 AS MATERIALIZED (
       |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e1 GROUP BY src),
       |edges1 AS MATERIALIZED (
       |  SELECT e1.src, e1.dst, deg1.deg FROM e1 JOIN deg1 USING (src)),
       |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg1),
       |tpW AS (SELECT CAST((15 * $PrMass) // (100 * n) AS BIGINT) AS t FROM n1),
       |tpC AS (SELECT t FROM tpW),
       |rW0 AS MATERIALIZED (
       |  SELECT d.src AS node, CAST(COALESCE(b.r, $PrMass // n1.n) AS BIGINT) AS r
       |  FROM deg1 d CROSS JOIN n1 LEFT JOIN rB$PrRounds b ON b.node = d.src),
       |rC0 AS MATERIALIZED (
       |  SELECT src AS node, CAST($PrMass // n AS BIGINT) AS r FROM deg1, n1),
       |${prRoundsSql("W", "edges1", PrRounds + 1)},
       |${prRoundsSql("C", "edges1", PrRounds + 1)}
       |SELECT d.src AS node_id, d.deg AS out_deg,
       |       w.r AS rank_warm, c.r AS rank_cold,
       |       CAST(abs(w1.r - w.r) AS BIGINT) AS res_warm,
       |       CAST(abs(c1.r - c.r) AS BIGINT) AS res_cold
       |FROM deg1 d
       |JOIN rW$PrRounds w ON w.node = d.src
       |JOIN rC$PrRounds c ON c.node = d.src
       |JOIN rW${PrRounds + 1} w1 ON w1.node = d.src
       |JOIN rC${PrRounds + 1} c1 ON c1.node = d.src
       |ORDER BY node_id""".stripMargin

  // ---- q55: data-quality audit (Deequ-shaped constraint checks) ------------

  /** Declarative data-quality audit — the Deequ/Great-Expectations
    * capability class (constraint checks an ingestion pipeline runs
    * before promoting a batch): referential integrity, primary-key
    * uniqueness, null keys, and value-range rules, each reported as
    * (check, table, rows checked, violations). The clean fixture
    * would make every count zero — a gate that can't tell a working
    * audit from a dead one — so the audited frames carry PLANTED
    * violations (the s24/t38 fixture-plant discipline, replicated as
    * VALUES in the oracle): one dangling customer key, one duplicated
    * order key, one NULL key, one dangling lineitem order, one
    * negative quantity, one negative price. The audit must count
    * exactly the plants — firing on each class, zero false positives
    * on the 60k real rows around them.
    *
    * Scale shape: the two range/null checks are single-scan
    * conditional aggregates (map-side combined to one row); PK
    * uniqueness is one key-keyed rollup; each FK check is one join
    * keyed on the foreign key where the dim side broadcasts when
    * small (AQE's call here — customer at 100 TB would be the
    * bucketed-join q45 shape). Nothing driver-side, nothing
    * all-pairs; checks share scans where they share tables.
    */
  private def q55DqAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val po = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .union(Seq(
        (900000001L, Some(888888888L)), // dangling FK
        (900000002L, Some(1L)), (900000002L, Some(1L)), // duplicated PK
        (900000003L, None: Option[Long]) // NULL key
      ).toDF("o_orderkey", "o_custkey"))
    val pl = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .union(Seq(
        (888888888L, 10.0, 100.0), // dangling FK
        (1L, -5.0, 100.0), // quantity out of range
        (1L, 10.0, -1.0) // negative price
      ).toDF("l_orderkey", "l_quantity", "l_extendedprice"))
    val cust = Tables.customer(s, d).select(col("c_custkey"))
    val nPo = po.select(count(lit(1)).as("checked"))
    val nPl = pl.select(count(lit(1)).as("checked"))
    def report(name: String, tbl: String, checked: DataFrame,
        viol: org.apache.spark.sql.Column, from: DataFrame): DataFrame =
      from.agg(viol.as("violations")).crossJoin(checked)
        .select(lit(name).as("check_name"), lit(tbl).as("tbl"),
          col("checked"), col("violations"))
    val fkOrders = report("fk_orders_customer", "orders", nPo,
      sum(when(col("c_custkey").isNull, 1L).otherwise(0L)),
      po.filter(col("o_custkey").isNotNull)
        .join(cust, col("c_custkey") === col("o_custkey"), "left"))
    val nullKey = report("null_custkey", "orders", nPo,
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)), po)
    val dupPk = report("pk_dup_orders", "orders", nPo,
      sum(col("extra")),
      po.groupBy("o_orderkey").agg((count(lit(1)) - 1L).as("extra")))
    val fkLine = report("fk_lineitem_orders", "lineitem", nPl,
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)),
      pl.join(po.select(col("o_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left"))
    val rangeQty = report("range_quantity", "lineitem", nPl,
      sum(when(col("l_quantity") <= 0.0 || col("l_quantity") > 50.0, 1L).otherwise(0L)), pl)
    val negPrice = report("neg_price", "lineitem", nPl,
      sum(when(col("l_extendedprice") <= 0.0, 1L).otherwise(0L)), pl)
    fkOrders.union(nullKey).union(dupPk).union(fkLine).union(rangeQty).union(negPrice)
      .orderBy("check_name")
  }

  private val q55Oracle: String =
    """WITH po AS (
      |  SELECT o_orderkey, o_custkey FROM orders
      |  UNION ALL
      |  SELECT * FROM (VALUES
      |    (CAST(900000001 AS BIGINT), CAST(888888888 AS BIGINT)),
      |    (CAST(900000002 AS BIGINT), CAST(1 AS BIGINT)),
      |    (CAST(900000002 AS BIGINT), CAST(1 AS BIGINT)),
      |    (CAST(900000003 AS BIGINT), CAST(NULL AS BIGINT))) v(o_orderkey, o_custkey)),
      |pl AS (
      |  SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT * FROM (VALUES
      |    (CAST(888888888 AS BIGINT), CAST(10.0 AS DOUBLE), CAST(100.0 AS DOUBLE)),
      |    (CAST(1 AS BIGINT), CAST(-5.0 AS DOUBLE), CAST(100.0 AS DOUBLE)),
      |    (CAST(1 AS BIGINT), CAST(10.0 AS DOUBLE), CAST(-1.0 AS DOUBLE)))
      |    v(l_orderkey, l_quantity, l_extendedprice)),
      |npo AS (SELECT CAST(count(*) AS BIGINT) AS checked FROM po),
      |npl AS (SELECT CAST(count(*) AS BIGINT) AS checked FROM pl)
      |SELECT * FROM (
      |  SELECT 'fk_orders_customer' AS check_name, 'orders' AS tbl, npo.checked,
      |         CAST((SELECT count(*) FROM po LEFT JOIN customer ON c_custkey = o_custkey
      |               WHERE o_custkey IS NOT NULL AND c_custkey IS NULL) AS BIGINT) AS violations
      |  FROM npo
      |  UNION ALL
      |  SELECT 'null_custkey', 'orders', npo.checked,
      |         CAST((SELECT count(*) FROM po WHERE o_custkey IS NULL) AS BIGINT) FROM npo
      |  UNION ALL
      |  SELECT 'pk_dup_orders', 'orders', npo.checked,
      |         CAST((SELECT sum(c - 1) FROM (SELECT count(*) AS c FROM po GROUP BY o_orderkey)) AS BIGINT)
      |  FROM npo
      |  UNION ALL
      |  SELECT 'fk_lineitem_orders', 'lineitem', npl.checked,
      |         CAST((SELECT count(*) FROM pl LEFT JOIN (SELECT DISTINCT o_orderkey FROM po) o
      |               ON o.o_orderkey = pl.l_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT)
      |  FROM npl
      |  UNION ALL
      |  SELECT 'range_quantity', 'lineitem', npl.checked,
      |         CAST((SELECT count(*) FROM pl WHERE l_quantity <= 0 OR l_quantity > 50) AS BIGINT)
      |  FROM npl
      |  UNION ALL
      |  SELECT 'neg_price', 'lineitem', npl.checked,
      |         CAST((SELECT count(*) FROM pl WHERE l_extendedprice <= 0) AS BIGINT) FROM npl)
      |ORDER BY check_name""".stripMargin

  // ---- q56: time-series densification + forward fill -----------------------

  /** Gap filling — the time-series capability class (TimescaleDB's
    * `time_bucket_gapfill` + `locf`) Spark has no native operator
    * for: densify each customer's monthly order series onto the
    * corpus-wide month calendar and forward-fill the last observed
    * monthly spend across the gaps. Money rides as integer cents
    * (`floor(o_totalprice · 100)` — the embedding-quantization trick,
    * exact in both engines); `is_gap` marks synthesized rows so
    * downstream consumers can tell carried values from observed ones.
    *
    * Scale shape: the monthly rollup is the only corpus-sized
    * exchange (keyed on customer × month); the calendar bounds are
    * one 2-value driver scalar (control plane); densification is a
    * row-local `sequence` explode over the distinct-customer frame
    * (fan-out = months, bounded by the calendar, not the data); the
    * fill is one per-customer window over the dense frame — rows per
    * partition = months, never corpus-sized. The oracle runs the
    * identical fill declaratively via `last_value IGNORE NULLS`.
    */
  private def q56GapFill(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("custkey"),
      expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").cast("long").as("month_id"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
    val monthly = o.groupBy("custkey", "month_id")
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("spend_cents"))
      .localCheckpoint(true) // the calendar bounds, dense join, and output all reread it
    val b = monthly.agg(min(col("month_id")), max(col("month_id"))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val dense = monthly.select(col("custkey")).distinct()
      .withColumn("month_id", explode(expr(s"sequence(${lo}L, ${hi}L)")))
    val w = Window.partitionBy(col("custkey")).orderBy(col("month_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(monthly, Seq("custkey", "month_id"), "left")
      .withColumn("filled_cents",
        coalesce(last(col("spend_cents"), ignoreNulls = true).over(w), lit(0L)))
      .select(col("custkey"), col("month_id"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend_cents"), lit(0L)).as("spend_cents"),
        col("filled_cents"),
        col("spend_cents").isNull.cast("int").as("is_gap"))
      .orderBy("custkey", "month_id")
  }

  private val q56Oracle: String =
    """WITH o AS (
      |  SELECT o_custkey AS custkey,
      |         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS month_id,
      |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |monthly AS (
      |  SELECT custkey, month_id, CAST(count(*) AS BIGINT) AS n_orders,
      |         CAST(sum(cents) AS BIGINT) AS spend_cents
      |  FROM o GROUP BY 1, 2),
      |b AS (SELECT min(month_id) AS lo, max(month_id) AS hi FROM monthly),
      |dense AS (
      |  SELECT c.custkey, unnest(generate_series(b.lo, b.hi)) AS month_id
      |  FROM (SELECT DISTINCT custkey FROM monthly) c, b)
      |SELECT custkey, month_id,
      |       COALESCE(n_orders, 0) AS n_orders,
      |       COALESCE(spend_cents, 0) AS spend_cents,
      |       COALESCE(last_value(spend_cents IGNORE NULLS)
      |         OVER (PARTITION BY custkey ORDER BY month_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS filled_cents,
      |       CAST(spend_cents IS NULL AS INT) AS is_gap
      |FROM dense LEFT JOIN monthly USING (custkey, month_id)
      |ORDER BY custkey, month_id""".stripMargin

  // ---- q57: interval-concurrency sweep --------------------------------------

  /** Orders-in-flight concurrency profile — the interval SWEEP
    * primitive (how many intervals cover each point in time) that
    * q22's range JOIN doesn't give you: an order is "open" from
    * o_orderdate until its last lineitem ships; report, per day the
    * population changes, how many open, how many close, and the
    * running count of concurrently open orders. The classic naive
    * form — self-join intervals against points, or a global sort of
    * ±1 events — is quadratic or single-partition at 100 TB. The
    * sweep decomposes: boundary deltas aggregate per DAY first (one
    * corpus exchange on a ~10³-value bounded key, map-side combined),
    * then the running sum is a window over the date rollup — a
    * calendar-sized frame, not the corpus (t45's bounded-rollup
    * discipline applied to interval algebra).
    *
    * Scale shape: one orderkey-keyed rollup + join to derive the
    * spans (AQE picks the co-partitioned SMJ), two date-keyed
    * rollups, one window over ≤ calendar rows. Nothing corpus-sized
    * ever sorts.
    */
  private def q57Concurrency(s: SparkSession, d: String): DataFrame = {
    val close = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("okey"))
      .agg(max(to_date(col("l_shipdate"))).as("close_d"))
    // dirty-data sanitization: the fixture (like any real feed) has
    // orders whose lineitems all shipped BEFORE the order date; an
    // inverted interval would send the sweep transiently negative, so
    // every span is normalized to [least, greatest] of its two bounds.
    // Orders with no lineitems have no span (inner join, both engines).
    val spans = Tables.orders(s, d)
      .select(col("o_orderkey").as("okey"), to_date(col("o_orderdate")).as("od"))
      .join(close, Seq("okey"))
      .select(least(col("od"), col("close_d")).as("open_d"),
        greatest(col("od"), col("close_d")).as("close_d"))
    val starts = spans.groupBy(col("open_d").as("day")).agg(count(lit(1)).as("n_open"))
    val ends = spans.groupBy(date_add(col("close_d"), 1).as("day"))
      .agg(count(lit(1)).as("n_close"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.join(ends, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_open"), lit(0L)).as("n_open"),
        coalesce(col("n_close"), lit(0L)).as("n_close"))
      .withColumn("in_flight", sum(col("n_open") - col("n_close")).over(w))
      .orderBy("day")
  }

  private val q57Oracle: String =
    """WITH close AS (
      |  SELECT l_orderkey AS okey, max(CAST(l_shipdate AS DATE)) AS close_d
      |  FROM lineitem GROUP BY 1),
      |spans AS (
      |  SELECT least(CAST(o.o_orderdate AS DATE), c.close_d) AS open_d,
      |         greatest(CAST(o.o_orderdate AS DATE), c.close_d) AS close_d
      |  FROM orders o JOIN close c ON o.o_orderkey = c.okey),
      |starts AS (SELECT open_d AS day, CAST(count(*) AS BIGINT) AS n_open
      |           FROM spans GROUP BY 1),
      |ends AS (SELECT close_d + 1 AS day, CAST(count(*) AS BIGINT) AS n_close
      |         FROM spans GROUP BY 1)
      |SELECT day,
      |       COALESCE(n_open, 0) AS n_open,
      |       COALESCE(n_close, 0) AS n_close,
      |       CAST(sum(COALESCE(n_open, 0) - COALESCE(n_close, 0))
      |         OVER (ORDER BY day
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS in_flight
      |FROM starts FULL OUTER JOIN ends USING (day)
      |ORDER BY day""".stripMargin

  // ---- q58: snapshot diff (log-free change detection) ------------------------

  /** Snapshot DIFF — change detection when there is NO log: two table
    * versions, classify every key as added / removed / changed /
    * unchanged and report the per-status accounting (row counts + a
    * key-sum checksum). This is the reconciliation pass warehouses
    * run against CDC output (does the log-replayed state equal the
    * re-snapshot?) and the fallback when a source can't stream. The
    * derived snapshot plants all three change classes off the base
    * (drops at key%97, +100-cent mutations at key%13, inserts at
    * key%101 shifted by 10⁷) so every status is provably non-vacuous.
    *
    * Comparison is digest-vs-digest: each side serializes to
    * md5(name|nationkey|cents|segment) — balances as integer CENTS,
    * never a float rendering — so "changed" means the payload
    * genuinely differs, not that two engines print doubles
    * differently.
    *
    * Scale shape: ONE full-outer join keyed on the primary key (both
    * sides co-partition; AQE picks the SMJ), digests computed in the
    * scan projection, then a 4-value status rollup, map-side
    * combined. Nothing else moves.
    */
  private def q58SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    def serialize(df: DataFrame): DataFrame = df.select(
      col("c_custkey").as("k"),
      md5(concat_ws("|", col("c_name"), col("c_nationkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)"),
        col("c_mktsegment"))).as("h"))
    val base = serialize(Tables.customer(s, d))
    val cust = Tables.customer(s, d)
    val next = serialize(
      cust.filter(col("c_custkey") % 97 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 13 === 0, col("c_acctbal") + 1.0)
            .otherwise(col("c_acctbal")))
        .unionAll(cust.filter(col("c_custkey") % 101 === 0)
          .withColumn("c_custkey", col("c_custkey") + 10000000L)))
    base.withColumnRenamed("h", "h_base")
      .join(next.withColumnRenamed("h", "h_next"), Seq("k"), "full_outer")
      .select(col("k"),
        when(col("h_base").isNull, "added")
          .when(col("h_next").isNull, "removed")
          .when(col("h_base") =!= col("h_next"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("key_sum"))
      .orderBy("status")
  }

  private val q58Oracle: String =
    """WITH base AS (
      |  SELECT c_custkey AS k,
      |         md5(c_name || '|' || c_nationkey || '|' ||
      |             CAST(round(c_acctbal * 100) AS BIGINT) || '|' || c_mktsegment) AS h
      |  FROM customer),
      |nxt0 AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |         CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 1.0 ELSE c_acctbal END
      |           AS c_acctbal,
      |         c_mktsegment
      |  FROM customer WHERE c_custkey % 97 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 101 = 0),
      |nxt AS (
      |  SELECT c_custkey AS k,
      |         md5(c_name || '|' || c_nationkey || '|' ||
      |             CAST(round(c_acctbal * 100) AS BIGINT) || '|' || c_mktsegment) AS h
      |  FROM nxt0),
      |st AS (
      |  SELECT COALESCE(base.k, nxt.k) AS k,
      |         CASE WHEN base.h IS NULL THEN 'added'
      |              WHEN nxt.h IS NULL THEN 'removed'
      |              WHEN base.h <> nxt.h THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM base FULL OUTER JOIN nxt ON base.k = nxt.k)
      |SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(k) AS BIGINT) AS key_sum
      |FROM st GROUP BY status ORDER BY status""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_pagerank_maint" -> (q59PagerankMaint _),
    "q58_snapshot_diff" -> (q58SnapshotDiff _),
    "q57_concurrency" -> (q57Concurrency _),
    "q56_gap_fill" -> (q56GapFill _),
    "q55_dq_audit" -> (q55DqAudit _),
    "q54_pagerank" -> (q54PageRank _),
    "q53_exact_quantile" -> (q53ExactQuantile _),
    "q52_hierarchy" -> (q52Hierarchy _),
    "q51_aqe_skew" -> (q51AqeSkew _),
    "q49_dpp" -> (q49Dpp _),
    "q50_skew_profile" -> (q50SkewProfile _),
    "q47_fuzzy_join" -> (q47FuzzyJoin _),
    "q48_funnel" -> (q48Funnel _),
    "q45_bucketed_join" -> (q45BucketedJoin _),
    "q46_zorder" -> (q46ZOrder _),
    "q44_bloom_join" -> (q44BloomJoin _),
    "q43_salted_join" -> (q43SaltedJoin _),
    "q41_date_trunc" -> (q41DateTrunc _),
    "q42_cond_agg" -> (q42CondAgg _),
    "q39_percent_rank" -> (q39PercentRank _),
    "q40_array_ops" -> (q40ArrayOps _),
    "q32_exists" -> (q32Exists _),
    "q33_cube" -> (q33Cube _),
    "q34_lateral" -> (q34Lateral _),
    "q35_frames" -> (q35Frames _),
    "q36_regex" -> (q36Regex _),
    "q37_retention" -> (q37Retention _),
    "q38_salted_agg" -> (q38SaltedAgg _)
  )

  val oracles: Map[String, String] = Map(
    "q59_pagerank_maint" -> q59Oracle,
    "q58_snapshot_diff" -> q58Oracle,
    "q57_concurrency" -> q57Oracle,
    "q56_gap_fill" -> q56Oracle,
    "q55_dq_audit" -> q55Oracle,
    "q54_pagerank" -> q54Oracle,
    "q53_exact_quantile" -> q53Oracle,
    "q52_hierarchy" -> q52Oracle,
    "q51_aqe_skew" -> q51Oracle,
    "q49_dpp" -> q49Oracle,
    "q50_skew_profile" -> q50Oracle,
    "q47_fuzzy_join" -> q47Oracle,
    "q48_funnel" -> q48Oracle,
    "q45_bucketed_join" -> q45Oracle,
    "q46_zorder" -> q46Oracle,
    "q44_bloom_join" -> q44Oracle,
    "q43_salted_join" -> q43Oracle,
    "q41_date_trunc" -> q41Oracle,
    "q42_cond_agg" -> q42Oracle,
    "q39_percent_rank" -> q39Oracle,
    "q40_array_ops" -> q40Oracle,
    "q32_exists" -> q32Oracle,
    "q33_cube" -> q33Oracle,
    "q34_lateral" -> q34Oracle,
    "q35_frames" -> q35Oracle,
    "q36_regex" -> q36Oracle,
    "q37_retention" -> q37Oracle,
    "q38_salted_agg" -> q38Oracle
  )
}
