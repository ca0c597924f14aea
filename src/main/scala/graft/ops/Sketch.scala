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

  /** Weighted hex-digit decode shared by every sketch hash: `n` hex
    * chars of string expression `e` starting after `off` → integer in
    * [0, 16^n), identical in both engines (md5 hex + ascii arithmetic
    * only; both parse the int-overflowing coefficient literals as
    * BIGINT). All h*Sql variants below are thin wrappers.
    */
  private def hexIntSql(e: String, off: Int, n: Int): String = {
    def hexv(k: Int) =
      s"CAST(CASE WHEN ascii(substr($e,${k + off},1)) >= 97 " +
        s"THEN ascii(substr($e,${k + off},1)) - 87 " +
        s"ELSE ascii(substr($e,${k + off},1)) - 48 END AS BIGINT)"
    (1 to n).map(k => s"(${hexv(k)}) * ${1L << (4 * (n - k))}")
      .mkString("(", " + ", ")")
  }

  /** 48-bit integer from the first 12 hex chars of md5 of `e` —
    * uniform on [0, 2^48). The md5 call is inline (12 references —
    * leans on subexpression elimination; hoist when it matters, see
    * [[h63Sql]]).
    */
  private def h48Sql(e: String): String = hexIntSql(s"md5($e)", 0, 12)

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

  // ---- sk2: Bloom membership sketch ---------------------------------------

  /** 63-bit, two-hash Bloom filter per group, built and probed with
    * exact integer arithmetic — the set-membership sketch next to
    * sk1's cardinality sketch. Positions are two independent md5-hex
    * hashes mod 63 (bit 63 stays clear: both engines' BIGINT shifts
    * stay positive); the filter is a `bit_or` aggregate — order- and
    * partition-insensitive, one long per (group, partition) partial,
    * the join-pruning sketch shape (ships to the probe side instead
    * of the key set). The probe half counts maybe-hits for suppkeys
    * 1..100 against each group's filter next to the exact answer, so
    * the false-positive rate is part of the checked result.
    */
  /** `e` must reference an ALREADY-COMPUTED md5 hex column: hoisting
    * the digest out of the 48 ascii/substr references keeps it one
    * call per row without leaning on subexpression elimination, and
    * halves the generated code.
    */
  private def h63Sql(e: String, off: Int): String =
    s"(${hexIntSql(e, off, 8)} % 63)"

  private def sk2BloomFilter(s: SparkSession, d: String): DataFrame = {
    val p1 = h63Sql("mh", 0)
    val p2 = h63Sql("mh", 8)
    // distinct (group, key) FIRST: bit_or is idempotent so the filter
    // is unchanged, the distinct dedupes map-side before its shuffle,
    // md5 runs once per DISTINCT key instead of once per row, and
    // n_keys/n_true become plain counts — no countDistinct expand,
    // and the old standalone truth query (a second full scan) folds
    // into the same tiny aggregate
    val bloom = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"), col("l_suppkey")).distinct()
      .select(col("grp"), col("l_suppkey"),
        md5(col("l_suppkey").cast("string")).as("mh"))
      .select(col("grp"), col("l_suppkey"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($p1 AS INT)) | " +
          s"shiftleft(CAST(1 AS BIGINT), CAST($p2 AS INT))").as("bits"))
      .groupBy("grp")
      .agg(expr("bit_or(bits)").as("bloom"),
        count(lit(1)).as("n_keys"),
        sum(when(col("l_suppkey").between(1, 100), 1L).otherwise(0L))
          .as("n_true"))
    val probes = s.range(1, 101).select(col("id").as("pk"))
      .select(col("pk"), md5(col("pk").cast("string")).as("mh"))
      .select(col("pk"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST($p1 AS INT)) | " +
          s"shiftleft(CAST(1 AS BIGINT), CAST($p2 AS INT))").as("pbits"))
    bloom.join(broadcast(probes))
      .groupBy(col("grp"), col("bloom"), col("n_keys"), col("n_true"))
      .agg(sum(when(expr("(bloom & pbits) = pbits"), 1L).otherwise(0L)).as("n_maybe"))
      .select(col("grp"), col("bloom"), col("n_keys"),
        col("n_maybe"), col("n_true"))
      .orderBy("grp")
  }

  private val sk2Oracle: String = {
    val p1 = h63Sql("mh", 0)
    val p2 = h63Sql("mh", 8)
    s"""WITH bloom AS (
       |  SELECT grp, bit_or(bits) AS bloom, n_keys FROM (
       |    SELECT grp,
       |           (CAST(1 AS BIGINT) << CAST($p1 AS INT)) |
       |           (CAST(1 AS BIGINT) << CAST($p2 AS INT)) AS bits,
       |           count(DISTINCT l_suppkey) OVER (PARTITION BY grp) AS n_keys
       |    FROM (SELECT l_returnflag AS grp, l_suppkey,
       |                 md5(CAST(l_suppkey AS VARCHAR)) AS mh FROM lineitem))
       |  GROUP BY grp, n_keys),
       |probes AS (
       |  SELECT pk,
       |         (CAST(1 AS BIGINT) << CAST($p1 AS INT)) |
       |         (CAST(1 AS BIGINT) << CAST($p2 AS INT)) AS pbits
       |  FROM (SELECT pk, md5(CAST(pk AS VARCHAR)) AS mh
       |        FROM (SELECT unnest(generate_series(1, 100)) AS pk))),
       |truth AS (
       |  SELECT l_returnflag AS grp, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_true
       |  FROM lineitem WHERE l_suppkey BETWEEN 1 AND 100 GROUP BY 1)
       |SELECT b.grp, b.bloom, b.n_keys,
       |       CAST(sum(CASE WHEN (b.bloom & p.pbits) = p.pbits THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
       |       coalesce(max(t.n_true), 0) AS n_true
       |FROM bloom b CROSS JOIN probes p LEFT JOIN truth t ON b.grp = t.grp
       |GROUP BY b.grp, b.bloom, b.n_keys
       |ORDER BY b.grp""".stripMargin
  }

  // ---- sk3: count-min sketch (heavy-hitter estimation) --------------------

  /** Count-min constants: depth 4, width 256, pairwise hash
    * `((a_j·key + b_j) mod P) mod W` — plain integer arithmetic, so
    * the oracle rebuilds the identical sketch.
    */
  private val cmW = 256
  private val cmP = 2147483647L
  private val cmHashes = Seq((31L, 7L), (37L, 11L), (41L, 13L), (43L, 17L))

  private def cmCellSql(j: Int, key: String): String = {
    val (a, b) = cmHashes(j)
    s"CAST((($a * $key + $b) % $cmP) % $cmW AS INT)"
  }

  /** Count-min sketch over the event stream's key frequencies — the
    * heavy-hitter detector that tells a 100 TB pipeline WHICH keys to
    * salt (q38/q43's prerequisite). Build: every occurrence
    * increments one cell per depth row; as a groupBy over (row, cell)
    * the sketch is a mergeable partial aggregate whose shuffled size
    * is ≤ depth·width counters — constant in input rows, the whole
    * point of the sketch. Probe: estimate(key) = min over rows of its
    * cells, never under the true count (CMS one-sided error — checked
    * per key in the result against the exact count). All integer
    * arithmetic, so the DuckDB oracle rebuilds sketch AND estimates
    * bit-for-bit.
    */
  private def sk3CountMin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"))
    val cells = ev
      .select(explode(array((0 until 4).map { j =>
        struct(lit(j).as("j"), expr(cmCellSql(j, "user_id")).as("cell"))
      }: _*)).as("rc"))
      .select(col("rc.j").as("j"), col("rc.cell").as("cell"))
      .groupBy("j", "cell")
      .agg(count(lit(1)).as("n"))
    val truth = ev.filter(col("user_id") < 10)
      .groupBy("user_id").agg(count(lit(1)).as("n_true"))
    val probes = truth.select(col("user_id"), col("n_true"),
      explode(array((0 until 4).map { j =>
        struct(lit(j).as("j"), expr(cmCellSql(j, "user_id")).as("cell"))
      }: _*)).as("rc"))
      .select(col("user_id"), col("n_true"),
        col("rc.j").as("j"), col("rc.cell").as("cell"))
    probes
      .join(cells, Seq("j", "cell"))
      .groupBy(col("user_id"), col("n_true"))
      .agg(min(col("n")).as("n_est"))
      .withColumn("over_ok", (col("n_est") >= col("n_true")).cast("int"))
      .select("user_id", "n_true", "n_est", "over_ok")
      .orderBy("user_id")
  }

  private val sk3Oracle: String = {
    val hs = cmHashes.zipWithIndex
      .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
    s"""WITH h(j, a, b) AS (VALUES $hs),
       |cells AS (
       |  SELECT j, CAST(((a * user_id + b) % $cmP) % $cmW AS INT) AS cell,
       |         count(*) AS n
       |  FROM events CROSS JOIN h
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT user_id, count(*) AS n_true FROM events
       |  WHERE user_id < 10 GROUP BY user_id),
       |probes AS (
       |  SELECT t.user_id, t.n_true, h.j,
       |         CAST(((h.a * t.user_id + h.b) % $cmP) % $cmW AS INT) AS cell
       |  FROM truth t CROSS JOIN h)
       |SELECT p.user_id, p.n_true, min(c.n) AS n_est,
       |       CAST(min(c.n) >= p.n_true AS INT) AS over_ok
       |FROM probes p JOIN cells c ON p.j = c.j AND p.cell = c.cell
       |GROUP BY p.user_id, p.n_true
       |ORDER BY p.user_id""".stripMargin
  }

  // ---- sk4: HLL-register sketch (bucketed leading-zero cardinality) -------

  /** 32-bit integer from the first 8 hex chars of an already-computed
    * md5 hex column `e` — same hoisting rationale as [[h63Sql]].
    */
  private def h32Sql(e: String): String = hexIntSql(e, 0, 8)

  /** HLL geometry: p=6 → m=64 buckets from the hash's top 6 bits; the
    * remaining 26 bits feed rho (leading zeros + 1, so rho ∈ [1,27]).
    * Estimate arithmetic is kept integer-exact: with S' =
    * Σ_buckets 2^(27−register) (empty bucket ⇒ register 0 ⇒ 2^27),
    * the standard alpha·m²/Σ2^(−M[j]) becomes
    * `(709·m²·2^27) DIV (1000·S')` — one BIGINT division both engines
    * compute identically (alpha_64 = 0.709 as the rational 709/1000).
    */
  private val hllW = 1L << 26 // 67108864: bucket = h DIV hllW, w = h % hllW
  private val hllNum = 709L * 64L * 64L * (1L << 27)

  /** HyperLogLog-shaped distinct sketch next to sk1's KMV: the same
    * cardinality question answered with 64 tiny registers instead of
    * 64 kept minima. Where KMV ships the k smallest hashes, HLL ships
    * max-of-leading-zeros per bucket — `max` is idempotent and
    * order-insensitive, so the register table is a two-level hash agg
    * whose shuffled size is ≤ groups × 64 single-byte registers no
    * matter how many rows feed it; that register map is also the
    * mergeable state a 1000-executor cluster would combine. The exact
    * `countDistinct` column rides along as the yardstick (at 100 TB it
    * is the expensive column — the sketch is what a real pipeline
    * keeps). rho's bit-length comes from `length(bin(w))`, identical
    * minimal-width binary strings in both engines, so registers AND
    * estimate are oracle-checkable bit-for-bit.
    */
  private def sk4HllDistinct(s: SparkSession, d: String): DataFrame = {
    val regs = Tables.orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        md5(col("o_custkey").cast("string")).as("mh"))
      .select(col("grp"), expr(h32Sql("mh")).as("h"))
      .select(col("grp"), expr(s"h DIV $hllW").as("bucket"),
        expr(s"CASE WHEN h % $hllW = 0 THEN 27 " +
          s"ELSE 27 - length(bin(h % $hllW)) END").as("rho"))
      .groupBy("grp", "bucket")
      .agg(max("rho").as("reg"))
    val summ = regs
      .groupBy("grp")
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 27 - reg)")).as("s_present"),
        count(lit(1)).as("m_present"))
      .select(col("grp"), col("m_present").cast("int").as("m_used"),
        expr(s"$hllNum DIV (1000 * (s_present + (64 - m_present) * ${1L << 27}))")
          .as("est"))
    val exact = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    summ
      .join(exact, Seq("grp"))
      .select(col("grp"), col("n_exact"), col("m_used"), col("est"))
      .orderBy("grp")
  }

  private val sk4Oracle: String = {
    val h = h32Sql("mh")
    s"""WITH hv AS (
       |  SELECT o_orderpriority AS grp,
       |         md5(CAST(o_custkey AS VARCHAR)) AS mh FROM orders),
       |h AS (SELECT grp, $h AS h FROM hv),
       |regs AS (
       |  SELECT grp, h // $hllW AS bucket,
       |         max(CASE WHEN h % $hllW = 0 THEN 27
       |                  ELSE 27 - length(bin(h % $hllW)) END) AS reg
       |  FROM h GROUP BY 1, 2),
       |summ AS (
       |  SELECT grp,
       |         CAST(sum(CAST(1 AS BIGINT) << (27 - reg)) AS BIGINT) AS s_present,
       |         count(*) AS m_present
       |  FROM regs GROUP BY grp)
       |SELECT s.grp, e.n_exact, CAST(s.m_present AS INT) AS m_used,
       |       $hllNum // (1000 * (s_present + (64 - m_present) * ${1L << 27})) AS est
       |FROM summ s JOIN (
       |  SELECT o_orderpriority AS grp, count(DISTINCT o_custkey) AS n_exact
       |  FROM orders GROUP BY 1) e ON s.grp = e.grp
       |ORDER BY s.grp""".stripMargin
  }

  // ---- sk5: mergeable histogram sketch with quantile estimation -----------

  /** The percentile question at 100 TB: exact quantiles need a full
    * sort (or Spark's `approxQuantile`, whose Greenwald-Khanna state
    * no external engine reproduces) — the scalable, gate-checkable
    * answer is a FIXED-BIN HISTOGRAM: binning is row-local integer
    * arithmetic (prices to cents first, so the bin edge can't move
    * with float division), the histogram is a (group × bins) count
    * map — a partial-agg-safe shuffle bounded by bin count, the same
    * mergeable-state shape as sk4's registers — and any quantile
    * reads off the cumulative counts: `p_q = min bin with
    * 100·cum ≥ q·n` (integer cross-multiplication, no division at
    * all). Estimates are bin LOWER BOUNDS in cents — deterministic,
    * resolution = bin width, exactly what a 500-unit bin promises.
    */
  private def sk5Histogram(s: SparkSession, d: String): DataFrame = {
    val hist = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) DIV 50000").as("bin"))
      .groupBy("grp", "bin")
      .agg(count(lit(1)).as("n_bin"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("bin")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    def qLo(q: Int) =
      min(when(col("cum") * 100 >= col("n") * q, col("bin") * 50000))
        .as(s"p${q}_lo_cents")
    hist
      .withColumn("cum", sum(col("n_bin")).over(wOrd))
      .withColumn("n", sum(col("n_bin")).over(wAll))
      .groupBy("grp")
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_bins"),
        qLo(50), qLo(90), qLo(99))
      .orderBy("grp")
  }

  private val sk5Oracle: String =
    """WITH h AS (
      |  SELECT grp, bin, count(*) AS n_bin FROM (
      |    SELECT l_returnflag AS grp,
      |           CAST(round(l_extendedprice * 100) AS BIGINT) // 50000 AS bin
      |    FROM lineitem)
      |  GROUP BY grp, bin),
      |c AS (
      |  SELECT grp, bin, n_bin,
      |         sum(n_bin) OVER (PARTITION BY grp ORDER BY bin) AS cum,
      |         sum(n_bin) OVER (PARTITION BY grp) AS n
      |  FROM h)
      |SELECT grp, CAST(max(n) AS BIGINT) AS n, count(*) AS n_bins,
      |       min(CASE WHEN cum * 100 >= n * 50 THEN bin * 50000 END) AS p50_lo_cents,
      |       min(CASE WHEN cum * 100 >= n * 90 THEN bin * 50000 END) AS p90_lo_cents,
      |       min(CASE WHEN cum * 100 >= n * 99 THEN bin * 50000 END) AS p99_lo_cents
      |FROM c GROUP BY grp ORDER BY grp""".stripMargin

  // ---- sk6: KMV set algebra (union / intersection estimation) -------------

  /** Sketches as an ALGEBRA, not just per-group summaries: the
    * bottom-64 minima sets ([[graft.functions.KmvSetAgg]]) of two
    * groups compose — `bottom64(A ∪ B)` is computable from the two
    * sketches alone, its k-th minimum estimates |A∪B|, and the
    * fraction of union-sketch members present in BOTH input sketches
    * estimates Jaccard, hence |A∩B| (Beyer et al., SIGMOD'07). That
    * composability is the 100 TB point: per-group sketches are
    * O(k)-shuffled once, and any of the 2^groups set questions is
    * answered afterwards from k-long arrays with row-local array ops
    * — no second pass over data. The exact union cardinality rides
    * along as the yardstick (the column a real pipeline would NOT
    * compute). Integer arithmetic end-to-end, so DuckDB rebuilds
    * sketches AND estimates bit-for-bit.
    */
  private def sk6KmvSetops(s: SparkSession, d: String): DataFrame = {
    val kmvSet = udaf(graft.functions.KmvSetAgg)
    val sk = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        expr(h48Sql("CAST(l_partkey AS STRING)")).as("h"))
      .groupBy("grp")
      .agg(kmvSet(col("h")).as("mins"))
    val pairs = sk.as("a")
      .join(sk.as("b"), col("a.grp") < col("b.grp"))
      .select(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"),
        col("a.mins").as("ma"), col("b.mins").as("mb"))
      .withColumn("u", expr("slice(array_sort(array_union(ma, mb)), 1, 64)"))
      .withColumn("est_union", expr(
        "CASE WHEN size(u) < 64 THEN CAST(size(u) AS BIGINT) " +
          "ELSE 17732923532771328 DIV element_at(u, 64) END"))
      .withColumn("m_inter", expr(
        "size(filter(u, x -> array_contains(ma, x) AND array_contains(mb, x)))"))
      .withColumn("est_inter",
        expr("(m_inter * est_union) DIV CAST(size(u) AS BIGINT)"))
    val exact = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("flag"), col("l_partkey")).distinct()
    // the exact yardstick joins against the SLIM pair list (group
    // names only, broadcast) — the sketch arrays must not ride the
    // |distinct| × pairs nested-loop join; sketch results re-attach
    // afterwards at pair granularity (3 rows vs 3 rows)
    val exactU = exact
      .join(broadcast(pairs.select("grp_a", "grp_b")),
        col("flag") === col("grp_a") || col("flag") === col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(countDistinct(col("l_partkey")).as("n_exact_union"))
    pairs
      .join(exactU, Seq("grp_a", "grp_b"))
      .select("grp_a", "grp_b", "est_union", "m_inter", "est_inter",
        "n_exact_union")
      .orderBy("grp_a", "grp_b")
  }

  private val sk6Oracle: String = {
    val h = h48Sql("CAST(l_partkey AS VARCHAR)")
    s"""WITH hv AS (
       |  SELECT DISTINCT l_returnflag AS grp, $h AS h FROM lineitem),
       |r AS (
       |  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
       |  FROM hv),
       |sk AS (SELECT grp, list(h ORDER BY h) AS mins FROM r WHERE rn <= 64 GROUP BY grp),
       |pairs AS (
       |  SELECT a.grp AS grp_a, b.grp AS grp_b, a.mins AS ma, b.mins AS mb,
       |         list_sort(list_distinct(a.mins || b.mins))[1:64] AS u
       |  FROM sk a JOIN sk b ON a.grp < b.grp),
       |est AS (
       |  SELECT grp_a, grp_b,
       |         CASE WHEN len(u) < 64 THEN CAST(len(u) AS BIGINT)
       |              ELSE 17732923532771328 // u[64] END AS est_union,
       |         CAST(len(list_filter(u, x -> list_contains(ma, x)
       |                                  AND list_contains(mb, x))) AS INT) AS m_inter,
       |         CAST(len(u) AS BIGINT) AS usz
       |  FROM pairs),
       |ex AS (
       |  SELECT p.grp_a, p.grp_b, count(DISTINCT l.l_partkey) AS n_exact_union
       |  FROM (SELECT a.grp AS grp_a, b.grp AS grp_b
       |        FROM sk a JOIN sk b ON a.grp < b.grp) p
       |  JOIN lineitem l ON l.l_returnflag IN (p.grp_a, p.grp_b)
       |  GROUP BY 1, 2)
       |SELECT e.grp_a, e.grp_b, e.est_union, e.m_inter,
       |       (e.m_inter * e.est_union) // e.usz AS est_inter,
       |       x.n_exact_union
       |FROM est e JOIN ex x ON e.grp_a = x.grp_a AND e.grp_b = x.grp_b
       |ORDER BY e.grp_a, e.grp_b""".stripMargin
  }

  // ---- sk7: deterministic bottom-k-by-hash sample -------------------------

  /** Per-source deterministic k-sample via
    * [[graft.functions.BottomKSampleAgg]] — "reservoir sampling" as a
    * mergeable algebra: md5-uniform hashes make the k smallest a
    * uniform sample, bottom-k order-insensitivity makes it a safe
    * shuffle partial (each (group, partition) ships ≤ k pairs — no window
    * over all rows, no per-group sort, no RNG), and determinism makes
    * the SAMPLE ITSELF oracle-checkable: DuckDB recomputes the exact
    * same k rows via a rank over the same hash. The eval-set /
    * spot-check sampling shape for a 100 TB corpus.
    */
  private def sk7Sample(s: SparkSession, d: String): DataFrame = {
    val bottomK = udaf(graft.functions.BottomKSampleAgg)
    Tables.documents(s, d)
      .select(col("source"),
        md5(col("doc_id").cast("string")).as("h"), col("doc_id"))
      .groupBy("source")
      .agg(bottomK(col("h"), col("doc_id")).as("picks"))
      .select(col("source"), explode(col("picks")).as("p"))
      .select(col("source"), col("p._1").as("h"), col("p._2").as("doc_id"))
      .orderBy("source", "h")
  }

  private val sk7Oracle: String =
    """SELECT source, h, doc_id FROM (
      |  SELECT source, md5(CAST(doc_id AS VARCHAR)) AS h, doc_id,
      |         row_number() OVER (PARTITION BY source
      |             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents) WHERE rn <= 4 ORDER BY source, h""".stripMargin

  // ---- sk8: differentially-private group counts ---------------------------

  /** Discrete-Laplace noise scale α = [[DpAlphaNum]]/[[DpAlphaDen]]
    * (ε = ln(Den/Num) = ln 2 per count — the textbook DP budget),
    * truncated at ±[[DpMaxNoise]].
    */
  private val DpAlphaNum = 1
  private val DpAlphaDen = 2
  private[ops] val DpMaxNoise = 40

  /** Threshold ladder for the integer-exact discrete-Laplace sampler:
    * at α = Num/Den the mass of z = ±k is
    * (Den−Num)/(Den+Num) · (Num/Den)^k, so at scale
    * U = (Den+Num)·Den^[[DpMaxNoise]] every mass is the integer
    * (Den−Num)·Num^k·Den^(max−k) — for α = 1/2 that is P(0)·U = 2⁴⁰
    * and P(±k)·U = 2^(40−k) per sign — and the whole inverse CDF is
    * integer comparisons both engines agree on bit-for-bit. Values
    * ordered 0, +1, −1, …, +max, −max. The infinite tail beyond ±max
    * carries EXACTLY 2·Num^(max+1) = 2 units of U (probability
    * 2/U ≈ 6.1·10⁻¹³), which the ELSE branch folds into 0 — bounded
    * noise, the production-DP-library stance, with the truncated mass
    * stated exactly rather than estimated.
    */
  private[ops] val DpBounds: Seq[(Long, Long)] = {
    val masses: Seq[(Long, Long)] = (0 to DpMaxNoise).flatMap { k =>
      val m = ((DpAlphaDen - DpAlphaNum) * BigInt(DpAlphaNum).pow(k) *
        BigInt(DpAlphaDen).pow(DpMaxNoise - k)).toLong
      if (k == 0) Seq((m, 0L)) else Seq((m, k.toLong), (m, -k.toLong))
    }
    masses.scanLeft((0L, 0L)) { case ((acc, _), (m, z)) => (acc + m, z) }
      .tail.map { case (b, z) => (b, z) }
  }

  /** Total threshold scale: 3·2⁴⁰. */
  private[ops] val DpScale: Long =
    ((DpAlphaDen + DpAlphaNum) * BigInt(DpAlphaDen).pow(DpMaxNoise)).toLong

  /** The seeded uniform u ∈ [0, [[DpScale]]): 96 md5 bits reduced mod
    * U in exact wide-integer arithmetic (`wideTy` = DECIMAL(15,0) on
    * Spark — the 37-digit intermediate stays inside DECIMAL(38) — and
    * HUGEINT on DuckDB). 96 bits, not 48: 2⁴⁸ ≈ 2.56·U, so a 48-bit
    * reduction would draw the low ~44% of residues 3/2 as often as
    * the rest — a real skew. At 96 bits each residue appears
    * ⌊2⁹⁶/U⌋ or ⌊2⁹⁶/U⌋+1 times (per-residue relative bias
    * ≤ U/2⁹⁶ ≈ 4·10⁻¹⁷ — noted, negligible, and not removable by any
    * fixed-width hash since U has non-2 factors).
    */
  private def dpU96Sql(seedExpr: String, wideTy: String): String = {
    val md5e = s"md5($seedExpr)"
    val hi = hexIntSql(md5e, 0, 12)
    val lo = hexIntSql(md5e, 12, 12)
    s"CAST((CAST($hi AS $wideTy) * ${1L << 48} + $lo) % $DpScale AS BIGINT)"
  }

  /** The seeded sampler as one generated threshold CASE — row-local,
    * identical text in both engines. `u` is hoisted to a named column
    * by both callers (81 branches × an inlined 24-digit hex decode
    * would be a megabyte of SQL).
    */
  private def dpNoiseSql(u: String): String =
    DpBounds.map { case (b, z) => s"WHEN ($u) < $b THEN $z" }
      .mkString("CASE ", " ", " ELSE 0 END")

  /** Privacy-preserving reporting over the corpus — per-(lang, source)
    * document counts under a DIFFERENTIALLY-PRIVATE release: each
    * count gets discrete-Laplace noise (two-sided geometric, the
    * integer mechanism of Ghosh-Roughgarden-Sundararajan 2009 — the
    * count analogue of continuous Laplace) at α = 1/2 (ε = ln 2,
    * matching [[DpAlphaNum]]/[[DpAlphaDen]]) and clamps at
    * zero (post-processing preserves DP). Training-data pipelines
    * report composition stats over user-contributed corpora; DP is
    * how those dashboards ship without leaking any single document's
    * presence.
    *
    * Determinism vs privacy: the noise is SEEDED — 96 md5 bits of the
    * group key drive an integer-exact inverse-CDF ladder
    * ([[DpBounds]], uniform seed [[dpU96Sql]]) — because the gate
    * needs both engines to draw the SAME noise. Production swaps the
    * seed for a secure RNG and publishes only `n_dp`; the mechanism,
    * ladder, and clamping are what this query pins (the true count
    * and noise ride along here to be checkable).
    *
    * Scale shape: one (lang, source)-keyed count rollup — group-
    * bounded, map-side combined — then the noise CASE is a row-local
    * projection over ≤groups rows. The DP layer costs nothing at
    * 100 TB; it's the same topology as the count it protects.
    */
  private def sk8DpCounts(s: SparkSession, d: String): DataFrame = {
    val u = dpU96Sql("concat('dp1|', lang, '|', source)", "DECIMAL(15,0)")
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .withColumn("u", expr(u))
      .withColumn("noise", expr(s"CAST(${dpNoiseSql("u")} AS BIGINT)"))
      .select(col("lang"), col("source"), col("n"), col("noise"),
        greatest(lit(0L), col("n") + col("noise")).as("n_dp"))
      .orderBy("lang", "source")
  }

  private val sk8Oracle: String = {
    val u = dpU96Sql("concat('dp1|', lang, '|', source)", "HUGEINT")
    s"""SELECT lang, source, n, CAST(${dpNoiseSql("u")} AS BIGINT) AS noise,
       |       GREATEST(0, n + (${dpNoiseSql("u")})) AS n_dp
       |FROM (SELECT lang, source, n, $u AS u
       |      FROM (SELECT lang, source, count(*) AS n FROM documents
       |            GROUP BY lang, source))
       |ORDER BY lang, source""".stripMargin
  }

  // ---- sk9: sharded heavy-hitters summary (frequent items) ----------------

  /** Counters kept per shard — also the heavy-hitter threshold
    * divisor (φ = 1/[[HhK]] of the stream).
    */
  private[ops] val HhK = 32

  /** Shard count — the "nodes" of the distributed summary. */
  private[ops] val HhShards = 16

  /** Frequent items — the classic streaming-summary member the sketch
    * family still lacked (Misra & Gries 1982; SpaceSaving, Metwally
    * et al. 2005): which tokens exceed φ = 1/[[HhK]] of the corpus?
    * Distributed by the key-partitioned layout every Spark summary
    * should use: tokens hash-shard by a PORTABLE polynomial
    * ([[Text.polyHashSql]] — the oracle computes the same shard), so
    * each shard holds its tokens' EXACT counts and keeps only its
    * top-[[HhK]] as the candidate summary — [[HhShards]]×[[HhK]]
    * counter rows total, the communication shape of distributed
    * heavy hitters (each node ships m counters, never a key set).
    *
    * The Misra-Gries guarantee survives sharding STRUCTURALLY: any
    * token with cnt·[[HhK]] > N can be out-ranked within its shard
    * only by tokens of ≥ its count — themselves heavy, and fewer
    * than [[HhK]] exist globally (their counts would else sum past
    * N) — so every true heavy hitter has shard-rank ≤ [[HhK]] and
    * the candidate set is provably a superset (asserted by the spec,
    * flagged per row by `is_heavy`).
    *
    * Scale shape: ONE corpus exchange — the (token)-keyed count,
    * map-side combined (tokens explode at the scan; raw text never
    * shuffles); the shard rank runs over the already-aggregated key
    * frame, and the output is 512 rows regardless of corpus size.
    * The total re-derives from the counts: in the logical plan `tot`
    * duplicates the `cnts` subtree, and the single-scan property
    * holds because AQE's runtime stage reuse dedupes the token-count
    * shuffle (a ReusedExchange in the FINAL adaptive plan — asserted
    * in PlanAuditSpec rather than claimed; the initial plan
    * legitimately prints two scans).
    */
  private def sk9HeavyHitters(s: SparkSession, d: String): DataFrame =
    sk9From(Tables.documents(s, d))

  /** The sk9 summary over an arbitrary documents frame (`text`) —
    * exposed so the spec can drive it over an adversarially skewed
    * plant (a ~90%-hot-token shard) where the Misra-Gries superset
    * guarantee actually earns its keep.
    */
  private[graft] def sk9From(docs: DataFrame): DataFrame = {
    val cnts = docs
      .select(explode(Text.wordsCol(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("shard",
        expr(s"CAST(${Text.polyHashSql("w", 8)} % $HhShards AS INT)"))
    val tot = cnts.agg(sum(col("cnt")).as("n"))
    val wShard = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("cnt").desc, col("w"))
    cnts
      .withColumn("srank", row_number().over(wShard))
      .filter(col("srank") <= HhK)
      .join(broadcast(tot))
      .select(col("shard"), col("w"), col("cnt"), col("srank"),
        when(col("cnt") * HhK > col("n"), lit(1)).otherwise(lit(0)).as("is_heavy"))
      .orderBy("shard", "srank")
  }

  private val sk9Oracle: String =
    s"""WITH toks AS (
       |  SELECT unnest(${Text.wordsSql("text")}) AS w FROM documents),
       |cnts AS (
       |  SELECT w, CAST(${Text.polyHashSql("w", 8)} % $HhShards AS INT) AS shard,
       |         count(*) AS cnt
       |  FROM toks GROUP BY w),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cnts),
       |ranked AS (
       |  SELECT shard, w, cnt,
       |         CAST(row_number() OVER (PARTITION BY shard
       |           ORDER BY cnt DESC, w) AS INT) AS srank
       |  FROM cnts)
       |SELECT r.shard, r.w, r.cnt, r.srank,
       |       CASE WHEN r.cnt * $HhK > t.n THEN 1 ELSE 0 END AS is_heavy
       |FROM ranked r, tot t
       |WHERE r.srank <= $HhK
       |ORDER BY r.shard, r.srank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk9_heavy_hitters" -> (sk9HeavyHitters _),
    "sk8_dp_counts" -> (sk8DpCounts _),
    "sk7_sample" -> (sk7Sample _),
    "sk6_kmv_setops" -> (sk6KmvSetops _),
    "sk1_kmv_distinct" -> (sk1KmvDistinct _),
    "sk2_bloom_filter" -> (sk2BloomFilter _),
    "sk3_count_min" -> (sk3CountMin _),
    "sk4_hll_distinct" -> (sk4HllDistinct _),
    "sk5_histogram" -> (sk5Histogram _)
  )

  val oracles: Map[String, String] = Map(
    "sk9_heavy_hitters" -> sk9Oracle,
    "sk8_dp_counts" -> sk8Oracle,
    "sk7_sample" -> sk7Oracle,
    "sk6_kmv_setops" -> sk6Oracle,
    "sk1_kmv_distinct" -> sk1Oracle,
    "sk2_bloom_filter" -> sk2Oracle,
    "sk3_count_min" -> sk3Oracle,
    "sk4_hll_distinct" -> sk4Oracle,
    "sk5_histogram" -> sk5Oracle
  )
}
