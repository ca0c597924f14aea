package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q54 PageRank: the full rank vector checked against an independent
  * driver-side scalar power iteration on sf0.001 (the DuckDB oracle's
  * role, runnable inside the build), plus the structural invariants —
  * mass conservation under floor division and hub dominance.
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val Mass = 1000000000000L
  private val SuppBase = 1000000L

  /** Scalar reference: same integer-floor arithmetic, no shared code. */
  private def referencePr(pairs: Seq[(Long, Long)], rounds: Int)
      : Map[Long, (Long, Long)] = {
    val edges = pairs.flatMap { case (c, s) =>
      Seq((c, s + SuppBase), (s + SuppBase, c))
    }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = deg.size.toLong
    val teleport = (15L * Mass) / (100L * n)
    var r: Map[Long, Long] = deg.keys.map(_ -> Mass / n).toMap
    for (_ <- 1 to rounds) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((src, dst) <- edges) in(dst) += r(src) / deg(src)
      r = deg.keys.map(k => k -> (teleport + (85L * in(k)) / 100L)).toMap
    }
    r.map { case (k, v) => k -> (deg(k), v) }
  }

  test("q54 rank vector equals the scalar power iteration on sf0.001") {
    val spark0 = spark; import spark0.implicits._
    val got = graft.SparkEntry.queries("q54_pagerank")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_suppkey"))
      .distinct()
      .as[(Long, Long)].collect().toSeq
    val want = referencePr(pairs, 5)
    assert(got.length == want.size)
    for ((node, deg, rank) <- got) {
      assert(want(node) == ((deg, rank)),
        s"node $node: got (deg=$deg, rank=$rank), want ${want(node)}")
    }
    // mass conservation under floor division: each node loses < 1
    // scaled unit to the teleport DIV and < 1 to the damping DIV, and
    // each contribution loses < 1 per incoming edge — the total can
    // only drift DOWN from Mass, bounded by edges + 2n per round
    val total = got.map(_._3).sum
    val n = got.length.toLong
    val nEdges = got.map(_._2).sum
    assert(total <= Mass, "floor division can only lose mass")
    assert(Mass - total <= 5L * (nEdges + 2L * n),
      s"lost ${Mass - total} of $Mass — more than rounding can explain")
    // the graph is bipartite with far fewer suppliers than customers,
    // so supplier hubs must outrank the customer median decisively
    val (supp, cust) = got.partition(_._1 >= SuppBase)
    assert(supp.nonEmpty && cust.nonEmpty)
    val custSorted = cust.map(_._3).sorted
    val custMedian = custSorted(custSorted.length / 2)
    assert(supp.map(_._3).max > 10L * custMedian,
      "supplier hubs must dominate the customer median rank")
  }

  test("q55: every planted violation is counted once, nothing real is flagged") {
    val rows = graft.SparkEntry.queries("q55_dq_audit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val nOrders = graft.Tables.orders(spark, sf).count()
    val nLine = graft.Tables.lineitem(spark, sf).count()
    val want = Seq(
      ("fk_lineitem_orders", "lineitem", nLine + 3, 1L),
      ("fk_orders_customer", "orders", nOrders + 4, 1L),
      ("neg_price", "lineitem", nLine + 3, 1L),
      ("null_custkey", "orders", nOrders + 4, 1L),
      ("pk_dup_orders", "orders", nOrders + 4, 1L),
      ("range_quantity", "lineitem", nLine + 3, 1L))
    assert(rows == want,
      s"audit must count exactly the plants:\n got $rows\nwant $want")
  }

  test("q56: every customer gets the full calendar and the fill carries the last observation") {
    val rows = graft.SparkEntry.queries("q56_gap_fill")(spark, sf).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Long]("month_id"),
        r.getAs[Long]("n_orders"), r.getAs[Long]("spend_cents"),
        r.getAs[Long]("filled_cents"), r.getAs[Int]("is_gap")))
    assert(rows.nonEmpty)
    val months = rows.map(_._2).distinct.sorted.toSeq
    assert(months == (months.head to months.last).toSeq,
      "the calendar must be contiguous")
    val byCust = rows.groupBy(_._1)
    byCust.foreach { case (c, rs) =>
      assert(rs.map(_._2).sorted.toSeq == months,
        s"customer $c must be densified onto the full calendar")
      // forward fill, replayed scalar-side
      var lastSeen = 0L
      rs.sortBy(_._2).foreach { case (_, m, n, spend, filled, gap) =>
        if (gap == 0) { assert(n > 0); lastSeen = spend }
        else assert(n == 0L && spend == 0L, s"gap row for $c/$m must carry no observation")
        assert(filled == lastSeen, s"fill drifted for customer $c month $m")
      }
    }
    // gaps genuinely exist and genuinely carry values across them
    assert(rows.exists(_._6 == 1), "fixture must contain monthly gaps")
    assert(rows.exists(r => r._6 == 1 && r._5 > 0L),
      "some gap must carry a non-zero forward-filled value")
  }

  test("q58: every status equals the scalar diff of the planted snapshots") {
    val got = graft.SparkEntry.queries("q58_snapshot_diff")(spark, sf).collect()
      .map(r => r.getAs[String]("status") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("key_sum")))).toMap
    assert(got.keySet == Set("added", "removed", "changed", "unchanged"),
      "all four change classes must fire in the planted fixture")
    // scalar reference: replay the plants over the collected base rows
    val base = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Double]("c_acctbal")))
    val keys = base.map(_._1).toSet
    val removed = base.map(_._1).filter(_ % 97 == 0)
    val changed = base.map(_._1).filter(k => k % 97 != 0 && k % 13 == 0)
    val added = base.map(_._1).filter(_ % 101 == 0).map(_ + 10000000L)
    val unchanged = base.map(_._1).filter(k => k % 97 != 0 && k % 13 != 0)
    assert(added.forall(k => !keys(k)), "shifted inserts must be genuinely new keys")
    def stat(ks: Seq[Long]) = (ks.length.toLong, ks.sum)
    assert(got("added") == stat(added), "added accounting drifted")
    assert(got("removed") == stat(removed), "removed accounting drifted")
    assert(got("changed") == stat(changed), "changed accounting drifted")
    assert(got("unchanged") == stat(unchanged), "unchanged accounting drifted")
    // a +1.00 balance mutation always moves the integer-cents digest:
    // the changed count must be exactly the %13 survivors, never fewer
    assert(got("changed")._1 == changed.length.toLong)
  }

  /** Scalar PageRank rounds from an explicit init — q59's warm/cold
    * replay unit, no shared code with the operator.
    */
  private def referenceRounds(pairs: Seq[(Long, Long)],
      init: Map[Long, Long] => Map[Long, Long], rounds: Int)
      : (Map[Long, Long], Map[Long, Long], Long) = {
    val edges = pairs.flatMap { case (c, s) =>
      Seq((c, s + SuppBase), (s + SuppBase, c))
    }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = deg.size.toLong
    val teleport = (15L * Mass) / (100L * n)
    def round(r: Map[Long, Long]): Map[Long, Long] = {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((src, dst) <- edges) in(dst) += r(src) / deg(src)
      deg.keys.map(k => k -> (teleport + (85L * in(k)) / 100L)).toMap
    }
    val uniform = deg.keys.map(_ -> Mass / n).toMap
    var r = init(uniform)
    for (_ <- 1 to rounds) r = round(r)
    (r, round(r), n) // (iterate, one-more-round residual witness, n)
  }

  test("q59: warm/cold trajectories and residuals equal the scalar replay; warm dominates") {
    val spark0 = spark; import spark0.implicits._
    def pairsOf(where: String) =
      graft.Tables.orders(spark, sf).filter(where)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.Tables.lineitem(spark, sf)
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey")).distinct()
        .as[(Long, Long)].collect().toSeq
    val p0 = pairsOf("o_orderdate < timestamp '2000-01-01'")
    val p0set = p0.toSet
    val dels = p0.filter { case (c, sk) =>
      (c * 31 + sk) % Relational3.PrDelMod == Relational3.PrDelRem }.toSet
    val ins = pairsOf("o_orderdate >= timestamp '2000-01-01'")
      .filter(!p0set(_))
    assert(dels.nonEmpty && ins.nonEmpty, "both batch halves must fire")
    val p1 = p0.filterNot(dels) ++ ins
    // standing ranks: 5 rounds from uniform on the base slice
    val (standing, _, _) = referenceRounds(p0, identity, 5)
    val (warm, warm1, _) = referenceRounds(p1,
      u => u.map { case (k, v) => k -> standing.getOrElse(k, v) }, 5)
    val (cold, cold1, _) = referenceRounds(p1, identity, 5)
    val got = graft.SparkEntry.queries("q59_pagerank_maint")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == warm.size, "node set drifted")
    for ((node, _, rw, rc, resW, resC) <- got) {
      assert(rw == warm(node), s"warm rank drifted at $node")
      assert(rc == cold(node), s"cold rank drifted at $node")
      assert(resW == math.abs(warm1(node) - warm(node)),
        s"warm residual drifted at $node")
      assert(resC == math.abs(cold1(node) - cold(node)),
        s"cold residual drifted at $node")
    }
    // the convergence claim the gate enforces, replayed independently
    assert(got.map(_._5).sum < got.map(_._6).sum,
      "warm start must sit strictly closer to the fixed point")
  }

  test("q59: rounds-to-residual-ε — the warm start's dividend in the practitioner's unit") {
    // The gate pins residuals at a FIXED round budget; the number an
    // operator actually budgets with is the converse: how many rounds
    // does each start need to reach a given quality? ε is defined as
    // exactly the quality the cold start buys with the gate's
    // 5-round budget (‖T(r)−r‖₁ after 5 cold rounds on the perturbed
    // graph); the warm start must reach it in strictly fewer rounds.
    // Scalar replay (the referenceRounds arithmetic), sf0.001.
    val spark0 = spark; import spark0.implicits._
    def pairsOf(where: String) =
      graft.Tables.orders(spark, sf).filter(where)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.Tables.lineitem(spark, sf)
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_suppkey")).distinct()
        .as[(Long, Long)].collect().toSeq
    val p0 = pairsOf("o_orderdate < timestamp '2000-01-01'")
    val p0set = p0.toSet
    val dels = p0.filter { case (c, sk) =>
      (c * 31 + sk) % Relational3.PrDelMod == Relational3.PrDelRem }.toSet
    val ins = pairsOf("o_orderdate >= timestamp '2000-01-01'")
      .filter(!p0set(_))
    val p1 = p0.filterNot(dels) ++ ins
    val edges = p1.flatMap { case (c, s) =>
      Seq((c, s + SuppBase), (s + SuppBase, c))
    }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = deg.size.toLong
    val teleport = (15L * Mass) / (100L * n)
    def round(r: Map[Long, Long]): Map[Long, Long] = {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((src, dst) <- edges) in(dst) += r(src) / deg(src)
      deg.keys.map(k => k -> (teleport + (85L * in(k)) / 100L)).toMap
    }
    def residual(r: Map[Long, Long]): Long = {
      val nx = round(r)
      deg.keys.iterator.map(k => math.abs(nx(k) - r(k))).sum
    }
    val uniform: Map[Long, Long] = deg.keys.map(_ -> Mass / n).toMap
    // ε: the cold budget's quality
    var rc = uniform
    for (_ <- 1 to 5) rc = round(rc)
    val eps = residual(rc)
    def roundsTo(init: Map[Long, Long], cap: Int = 50): Int = {
      var r = init; var k = 0
      while (residual(r) > eps && k < cap) { r = round(r); k += 1 }
      k
    }
    val (standing, _, _) = referenceRounds(p0, identity, 5)
    val warmRounds = roundsTo(
      uniform.map { case (k, v) => k -> standing.getOrElse(k, v) })
    val coldRounds = roundsTo(uniform)
    println(s"[q59] rounds to residual eps=$eps: warm=$warmRounds cold=$coldRounds (gate budget 5)")
    assert(coldRounds <= 5, "cold must reach its own budget quality within the budget")
    assert(warmRounds < coldRounds,
      s"warm start must reach the cold budget's quality in fewer rounds " +
        s"($warmRounds vs $coldRounds)")
  }

  test("q59: the incrementally-maintained graph equals a from-scratch rebuild exactly") {
    val cutoff = lit("2000-01-01").cast("timestamp")
    val pairs0 = Relational3.prPairsWhere(spark, sf,
      col("o_orderdate") < cutoff).localCheckpoint(true)
    val deg0 = Relational3.prEdges(pairs0)
      .groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val edgesDeg0 = Relational3.prEdges(pairs0).join(deg0, "src")
      .localCheckpoint(true)
    val dels = pairs0.filter(
      (col("c") * 31 + col("sk")) % Relational3.PrDelMod === Relational3.PrDelRem)
    val ins = Relational3.prPairsWhere(spark, sf, col("o_orderdate") >= cutoff)
      .join(pairs0, Seq("c", "sk"), "left_anti")
    val (edgesDeg1, deg1) = Relational3.q59MaintainGraph(
      edgesDeg0, deg0, ins.localCheckpoint(true), dels.localCheckpoint(true))
    // from-scratch rebuild of the perturbed graph
    val pairs1 = pairs0
      .filter((col("c") * 31 + col("sk")) % Relational3.PrDelMod =!= Relational3.PrDelRem)
      .unionByName(ins)
    val degS = Relational3.prEdges(pairs1)
      .groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDegS = Relational3.prEdges(pairs1).join(degS, "src")
    assert(deg1.exceptAll(degS).isEmpty && degS.exceptAll(deg1).isEmpty,
      "incremental degree table drifted from the rebuild")
    assert(edgesDeg1.exceptAll(edgesDegS).isEmpty &&
      edgesDegS.exceptAll(edgesDeg1).isEmpty,
      "incremental adjacency drifted from the rebuild")
  }
}
