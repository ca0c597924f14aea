package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t40 distributed BPE training: fold semantics pinned on planted
  * arrays, then the whole learned merge table checked against an
  * independent driver-side scalar implementation on the real sf0.001
  * corpus (the same role the DuckDB oracle plays, but runnable inside
  * the build).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bpe rewrite is greedy left-to-right: aaa -> [M,a], aaaa -> [M,M]") {
    val spark0 = spark; import spark0.implicits._
    val df = Seq(
      Seq(97L, 97L, 97L),
      Seq(97L, 97L, 97L, 97L),
      Seq(98L, 97L, 97L),
      Seq(97L)
    ).toDF("syms")
    val out = df
      .select(expr(Text.bpeRewriteSql(97L, 97L, 500L)).as("m"))
      .as[Seq[Long]].collect()
    assert(out(0) == Seq(500L, 97L), "first pair wins in an overlap run")
    assert(out(1) == Seq(500L, 500L))
    assert(out(2) == Seq(98L, 500L))
    assert(out(3) == Seq(97L), "no-match word passes through")
  }

  test("a fully-merged single-symbol word contributes zero pairs, not a throw") {
    // sequence(1, 0) is Spark's DESCENDING [1, 0] — the filter over
    // ascending sequence(1, size) is what keeps a word collapsed to
    // one symbol from evaluating element_at(syms, size+1)
    val spark0 = spark; import spark0.implicits._
    val words = Seq((Seq(500L), 7L), (Seq(97L, 98L), 3L)).toDF("syms", "cnt")
    val pc = Text.bpePairCounts(words).collect()
    assert(pc.length == 1)
    assert((pc(0).getLong(0), pc(0).getLong(1), pc(0).getLong(2)) == ((97L, 98L, 3L)))
  }

  /** Scalar reference: word frequency -> iterated (argmax pair, greedy
    * rewrite). No code shared with the Spark path.
    */
  private def referenceBpe(texts: Seq[String], rounds: Int): Seq[(Int, Long, Long, Long, Long)] = {
    val words = scala.collection.mutable.Map.empty[List[Long], Long].withDefaultValue(0L)
    for (t <- texts; w <- t.split(" ") if w.nonEmpty && w.length <= Text.BpeMaxWordLen)
      words(w.toCharArray.map(_.toLong).toList :+ 0L) += 1L
    var tbl: Map[List[Long], Long] = words.toMap
    (1 to rounds).map { k =>
      val pc = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
      for ((syms, c) <- tbl; Seq(a, b) <- syms.sliding(2)) pc((a, b)) += c
      val ((l, r), c) = pc.toSeq.minBy { case ((pl, pr), pcnt) => (-pcnt, pl, pr) }
      val m = Text.BpeMergeBase + k
      tbl = tbl.toSeq
        .map { case (syms, cnt) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[Long]
          for (x <- syms) {
            if (acc.nonEmpty && acc.last == l && x == r) acc(acc.length - 1) = m
            else acc += x
          }
          (acc.toList, cnt)
        }
        .groupBy(_._1).map { case (s2, xs) => (s2, xs.map(_._2).sum) }
      (k, l, r, m, c)
    }
  }

  test("t40 learned merge table equals the scalar reference on sf0.001") {
    val spark0 = spark; import spark0.implicits._
    val got = graft.SparkEntry.queries("t40_bpe_train")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val texts = graft.Tables.documents(spark, sf).select("text").as[String].collect().toSeq
    val want = referenceBpe(texts, Text.BpeRounds)
    assert(got == want)
    // classic BPE invariant: a merge can only create pairs no more
    // frequent than the one it consumed, so the elected frequency is
    // non-increasing over rounds — a cheap canary for count drift
    val freqs = got.map(_._5)
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b },
      s"pair frequencies must be non-increasing, got $freqs")
    // learned symbols must re-enter later merges (the depth argument
    // for 24 rounds): at least one elected pair references a learned id
    assert(got.exists { case (_, l, r, _, _) =>
      l >= Text.BpeMergeBase || r >= Text.BpeMergeBase })
  }
}
