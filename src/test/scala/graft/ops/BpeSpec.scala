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
    * rewrite). No code shared with the Spark path. Returns the merge
    * table and the final word -> symbols vocabulary (t41's state).
    */
  private def referenceBpe(texts: Seq[String], rounds: Int)
      : (Seq[(Int, Long, Long, Long, Long)], Map[String, List[Long]]) = {
    val cnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (t <- texts; w <- t.split(" ") if w.nonEmpty && w.length <= Text.BpeMaxWordLen)
      cnt(w) += 1L
    var syms: Map[String, List[Long]] =
      cnt.keys.map(w => w -> (w.toCharArray.map(_.toLong).toList :+ 0L)).toMap
    val merges = (1 to rounds).map { k =>
      val pc = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
      for ((w, ss) <- syms; Seq(a, b) <- ss.sliding(2)) pc((a, b)) += cnt(w)
      val ((l, r), c) = pc.toSeq.minBy { case ((pl, pr), pcnt) => (-pcnt, pl, pr) }
      val m = Text.BpeMergeBase + k
      syms = syms.map { case (w, ss) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[Long]
        for (x <- ss) {
          if (acc.nonEmpty && acc.last == l && x == r) acc(acc.length - 1) = m
          else acc += x
        }
        w -> acc.toList
      }
      (k, l, r, m, c)
    }
    (merges, syms)
  }

  test("t40 learned merge table equals the scalar reference on sf0.001") {
    val spark0 = spark; import spark0.implicits._
    val got = graft.SparkEntry.queries("t40_bpe_train")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val texts = graft.Tables.documents(spark, sf).select("text").as[String].collect().toSeq
    val want = referenceBpe(texts, Text.BpeRounds)._1
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

  test("t41 encoding equals the scalar reference per document and merges really compress") {
    val spark0 = spark; import spark0.implicits._
    val rows = graft.SparkEntry.queries("t41_bpe_encode")(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val vocab = referenceBpe(docs.map(_._2), Text.BpeRounds)._2
    val want = docs.map { case (id, t) =>
      val ws = t.split(" ").filter(w => w.nonEmpty && w.length <= Text.BpeMaxWordLen)
      val chars = ws.map(_.length.toLong).sum
      val bpe = ws.map(w => vocab(w).length.toLong).sum
      (id, ws.length.toLong, chars, bpe,
        1000L * (chars + ws.length - bpe) / (chars + ws.length))
    }.filter(_._2 > 0).sortBy(_._1)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    // every doc's token count is bounded by the zero-merge baseline
    // (chars + end markers), and the learned merges bite somewhere
    assert(got.forall { case (_, nw, nc, nb, _) => nb <= nc + nw })
    assert(got.exists { case (_, nw, nc, nb, _) => nb < nc + nw },
      "24 merges must compress at least one document")
  }

  test("t42 decode round trip: expansion restores every word's exact codepoints") {
    val spark0 = spark; import spark0.implicits._
    val rows = graft.SparkEntry.queries("t42_bpe_decode")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val texts = graft.Tables.documents(spark, sf).select("text").as[String].collect().toSeq
    val (_, vocab) = referenceBpe(texts, Text.BpeRounds)
    assert(rows.map(_._1).toSet == vocab.keySet)
    val P = 2147483647L
    for ((w, _, nTok, nDec, hash) <- rows) {
      assert(nTok == vocab(w).length.toLong, s"trained token count drifted for '$w'")
      // the lossless contract, recomputed from the word itself with
      // no shared code: decoded sequence == raw codepoints + terminal 0
      val want = w.toCharArray.map(_.toLong) :+ 0L
      assert(nDec == want.length.toLong, s"decoded length wrong for '$w'")
      val wantHash = want.foldLeft(0L)((a, x) => (a * 1000003L + x) % P)
      assert(hash == wantHash, s"decode of '$w' does not restore the codepoints")
      // decode must actually undo work somewhere: trained <= decoded
      assert(nTok <= nDec)
    }
    assert(rows.exists { case (_, _, nTok, nDec, _) => nTok < nDec },
      "at least one word must have been compressed and re-expanded")
  }
}
