package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("t32 survives degenerate documents (0/1-word) and drops them like the oracle") {
    // Spark's sequence(1, 0) is the DESCENDING [1, 0]; without the
    // size guard the bigram transform evaluates element_at(ws, 0) and
    // the whole job throws on any 0/1-word doc. The guard must make
    // such docs silently bigram-free — matching DuckDB's empty
    // generate_series — while normal docs still score.
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (0L, ""), // empty
      (1L, "single"), // one word
      (2L, "   "), // whitespace only
      (3L, "alpha beta alpha beta gamma"),
      (4L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val dir = s"target/tmp/graft-t32-${System.nanoTime()}" // build dir, not /tmp
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Text.queries("t32_bigram_lm")(spark, dir).collect()
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(3L, 4L), s"degenerate docs must drop out, got $ids")
    assert(rows.forall(_.getAs[Long]("n_bigrams") > 0))
  }
}
