package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("exact dedup finds exactly the planted re-ingests") {
    val rows = Dedup.queries("d1_exact_dedup")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getAs[Long]("dup_id") == r.getAs[Long]("canonical_id") + 1000000L))
    assert(rows.forall(_.getAs[Long]("n_copies") == 2L))
  }

  test("minhash-LSH recall: finds every pair exact shingle-Jaccard would flag") {
    // ground truth by brute force over all pairs (only feasible at sf0.001)
    val lsh = Dedup.queries("d3_minhash_lsh")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = graft.Tables.documents(spark, sf)
      .withColumn("words", Text.wordsCol(col("text")))
      .withColumn("hw", expr(s"transform(words, w -> ${Text.polyHashSql("w", 8)})"))
      .withColumn("shs", expr(
        """array_distinct(transform(
          |  arrays_zip(slice(hw, 1, size(hw)-2), slice(hw, 2, size(hw)-2), slice(hw, 3, size(hw)-2)),
          |  t -> ((((t['0'] % 2147483647) * 1000003 + t['1']) % 2147483647) * 1000003 + t['2']) % 2147483647))""".stripMargin))
      .select(col("doc_id"), col("shs"))
    val truth = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.shs"), col("b.shs"))).cast("double") /
          size(array_union(col("a.shs"), col("b.shs")))).as("jac"))
      .filter(col("jac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == truth,
      s"LSH missed ${truth -- lsh} / invented ${lsh -- truth}")
  }

  test("minhash estimate approximates true jaccard on the flagged pairs") {
    val rows = Dedup.queries("d3_minhash_lsh")(spark, sf).collect()
    assert(rows.nonEmpty)
    // flagged pairs carry exact-verified jaccard >= 0.5 by construction
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("simhash near pairs have genuinely close fingerprints") {
    val rows = Dedup.queries("d4_simhash")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      java.lang.Long.bitCount(r.getAs[Long]("fp_a") ^ r.getAs[Long]("fp_b")) ==
        r.getAs[Int]("hamming") && r.getAs[Int]("hamming") <= 3
    })
  }
}
