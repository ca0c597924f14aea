package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("p4: every pipeline stage bites — composition is never vacuous") {
    // the oracle pins p4's VALUES; this spec pins its MEANING: each
    // stage must actually change the data, or the capstone silently
    // degrades into a renamed p2
    val out = Pipeline.queries("p4_full_pipeline")(spark, sf).collect()
    val packedDocs = out.map(_.getAs[Long]("n_docs")).sum
    val packedTokens = out.map(_.getAs[Long]("bin_tokens")).sum
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), Text.wordsCol(col("text")).as("ws"))
    val nDocs = docs.count()
    val qual = docs.filter(
      size(col("ws")) >= 30 && size(col("ws")) <= 400 && col("doc_id") % 11 =!= 0)
    val nQual = qual.count()
    val qualTokens = qual.agg(sum(size(col("ws")))).head().getLong(0)
    assert(nQual < nDocs, "quality gate + eval-set removal must drop docs")
    assert(packedDocs <= nQual, "decontamination may only shrink the survivor set")
    assert(packedDocs > 0 && packedDocs < nDocs)
    assert(packedTokens < qualTokens,
      "span dedup must remove repeated spans' tokens before packing")
    assert(out.forall(_.getAs[Long]("bin_tokens") > 0), "no empty packs")
    // packing really is multi-bin per shard (running sums advanced)
    assert(out.map(_.getAs[Long]("shard")).distinct.length == 8)
    assert(out.length > 8, "each shard should overflow its first 2048-token bin")
  }
}
