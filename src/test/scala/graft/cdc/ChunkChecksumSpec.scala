package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locally-executable pin of cdc_chunk_checksum's two planted drift
  * classes — the oracle asserts the same thing at sf0.01 per round,
  * but this spec keeps the CAPABILITY claim checkable at sf0.001 in
  * one JVM if fixtures drift again (the r12 lesson): the modular
  * plants (`%125` drop, `%111` mutate) must actually OCCUR in the
  * key range, and each must be classified the way a replica-drift
  * detector classifies it (count gap vs count-equal digest mismatch).
  */
class ChunkChecksumSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("chunk checksum pins both drift classes: count gap and count-equal digest mismatch") {
    // expected per-chunk plant counts, derived from the key range
    // itself so the spec survives fixture regeneration
    val plants = graft.Tables.customer(spark, sf)
      .groupBy(expr("c_custkey DIV 50").as("chunk_id"))
      .agg(
        sum(when(col("c_custkey") % 125 === 124, 1L).otherwise(0L)).as("dropped"),
        sum(when(col("c_custkey") % 125 =!= 124 && col("c_custkey") % 111 === 37, 1L)
          .otherwise(0L)).as("mutated"))
      .collect()
      .map(r => r.getAs[Long]("chunk_id") ->
        (r.getAs[Long]("dropped"), r.getAs[Long]("mutated"))).toMap
    // the sf must exercise BOTH failure classes — if the key range
    // ever shrinks below the plant moduli this fails loudly instead
    // of the gate silently degenerating to all-match
    assert(plants.values.exists(_._1 > 0), "no chunk carries a dropped-row plant")
    assert(plants.values.exists(p => p._1 == 0 && p._2 > 0),
      "no chunk carries a pure-corruption plant (count equal, content drifted)")
    val got = CdcQueries.queries("cdc_chunk_checksum")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val chunk = r.getAs[Long]("chunk_id")
      val (dropped, mutated) = plants(chunk)
      val (srcRows, dstRows) = (r.getAs[Long]("src_rows"), r.getAs[Long]("dst_rows"))
      val (srcSum, dstSum) = (r.getAs[Long]("src_sum"), r.getAs[Long]("dst_sum"))
      val matched = r.getAs[Int]("chunk_match") == 1
      // class 1: a dropped row is a COUNT gap of exactly the plant size
      assert(srcRows - dstRows == dropped, s"chunk $chunk: count gap vs plant")
      // class 2: corruption without drops keeps counts equal but must
      // break the digest — the failure mode a row-count-only audit misses
      if (dropped == 0 && mutated > 0)
        assert(srcRows == dstRows && srcSum != dstSum,
          s"chunk $chunk: corruption must surface as a digest mismatch, not a count gap")
      // and a chunk matches exactly when it carries no plant at all
      assert(matched == (dropped == 0 && mutated == 0),
        s"chunk $chunk: match flag disagrees with plants ($dropped dropped, $mutated mutated)")
    }
  }
}
