package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("brute-force top-k returns 10 ranked neighbours per query") {
    val rows = Similarity.queries("s1_cosine_topk")(spark, sf).collect()
    assert(rows.length == 50) // 5 queries x 10
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to 10))
      // cosine non-increasing with rank
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH bucket probe returns a subset of each query's brute-force ordering") {
    val brute = Similarity.queries("s1_cosine_topk")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cos")).toMap
    val ann = Similarity.queries("s2_ann_bucket")(spark, sf).collect()
    assert(ann.nonEmpty, "64 buckets over 500 vectors must give non-empty probes")
    // any ANN hit that also appears in the brute-force top-10 must carry the same cosine
    ann.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))
      brute.get(key).foreach(c => assert(c == r.getAs[Double]("cos")))
    }
  }

  test("embedding dedup finds every planted re-embedding") {
    val rows = Similarity.queries("s3_embedding_dedup")(spark, sf).collect()
    val planted = rows
      .filter(r => r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 1000000L)
      .map(_.getAs[Long]("id_a")).toSet
    // scaled copies are bit-near-identical: every one of the 20 must share
    // all signature bits with its original and survive cos >= 0.999
    assert(planted == (0L until 20L).toSet,
      s"missing planted pairs: ${(0L until 20L).toSet -- planted}")
    assert(rows.forall(_.getAs[Double]("cos") >= 0.999))
  }
}
