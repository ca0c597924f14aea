package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer for [[BottomKSampleAgg]]: the k (hash, id) pairs with the
  * smallest hashes seen so far, kept sorted. MULTISET semantics — a
  * duplicated input row occupies two sample slots, exactly as a
  * rank-over-hash formulation counts it (the oracle's `row_number`),
  * so the two stay row-for-row comparable even on data with duplicate
  * keys. Insertion and merge are order-insensitive, so the aggregate
  * is safe as a shuffle partial — each (group, partition) ships at
  * most k pairs, and every input row is aggregated exactly once.
  */
final case class SampleBuffer(k: Int, rows: Vector[(String, Long)]) {
  def add(r: (String, Long)): SampleBuffer =
    if (rows.length < k) copy(rows = (rows :+ r).sorted)
    else if (Ordering[(String, Long)].lt(r, rows.last))
      copy(rows = (rows.init :+ r).sorted)
    else this
  def mergeWith(o: SampleBuffer): SampleBuffer = o.rows.foldLeft(this)(_ add _)
}

/** Deterministic bottom-k-by-hash row sampler — the mergeable answer
  * to "give me a uniform sample per group" that a 100 TB curation
  * pipeline needs: because md5 is uniform, the k rows with the
  * smallest hashes ARE a uniform k-sample, and because bottom-k is
  * an order-insensitive algebra (multiset flavor — unlike [[KmvAgg]]
  * it deliberately KEEPS duplicate pairs, matching a rank-over-hash
  * count; every input row must be aggregated exactly once, which
  * Spark's aggregation path guarantees), the sample computes with
  * map-side partials — no per-group full sort, no window over all
  * rows, no RNG state, and any re-run / repartitioning / engine
  * yields the IDENTICAL sample (the same determinism contract as
  * t33's masking and p3's shard shuffle). Ties (hash collisions)
  * break on the id, so the result is a pure function of the data.
  */
object BottomKSampleAgg extends Aggregator[(String, Long), SampleBuffer, Seq[(String, Long)]] {
  val K = 4
  override def zero: SampleBuffer = SampleBuffer(K, Vector.empty)
  override def reduce(b: SampleBuffer, a: (String, Long)): SampleBuffer = b.add(a)
  override def merge(a: SampleBuffer, b: SampleBuffer): SampleBuffer = a.mergeWith(b)
  override def finish(b: SampleBuffer): Seq[(String, Long)] = b.rows
  override def bufferEncoder: Encoder[SampleBuffer] = Encoders.kryo[SampleBuffer]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
