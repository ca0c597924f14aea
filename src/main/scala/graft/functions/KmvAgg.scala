package graft.functions

import scala.collection.immutable.TreeSet

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV) buffer: the `k` smallest DISTINCT hash
  * values seen so far. Bottom-k is order-insensitive and idempotent
  * (re-adding a kept value is a no-op, re-adding an evicted one is
  * re-evicted), so the aggregate is safe as a shuffle partial: Spark
  * runs `reduce` map-side and `merge` on the exchange, and each
  * (group, partition) ships at most `k` longs — the sketch property
  * that makes distinct-count estimation O(k) per group at any scale.
  */
final case class KmvBuffer(k: Int, values: TreeSet[Long]) {
  def add(v: Long): KmvBuffer =
    if (values.contains(v)) this
    else if (values.size < k) copy(values = values + v)
    else if (v < values.max) copy(values = values + v - values.max)
    else this
  def mergeWith(o: KmvBuffer): KmvBuffer = o.values.foldLeft(this)(_ add _)
}

/** KMV distinct-count sketch over 48-bit uniform hashes (Beyer et al.,
  * SIGMOD'07): keep the k=64 smallest distinct values; if the k-th
  * smallest is `m`, the distinct count is ≈ (k−1)·2^48/m. The whole
  * estimation pipeline stays in exact integer arithmetic (the final
  * division is integer DIV), so a SQL oracle reproduces it
  * bit-for-bit — unlike HLL-style sketches whose engine-internal
  * hashing can never match across engines.
  *
  * Output is the raw sketch summary (kept count, k-th minimum);
  * the estimate formula lives in the query so the oracle can apply
  * the identical expression.
  */
object KmvAgg extends Aggregator[Long, KmvBuffer, (Int, Long)] {
  val K = 64
  override def zero: KmvBuffer = KmvBuffer(K, TreeSet.empty[Long])
  override def reduce(b: KmvBuffer, v: Long): KmvBuffer = b.add(v)
  override def merge(b1: KmvBuffer, b2: KmvBuffer): KmvBuffer = b1.mergeWith(b2)
  /** (number of kept values, k-th smallest — 0 when under-full: the
    * kept count IS the exact distinct count then).
    */
  override def finish(b: KmvBuffer): (Int, Long) =
    (b.values.size, if (b.values.size >= K) b.values.max else 0L)
  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.kryo[KmvBuffer]
  override def outputEncoder: Encoder[(Int, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/** Bottom-k SET sketch: [[KmvAgg]]'s buffer, but `finish` hands back
  * the kept minima themselves (ascending) — the representation KMV
  * set ALGEBRA needs: a union sketch is the bottom-k of two sketches'
  * concatenation, and the Jaccard numerator counts union-sketch
  * members present in both inputs (Beyer et al., SIGMOD'07 §4). The
  * shuffle stays O(k) per (group, partition) partial, same as the
  * summary form.
  */
object KmvSetAgg extends Aggregator[Long, KmvBuffer, Array[Long]] {
  override def zero: KmvBuffer = KmvAgg.zero
  override def reduce(b: KmvBuffer, v: Long): KmvBuffer = b.add(v)
  override def merge(b1: KmvBuffer, b2: KmvBuffer): KmvBuffer = b1.mergeWith(b2)
  override def finish(b: KmvBuffer): Array[Long] = b.values.toArray
  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.kryo[KmvBuffer]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
