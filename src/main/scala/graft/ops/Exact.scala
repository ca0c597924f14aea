package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic floating aggregates for oracle parity.
  *
  * `round(sum(double), 2)` is a trap twice over: partial aggregation
  * reorders double addition (±ulps run to run), and Spark's round is
  * decimal-string HALF_UP while DuckDB rounds the raw double — on an
  * exact .xx5 boundary they disagree. Money columns in the harness
  * have ≤4 decimal digits, so summing in DECIMAL(18,4) is exact and
  * order-insensitive; casting the final sum to double is then the
  * same bit pattern in every engine. Per-row scalar arithmetic needs
  * no treatment at all — identical IEEE ops produce identical bits.
  *
  * At scale this costs one 128-bit accumulator per group instead of a
  * double — still map-side-combinable, no extra shuffle.
  */
object Exact {
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Oracle-side SQL for the same aggregates. */
  def sqlSum(x: String): String = s"CAST(sum(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlAvg(x: String): String = s"${sqlSum(x)} / count(*)"
}
