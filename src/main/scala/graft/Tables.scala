package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md). All queries
  * take an `sfDir` so the same code runs at any scale factor; at
  * cluster scale the same paths would be object-store URIs and the
  * parquet reader's partitioning (maxPartitionBytes) does the rest.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** Normalize the events `ts` column to a session-zone microsecond
    * TimestampType regardless of which physical layout the fixture
    * generation shipped (see FIXTURES.md — the driver has regenerated
    * the testdata with different layouts between rounds):
    *
    *   - `LongType`: parquet TIMESTAMP(NANOS) read under
    *     `spark.sql.legacy.parquet.nanosAsLong` ([[GraftSession]]) —
    *     truncate ns→µs with integer `DIV` (not `/`: epoch-nanos
    *     ~1.7e18 exceeds double's 2^53 exact range). DuckDB performs
    *     the same truncation on read, so oracle comparisons stay exact.
    *   - `TimestampNTZType`: parquet `timestamp[us]`
    *     (isAdjustedToUTC=false). The session timezone is UTC, so the
    *     NTZ→LTZ cast is value-identical and DuckDB (which reads it as
    *     a plain TIMESTAMP) agrees bit-for-bit.
    *   - `TimestampType`: already the target type (e.g. re-reads of
    *     frames this engine wrote itself).
    *
    * Anything else fails loudly here, naming the variants, instead of
    * as an analysis error thirty plans deep.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.parquet: unsupported ts type $other — expected nanos-long " +
          "(TIMESTAMP(NANOS) under nanosAsLong), TIMESTAMP_NTZ (timestamp[us]), " +
          "or TIMESTAMP; see FIXTURES.md")
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(t(s, d, "events"))

  /** Parallelism floor for COMPUTE-DENSE scan legs (codec encode/
    * decode, dense pairwise text compare): the fixture ships each
    * table as ONE parquet row group, so every scan is a single task no
    * matter what `maxPartitionBytes`/`minPartitionNum` say (a
    * byte-range split cannot cut inside a row group), and a 10 s codec
    * leg runs on 1 of 32 cores. Guide §2.5's input-skew remedy: fix at
    * the source if you can; otherwise repartition immediately after
    * the read. The repartition is CONDITIONAL on the scan actually
    * under-delivering, so on a production layout (many files / row
    * groups, where the scan fans out by itself) this is a no-op — no
    * payload ever shuffles — while on the fixture it costs one
    * exchange of the slim document rows (~0.5 MB at sf0.1), orders of
    * magnitude below the per-row compute it spreads out. Row placement
    * is not observable in any declared query (keyed aggregates/joins/
    * windows everywhere; integer-exact arithmetic), so results are
    * bit-identical — re-verified against the oracle.
    *
    * Applied ONLY at the codec/pairwise chokepoints ([[graft.ops
    * .Multimodal.assets]], d13's suffix build): measured on the full
    * probe set, a blanket fanOut inside [[documents]] helped the codec
    * gates 3-4× but cost the light documents-readers (t45 0.76→1.24 s,
    * p13 0.76→1.25 s min-of-5) — their scan stage is trivial and the
    * extra exchange re-executes at every self-reference of the
    * documents subtree.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }

  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
