package graft

import org.apache.spark.sql.functions._
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
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 reads as a plain nanos-long only under
    * `spark.sql.legacy.parquet.nanosAsLong` — set once at session
    * construction ([[GraftSession]]), never mutated here. Truncate to
    * a microsecond TimestampType — integer `DIV`, not `/`, because
    * epoch-nanos (~1.7e18) exceeds double's 2^53 exact range. DuckDB
    * performs the same ns->µs truncation on read, so oracle
    * comparisons stay exact.
    */
  def events(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
