package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events fixture contract ([[Tables.normalizeEventsTs]],
  * FIXTURES.md): the driver has regenerated `events.parquet` with
  * different physical `ts` layouts between rounds (TIMESTAMP(NANOS)
  * → `timestamp[us]`), and the round-11 drift took down 38 queries
  * with an analysis error thirty plans deep. The loader must accept
  * every layout seen so far — normalized to the SAME values — and
  * reject an unknown one loudly, by name, at the loader.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 2026-01-02 03:04:05.123456 UTC, as epoch micros
  private val us = 1767323045123456L

  test("nanos-long ts normalizes by integer ns->us truncation") {
    import spark.implicits._
    val df = Seq((1L, us * 1000L + 999L)).toDF("event_id", "ts")
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == us)
  }

  test("timestamp[us] (NTZ) ts casts value-identically under the UTC session") {
    import spark.implicits._
    val df = Seq((1L, us)).toDF("event_id", "u")
      .select(col("event_id"), timestamp_micros(col("u")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType) // fixture shape, not a tautology
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == us)
  }

  test("session-zone timestamp ts passes through unchanged") {
    import spark.implicits._
    val df = Seq((1L, us)).toDF("event_id", "u")
      .select(col("event_id"), timestamp_micros(col("u")).as("ts"))
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) == us)
  }

  test("an unknown ts layout fails at the loader, naming the variants") {
    import spark.implicits._
    val df = Seq((1L, "2026-01-02")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeEventsTs(df))
    assert(e.getMessage.contains("events.parquet"))
    assert(e.getMessage.contains("FIXTURES.md"))
    assert(e.getMessage.contains("TIMESTAMP_NTZ"))
  }

  test("the shipped fixture loads through the normalizer with a timestamp ts") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(1).count() == 1)
  }
}
