package graft.cdc

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Adapts the harness `events` table into the engine's CDC feed shape
  * and provides the core CDC transforms. The same column contract
  * works for batch and `readStream` inputs (the DataFrame code is
  * identical — Structured Streaming's unified API).
  *
  * Feed columns: `pos` (monotone stream position — the harness
  * stand-in for a GTID), `ts`, `pk` (row key), `op` ∈
  * {insert, update, delete}, plus payload columns.
  */
object ChangeFeed {

  /** Classify raw event types into CDC ops — the analog of the
    * reference's binlog event classification switch
    * (`internal/cannal/incremental.go:194-230`), expressed as a
    * codegen-friendly CASE chain instead of imperative dispatch.
    */
  def opCol(eventType: Column): Column =
    when(eventType === "signup", "insert")
      .when(eventType === "error", "delete")
      .otherwise("update")

  /** DDL statements the reference forwards to `OnDDL`, everything
    * else dropped. */
  val ddlKinds: Seq[String] = Seq("CREATE", "ALTER", "DROP", "RENAME", "TRUNCATE")

  /** DDL classification gate (SURVEY op #16b): the reference inspects
    * binlog QueryEvents and only forwards statements whose
    * trimmed-uppercased text starts with
    * CREATE/ALTER/DROP/RENAME/TRUNCATE
    * (`internal/cannal/incremental.go:212-217` — `ToUpper(TrimSpace)`
    * + `HasPrefix`). Returns the lowercase verb, or null for
    * statements the gate drops (BEGIN, INSERT, SET, comments…).
    */
  def ddlKind(stmt: Column): Column = {
    val t = upper(trim(stmt))
    ddlKinds.foldLeft(lit(null).cast("string")) { (acc, kw) =>
      when(t.startsWith(kw), lit(kw.toLowerCase)).otherwise(acc)
    }
  }

  /** events.parquet -> CDC feed. */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("pos"),
      col("ts"),
      col("user_id").as("pk"),
      opCol(col("event_type")).as("op"),
      col("value"),
      col("props")
    )

  /** Materialize current state from a change feed: latest-wins per key
    * by position, deletes drop the key. This is the derived capability
    * that makes a CDC stream queryable (SURVEY §2, "derived
    * capability"): one shuffle on `pk`, then a codegen'd window —
    * at scale this is the standard "compact a changelog" plan, and the
    * shuffle is unavoidable (it IS the grouping by key).
    */
  def latestState(feed: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("pk")).orderBy(col("pos").desc)
    feed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .drop("rn")
  }

  /** Pair each update with its before-image value — the reference's
    * disabled row-image converter pairs consecutive binlog rows
    * (`internal/cannal/handler.go:100-107`); unpaired images are
    * re-paired here with `lag` over (pk, pos).
    */
  def withBeforeImage(feed: DataFrame, valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("pk")).orderBy(col("pos"))
    valueCols.foldLeft(feed) { (df, c) =>
      df.withColumn(s"before_$c", lag(col(c), 1).over(w))
    }
  }
}
