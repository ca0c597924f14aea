package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** What a `create_table`/DDL event means downstream (SURVEY §1.3): the
  * reference ships DDL opaquely and drops it in the no-op `OnDDL`
  * (`internal/cannal/incremental_event.go:31-33`); an engine that
  * materializes tables has to act on it. This helper turns the DDL
  * strings carried by [[graft.model.SnapshotEnvelope]] /
  * [[ChangeFeed.ddlKind]]-gated events into schema decisions:
  *
  *   - [[diff]] classifies an evolution as additive (safe to apply),
  *     or as drops/retypes (which need an explicit migration —
  *     silently narrowing a materialized table loses data);
  *   - [[conform]] aligns an existing frame to the evolved schema so
  *     the sink can keep appending (the write-side analog of parquet's
  *     `mergeSchema` read option).
  *
  * All driver-side planning logic — schema objects are tiny; nothing
  * here touches data except `conform`, which is a zero-shuffle
  * projection.
  */
object SchemaEvolution {

  /** DDL string (as produced by `StructType.toDDL` in the snapshot's
    * `create_table` envelope) → schema.
    */
  def fromDdl(ddl: String): StructType = StructType.fromDDL(ddl)

  final case class SchemaDiff(
      added: Seq[StructField],
      dropped: Seq[StructField],
      retyped: Seq[(StructField, StructField)] // (old, new)
  ) {
    /** Additive evolutions apply without a migration. */
    def isAdditive: Boolean = dropped.isEmpty && retyped.isEmpty
    def isNoop: Boolean = isAdditive && added.isEmpty
  }

  /** Field-level classification of `old → next` (name-keyed,
    * case-sensitive like the harness parquet).
    */
  def diff(old: StructType, next: StructType): SchemaDiff = {
    val oldByName = old.fields.map(f => f.name -> f).toMap
    val nextByName = next.fields.map(f => f.name -> f).toMap
    SchemaDiff(
      added = next.fields.toSeq.filterNot(f => oldByName.contains(f.name)),
      dropped = old.fields.toSeq.filterNot(f => nextByName.contains(f.name)),
      retyped = old.fields.toSeq.flatMap { f =>
        nextByName.get(f.name).collect {
          case n if n.dataType != f.dataType => (f, n)
        }
      }
    )
  }

  /** Project `df` onto `target`: existing columns pass through (cast
    * when the target retyped them), missing columns fill with typed
    * nulls, column order follows the target. One narrow projection —
    * no shuffle, codegen-friendly.
    */
  def conform(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.fields.map(f => f.name -> f).toMap
    df.select(target.fields.toSeq.map { f =>
      have.get(f.name) match {
        case Some(cur) if cur.dataType == f.dataType => col(f.name)
        case Some(_) => col(f.name).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }
}
