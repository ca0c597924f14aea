package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One include/exclude pattern set over schema and table names — a
  * faithful re-expression of the reference's `FilterPattern`
  * (`pkg/config/db.go:63-67,126-165`):
  *   - schema patterns are **exact-matched** against `includeSchemas`
  *     only (`contains`, `db.go:146-152`); there is no schema exclude
  *     list and no schema wildcard;
  *   - table patterns support a trailing `_` **prefix wildcard**
  *     (`containsPrefix`, `db.go:155-165`), otherwise exact;
  *   - exclude beats include (`db.go:134-137`); a non-empty include
  *     list means *only* its members pass (`db.go:139-141`); empty
  *     lists allow everything.
  */
final case class TableFilter(
    includeSchemas: Seq[String] = Nil,
    includeTables: Seq[String] = Nil,
    excludeTables: Seq[String] = Nil
) {

  private def tableMatches(pat: String, name: String): Boolean =
    (pat.endsWith("_") && name.startsWith(pat.dropRight(1))) || pat == name

  def allowSchema(schema: String): Boolean =
    includeSchemas.isEmpty || includeSchemas.contains(schema)

  def allowTable(table: String): Boolean =
    !excludeTables.exists(tableMatches(_, table)) &&
      (includeTables.isEmpty || includeTables.exists(tableMatches(_, table)))

  /** Compile the table-name part of the rule into a Catalyst `Column`
    * predicate, so the same rule that prunes tables at plan time can
    * also run codegen'd per-event inside a stream.
    */
  def tableColumn(tableCol: Column): Column = {
    def one(pat: String): Column =
      if (pat.endsWith("_")) tableCol.startsWith(pat.dropRight(1)) else tableCol === pat
    val inc =
      if (includeTables.isEmpty) lit(true)
      else includeTables.map(one).reduce(_ || _)
    val exc =
      if (excludeTables.isEmpty) lit(false)
      else excludeTables.map(one).reduce(_ || _)
    inc && !exc
  }

  /** Schema gate as a `Column`: exact `IN`-list membership, mirroring
    * the reference's `contains` (no wildcard for schemas).
    */
  def schemaColumn(schemaCol: Column): Column =
    if (includeSchemas.isEmpty) lit(true)
    else schemaCol.isin(includeSchemas.map(x => x: Any): _*)
}

/** A global rule plus optional per-schema overrides, mirroring the
  * reference's `FilterRule.Allow` (`pkg/config/db.go:111-124`):
  * when a per-schema rule exists for a schema it is used **alone** —
  * the global rule (including its schema gate) is bypassed entirely
  * (`db.go:113-115` pass `schema=""` into the override's `allow`).
  * With no per-schema rule the global pattern gates both schema and
  * table; with no configuration at all everything is allowed
  * (`db.go:122-123`).
  */
final case class FilterRule(
    global: Option[TableFilter] = None,
    perSchema: Map[String, TableFilter] = Map.empty
) {

  /** Driver-side evaluation, used for plan-time table pruning (the
    * analog of the reference pruning tables before any scan,
    * `fullamount_service.go:61-67`).
    */
  def allow(schema: String, table: String): Boolean =
    perSchema.get(schema) match {
      case Some(sr) => sr.allowTable(table) // global gate bypassed (db.go:113-115)
      case None => global.forall(g => g.allowSchema(schema) && g.allowTable(table))
    }

  /** Schema-level pruning (`AllowSchemas`, `db.go:101-109` — evaluates
    * `Allow(schema, "")`, so schemas with a per-schema override always
    * pass, and the empty table name trivially passes the table gate).
    */
  def allowSchemas(schemas: Seq[String]): Seq[String] =
    schemas.filter(s => perSchema.contains(s) || global.forall(_.allowSchema(s)))

  /** Compile the whole rule into one `Column` predicate over
    * (schemaCol, tableCol) — per-schema overrides become a
    * `CASE WHEN schema = s THEN <override tables> ... ELSE <global>`
    * chain, all codegen-friendly (no UDF).
    */
  def toColumn(schemaCol: Column, tableCol: Column): Column = {
    val fallback = global
      .map(g => g.schemaColumn(schemaCol) && g.tableColumn(tableCol))
      .getOrElse(lit(true))
    perSchema.foldLeft(Option.empty[Column]) { case (acc, (s, tf)) =>
      val branch = acc match {
        case None => when(schemaCol === s, tf.tableColumn(tableCol))
        case Some(c) => c.when(schemaCol === s, tf.tableColumn(tableCol))
      }
      Some(branch)
    } match {
      case Some(chain) => chain.otherwise(fallback)
      case None => fallback
    }
  }
}
