package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One include/exclude rule set over schema and table names.
  *
  * Semantics re-expressed from the reference's filter-rule model
  * (`pkg/config/db.go:101-165`):
  *   - a pattern with a trailing `_` is a prefix wildcard
  *     (`db.go:155-158`), otherwise exact match;
  *   - exclude beats include;
  *   - an empty include list allows everything (default allow).
  */
final case class TableFilter(
    includeSchemas: Seq[String] = Nil,
    excludeSchemas: Seq[String] = Nil,
    includeTables: Seq[String] = Nil,
    excludeTables: Seq[String] = Nil
) {

  private def matches(pat: String, name: String): Boolean =
    if (pat.endsWith("_")) name.startsWith(pat.dropRight(1)) else name == pat

  def allowSchema(schema: String): Boolean =
    !excludeSchemas.exists(matches(_, schema)) &&
      (includeSchemas.isEmpty || includeSchemas.exists(matches(_, schema)))

  def allowTable(table: String): Boolean =
    !excludeTables.exists(matches(_, table)) &&
      (includeTables.isEmpty || includeTables.exists(matches(_, table)))

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

  def schemaColumn(schemaCol: Column): Column = {
    def one(pat: String): Column =
      if (pat.endsWith("_")) schemaCol.startsWith(pat.dropRight(1)) else schemaCol === pat
    val inc =
      if (includeSchemas.isEmpty) lit(true)
      else includeSchemas.map(one).reduce(_ || _)
    val exc =
      if (excludeSchemas.isEmpty) lit(false)
      else excludeSchemas.map(one).reduce(_ || _)
    inc && !exc
  }
}

/** A global rule plus optional per-schema overrides. A schema-level
  * rule fully replaces the global table rule for that schema
  * (`pkg/config/db.go:113-115`); schema-level allow/deny of the schema
  * itself always comes from the global rule.
  */
final case class FilterRule(
    global: TableFilter = TableFilter(),
    perSchema: Map[String, TableFilter] = Map.empty
) {

  def ruleFor(schema: String): TableFilter = perSchema.getOrElse(schema, global)

  /** Driver-side evaluation, used for plan-time table pruning (the
    * analog of the reference pruning tables before any scan,
    * `fullamount_service.go:61-67`).
    */
  def allow(schema: String, table: String): Boolean =
    global.allowSchema(schema) && ruleFor(schema).allowTable(table)

  def allowSchemas(schemas: Seq[String]): Seq[String] = schemas.filter(global.allowSchema)

  /** Compile the whole rule into one `Column` predicate over
    * (schemaCol, tableCol) — per-schema overrides become a
    * `CASE WHEN schema = s THEN <override> ... ELSE <global>` chain,
    * all codegen-friendly (no UDF).
    */
  def toColumn(schemaCol: Column, tableCol: Column): Column = {
    val tablePred = perSchema.foldLeft(Option.empty[Column]) { case (acc, (s, tf)) =>
      val branch = when(schemaCol === s, tf.tableColumn(tableCol))
      Some(acc.fold(branch)(c => c.when(schemaCol === s, tf.tableColumn(tableCol))))
    } match {
      case Some(chain) => chain.otherwise(global.tableColumn(tableCol))
      case None => global.tableColumn(tableCol)
    }
    global.schemaColumn(schemaCol) && tablePred
  }
}
