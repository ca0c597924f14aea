package graft.model

/** Config-file front door for the filter rules — the reference reads
  * its include/exclude patterns from TOML (`pkg/config/db.go:11-33`)
  * and compiles the comma-separated strings into slices
  * (`ParseFilterConfig`, `db.go:69-99`). This is a minimal line-based
  * reader for exactly that shape (sections, `key = "value"` pairs,
  * `#` comments) — deliberately NOT a general TOML parser; anything
  * outside the filter sections is ignored, like the reference ignores
  * non-filter keys when building rules.
  *
  * Recognized sections (per FIXTURES §A.4):
  * {{{
  * [DATASOURCE.global_filter]          # or any *.global_filter
  * include_schemas = "app,shop"
  * include_tables  = "orders,li_"      # trailing '_' = prefix wildcard
  * exclude_tables  = "orders_tmp"
  * [DATASOURCE.schema_filters.app]     # per-schema override
  * include_tables = "users"
  * }}}
  */
object FilterConfig {

  def parse(toml: String): FilterRule = {
    var section: Vector[String] = Vector.empty
    var global: Option[TableFilter] = None
    var perSchema: Map[String, TableFilter] = Map.empty

    def splitList(v: String): Seq[String] =
      v.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq

    def updated(tf: TableFilter, key: String, value: String): TableFilter = key match {
      case "include_schemas" => tf.copy(includeSchemas = splitList(value))
      case "include_tables" => tf.copy(includeTables = splitList(value))
      case "exclude_tables" => tf.copy(excludeTables = splitList(value))
      case _ => tf
    }

    toml.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach {
      case l if l.startsWith("[[") && l.endsWith("]]") =>
        section = l.drop(2).dropRight(2).trim.split('.').toVector
      case l if l.startsWith("[") && l.endsWith("]") =>
        section = l.drop(1).dropRight(1).trim.split('.').toVector
      case l if l.contains("=") =>
        val Array(rawKey, rawValue) = l.split("=", 2)
        val key = rawKey.trim
        val value = rawValue.trim.stripPrefix("\"").stripSuffix("\"")
        section.lastOption match {
          case Some("global_filter") =>
            global = Some(updated(global.getOrElse(TableFilter()), key, value))
          case Some(schema) if section.length >= 2 &&
              section(section.length - 2) == "schema_filters" =>
            perSchema = perSchema.updated(
              schema, updated(perSchema.getOrElse(schema, TableFilter()), key, value))
          case _ => // non-filter key: ignored, like the reference
        }
      case _ => // bare line outside our grammar: ignored
    }
    FilterRule(global, perSchema)
  }
}
