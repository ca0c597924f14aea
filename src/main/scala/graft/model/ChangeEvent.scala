package graft.model

/** The core change-event record of the engine.
  *
  * Mirrors the reference's event model (`internal/model/event.go:3-12`):
  * a row-change with op ∈ {insert, update, delete}, an after-image
  * (`data`), a before-image (`before`), a unix-seconds timestamp and a
  * stream position (GTID). The reference ships images as
  * `map[string]any`; here they are `Map[String, String]` for a
  * schema-agnostic transport that stays columnar-friendly
  * (`MapType(StringType, StringType)` in Spark). Typed materialization
  * casts map entries to the destination table's `StructType`.
  */
final case class ChangeEvent(
    dataSource: String,
    schema: String,
    table: String,
    op: String, // "insert" | "update" | "delete"
    data: Map[String, String], // after-image (insert/update)
    before: Map[String, String], // before-image (update/delete)
    ts: Long, // unix seconds
    pos: String // GTID / stream position
)

/** Snapshot envelope row, the untyped message of the reference's
  * full-snapshot dispatcher (`internal/cannal/fullamount_event.go:24-83`).
  * `kind ∈ {create_table, insert, end, rollback}`; exactly one of
  * `ddl` / `data` / `pos` / `err` is populated depending on `kind`.
  */
final case class SnapshotEnvelope(
    kind: String,
    schema: String,
    table: String,
    ddl: Option[String],
    data: Option[Map[String, String]],
    pos: Option[String],
    err: Option[String]
)
