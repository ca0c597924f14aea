package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

import graft.Tables
import graft.model.{FilterRule, SnapshotEnvelope}

/** The full-snapshot ("全量") pipeline — SURVEY ops #1–#9, #12, #14.
  *
  * The reference walks every allowed table inside a REPEATABLE READ
  * transaction and streams it as `create_table` → `insert`* → `end`
  * envelopes, rejecting PK-less tables and recording the snapshot
  * GTID (`internal/cannal/fullamount_service.go:106-191`,
  * `internal/syncdb/mysql_data_source.go:86-235`). The Spark
  * re-expression:
  *
  *   - catalog scan (#1/#2): the harness "catalog" is the set of
  *     parquet tables under an sf dir; rule pruning happens here,
  *     before any scan — the analog of pruning tables at plan time
  *     (`fullamount_service.go:61-67`);
  *   - DDL extraction (#3): `StructType.toDDL` from the parquet
  *     footer replaces `SHOW CREATE TABLE`;
  *   - PK discovery + rejection (#4): a static registry stands in for
  *     the information_schema constraint scan; tables without a
  *     registered key produce a `rollback` envelope, never a scan;
  *   - consistency point (#5): immutable parquet IS a consistent
  *     snapshot; the position arrives as a pinned GTID-set string;
  *   - chunked scan (#6/#9): Spark's partitioned parquet read replaces
  *     keyset pagination — a chunk ≡ a partition, no cursor needed.
  *     [[chunked]] exposes the explicit `repartitionByRange(pk)` form
  *     whose partition-union-equals-table property is what the
  *     reference's cursor loop was hand-guaranteeing;
  *   - row → map projection (#7): every column stringified into a
  *     `Map[String,String]` after-image, mirroring the reference's
  *     `map[string]any` rows (`mysql_data_source.go:173-191`,
  *     `[]byte→string` coercion included — everything is a string);
  *   - orchestration (#12): one unioned lazy plan; the Spark scheduler
  *     replaces the errgroup+semaphore (per-table concurrency is task
  *     scheduling, not user code);
  *   - consumption (#14): the returned Dataset is the channel; callers
  *     count/aggregate/write it ([[graft.cdc.CdcQueries]]) or stream
  *     it out via foreachBatch ([[CdcPipeline]]).
  *
  * Scale notes: nothing here collects to the driver; the `data` map
  * column is built per-row map-side and column-pruned away entirely
  * when a downstream query only needs counts. At 100 TB the same plan
  * holds — each table is scanned once, split by the file reader, and
  * the envelope union is a metadata-only concat of scans.
  */
object SnapshotJob {

  /** PK registry — harness analog of the reference's
    * `information_schema.columns WHERE column_key='PRI'` scan
    * (`mysql_data_source.go:98-125`). Composite keys keep column
    * order, as the chunk sort requires.
    */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )

  /** Harness schema name (one "database" per sf dir). */
  val schemaName = "main"

  /** Ops #1/#2: enumerate the catalog from storage — the harness
    * analog of the `information_schema.schemata`/`tables` scans
    * (`mysql_data_source.go:24-84`): one FS listing of the schema
    * directory, no table data touched. Works against any Hadoop
    * filesystem (local, HDFS, object store).
    */
  def discoverTables(spark: SparkSession, sfDir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(sfDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
  }

  /** Static catalog + rule pruning — used where no session exists
    * (oracle-SQL generation); [[snapshot]] discovers live via
    * [[discoverTables]] and prunes with the same rule.
    */
  def listTables(rule: FilterRule): Seq[String] =
    Tables.all.filter(rule.allow(schemaName, _))

  /** Op #7: the row → map projection. All values stringify — the
    * reference coerces `[]byte` to string and ships `map[string]any`;
    * a `MapType(String,String)` is the columnar-friendly equivalent.
    */
  def rowAsMap(df: DataFrame): Column =
    map(df.columns.toSeq.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*)

  /** Op #6 in its explicit form: range-partition by PK so each
    * partition is one "chunk" (contiguous in key order, disjoint,
    * union == table). Spark normally does this splitting inside the
    * file source; this form exists for sinks that want key-clustered
    * output and for the chunk-equivalence property test.
    */
  def chunked(df: DataFrame, pks: Seq[String], numChunks: Int): DataFrame =
    df.repartitionByRange(numChunks, pks.map(col): _*)
      .sortWithinPartitions(pks.map(col): _*)

  /** One table's envelope stream: `create_table` → `insert`* → `end`,
    * or a single `rollback` when the table has no usable PK
    * (`fullamount_service.go:158-166` — PK-less tables are rejected,
    * not scanned).
    */
  def tableEnvelopes(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      pks: Option[Seq[String]],
      pos: String,
      schema: String = schemaName
  ): Dataset[SnapshotEnvelope] = {
    import spark.implicits._
    pks match {
      case None | Some(Nil) =>
        Seq(SnapshotEnvelope("rollback", schema, table, None, None, None,
          Some(s"table $table has no primary key"))).toDS()
      case Some(keys) =>
        val missing = keys.filterNot(df.columns.contains)
        if (missing.nonEmpty)
          Seq(SnapshotEnvelope("rollback", schema, table, None, None, None,
            Some(s"table $table missing PK columns ${missing.mkString(",")}"))).toDS()
        else {
          val create = Seq(SnapshotEnvelope("create_table", schema, table,
            Some(df.schema.toDDL), None, None, None)).toDS()
          val end = Seq(SnapshotEnvelope("end", schema, table,
            None, None, Some(pos), None)).toDS()
          val inserts = df
            .select(
              lit("insert").as("kind"),
              lit(schema).as("schema"),
              lit(table).as("table"),
              lit(null).cast("string").as("ddl"),
              rowAsMap(df).as("data"),
              lit(null).cast("string").as("pos"),
              lit(null).cast("string").as("err")
            )
            .as[SnapshotEnvelope]
          create.union(inserts).union(end)
        }
    }
  }

  /** Op #12: the whole snapshot as one lazy unioned plan over every
    * allowed table. The reference's semaphore-capped goroutines become
    * Spark task scheduling; error isolation becomes the per-table
    * rollback envelope.
    */
  def snapshot(
      spark: SparkSession,
      sfDir: String,
      rule: FilterRule = FilterRule(),
      pos: String
  ): Dataset[SnapshotEnvelope] = {
    import spark.implicits._
    val perTable = discoverTables(spark, sfDir)
      .filter(rule.allow(schemaName, _))
      .map { t =>
        tableEnvelopes(spark, Tables.t(spark, sfDir, t), t, primaryKeys.get(t), pos)
      }
    // a rule that prunes everything is a valid (empty) snapshot, not a crash
    if (perTable.isEmpty) spark.emptyDataset[SnapshotEnvelope]
    else perTable.reduce(_ union _)
  }

  /** [[snapshot]] generalized over a [[CatalogSource]] — the SPI form
    * of the reference's bootstrap (`data_source.go:77-112` walks the
    * `DataSource` holder exactly like this): discover schemas, list
    * and rule-prune tables BEFORE any scan, reject PK-less tables
    * with a rollback envelope, and fan the allowed tables out as one
    * lazy unioned plan. [[snapshot]] ≡ this over [[FsCatalog]]
    * (spec-asserted); a JDBC deployment passes [[JdbcCatalog]].
    */
  def snapshotFromCatalog(
      spark: SparkSession,
      catalog: CatalogSource,
      rule: FilterRule,
      pos: String
  ): Dataset[SnapshotEnvelope] = {
    import spark.implicits._
    val perTable = catalog
      .listTables(catalog.listSchemas())
      .filter { case (sc, t) => rule.allow(sc, t) }
      .map { case (sc, t) =>
        val pks = catalog.primaryKeys(sc, t)
        tableEnvelopes(spark, catalog.readTable(spark, sc, t), t,
          if (pks.isEmpty) None else Some(pks), pos, sc)
      }
    if (perTable.isEmpty) spark.emptyDataset[SnapshotEnvelope]
    else perTable.reduce(_ union _)
  }
}
