package graft.cdc

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Catalog discovery SPI — the engine's form of the reference's
  * `DataSource` interface (`internal/syncdb/data_source.go:13-34`):
  * the catalog operations the snapshot pipeline performs BEFORE it
  * touches any table data. Implementations answer four questions —
  * what schemas exist, what tables they hold, what a table's DDL is,
  * and what its primary key is — plus the scan half (`readTable`,
  * the engine's analog of `FetchTableChunk`: Spark's partitioned
  * read replaces keyset pagination, see [[SnapshotJob.chunked]]).
  *
  *   - [[FsCatalog]]: the harness catalog (parquet files under an sf
  *     dir) — what [[SnapshotJob.snapshot]] always used, behind the
  *     seam;
  *   - [[JdbcCatalog]]: the reference's information_schema queries
  *     (`internal/syncdb/mysql_data_source.go:24-125`) over any JDBC
  *     database — spec'd against embedded Derby and driver-gated by
  *     `cdc_jdbc_catalog`, so the only reference surface left unbuilt
  *     is the MySQL wire protocol itself (the [[graft.sources.BinlogTransport]]
  *     situation, same blocker).
  */
trait CatalogSource {

  /** All user schemas (`mysql_data_source.go:24-48`). */
  def listSchemas(): Seq[String]

  /** (schema, table) pairs for the given schemas
    * (`mysql_data_source.go:50-84` returns the same map, flattened
    * here for plan-time pruning).
    */
  def listTables(schemas: Seq[String]): Seq[(String, String)]

  /** PK column names in key order; EMPTY means the table must be
    * rejected, never scanned (`mysql_data_source.go:98-125` — the
    * reference errors "has no primary key").
    */
  def primaryKeys(schema: String, table: String): Seq[String]

  /** The table as a DataFrame — the scan half of the SPI. */
  def readTable(spark: SparkSession, schema: String, table: String): DataFrame

  /** DDL text for the create_table envelope. The reference ships
    * `SHOW CREATE TABLE` output (`mysql_data_source.go:86-96`, a
    * MySQL-only statement); the portable form is the engine schema's
    * DDL — same thing the FS path extracts from parquet footers.
    */
  def tableDDL(spark: SparkSession, schema: String, table: String): String =
    readTable(spark, schema, table).schema.toDDL
}

/** The harness catalog: one schema (`main`), tables = parquet files
  * under the sf dir, PKs from the static registry — exactly what
  * [[SnapshotJob]] did inline, now behind the SPI.
  */
final class FsCatalog(spark: SparkSession, sfDir: String) extends CatalogSource {
  override def listSchemas(): Seq[String] = Seq(SnapshotJob.schemaName)
  override def listTables(schemas: Seq[String]): Seq[(String, String)] =
    schemas.filter(_ == SnapshotJob.schemaName).flatMap { s =>
      SnapshotJob.discoverTables(spark, sfDir).map((s, _))
    }
  override def primaryKeys(schema: String, table: String): Seq[String] =
    SnapshotJob.primaryKeys.getOrElse(table, Seq.empty)
  override def readTable(spark: SparkSession, schema: String, table: String): DataFrame =
    Tables.t(spark, sfDir, table)
}

/** Catalog over a JDBC database, issuing the REFERENCE'S queries:
  * `information_schema.schemata` minus the system schemas
  * (`mysql_data_source.go:26-30`), `information_schema.tables` with
  * `table_type = 'BASE TABLE'` (`:51-56`), and the JDBC-standard
  * primary-key scan (`DatabaseMetaData.getPrimaryKeys`, the portable
  * form of the `column_key = 'PRI'` columns query, `:100-104`).
  * On MySQL the views are system-provided; the Derby spec creates
  * information_schema-shaped views over `SYS.SYSSCHEMAS`/`SYSTABLES`,
  * so discovery is genuinely dynamic (a created table appears without
  * touching the views).
  *
  * `systemSchemas` defaults to the reference's MySQL exclusion list;
  * other engines pass their own (Derby: SYS, SYSIBM, …). Metadata
  * round-trips are plain JDBC on the driver — control-plane-sized,
  * exactly like the reference's `*sql.DB` calls; table DATA flows
  * through `spark.read.jdbc` (distributed, partitionable).
  */
final class JdbcCatalog(
    url: String,
    systemSchemas: Seq[String] =
      Seq("information_schema", "mysql", "performance_schema", "sys")
) extends CatalogSource {

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def inList(n: Int): String = Seq.fill(n)("?").mkString(", ")

  override def listSchemas(): Seq[String] = withConn { c =>
    val ps = c.prepareStatement(
      s"""select schema_name from information_schema.schemata
         |where schema_name not in (${inList(systemSchemas.length)})""".stripMargin)
    systemSchemas.zipWithIndex.foreach { case (s, i) => ps.setString(i + 1, s) }
    val rs = ps.executeQuery()
    val out = Seq.newBuilder[String]
    while (rs.next()) out += rs.getString(1)
    out.result().sorted
  }

  override def listTables(schemas: Seq[String]): Seq[(String, String)] = withConn { c =>
    if (schemas.isEmpty) Seq.empty
    else {
      val ps = c.prepareStatement(
        s"""select table_schema, table_name from information_schema.tables
           |where table_type = 'BASE TABLE'
           |and table_schema not in (${inList(systemSchemas.length)})
           |and table_schema in (${inList(schemas.length)})""".stripMargin)
      (systemSchemas ++ schemas).zipWithIndex.foreach { case (s, i) => ps.setString(i + 1, s) }
      val rs = ps.executeQuery()
      val out = Seq.newBuilder[(String, String)]
      while (rs.next()) out += ((rs.getString(1), rs.getString(2)))
      out.result().sorted
    }
  }

  override def primaryKeys(schema: String, table: String): Seq[String] = withConn { c =>
    val rs = c.getMetaData.getPrimaryKeys(null, schema, table)
    val out = Seq.newBuilder[(Short, String)]
    while (rs.next()) out += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
    out.result().sortBy(_._1).map(_._2)
  }

  override def readTable(spark: SparkSession, schema: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"$schema.$table")
      .load()
}

/** Embedded-Derby stand-in for a live MySQL deployment — the JDBC
  * seam's harness transport, the same role [[graft.sources.GtidReplayBuffers]]
  * plays for the binlog socket. Creates an in-memory database shaped
  * like a small shop schema (two keyed tables, one PK-less table that
  * must be REJECTED, one schema a filter rule prunes) plus
  * information_schema-shaped views over Derby's live `SYS` catalog —
  * on MySQL those views are system-provided; here they are DERIVED
  * from the real catalog, so discovery is genuinely dynamic.
  * In-memory Derby is per-JVM — correct for `local[*]`; a cluster
  * points [[JdbcCatalog]] at a server URL instead.
  */
object DerbyHarness {

  /** Derby's own system schemas + the view schema — what the
    * reference's MySQL exclusion list (`mysql_data_source.go:28`)
    * becomes on this engine.
    */
  val systemSchemas: Seq[String] = Seq(
    "SYS", "SYSIBM", "SYSCS_DIAG", "SYSCS_UTIL", "SYSFUN", "SYSPROC",
    "SYSCAT", "SYSSTAT", "SQLJ", "NULLID", "APP", "INFORMATION_SCHEMA")

  /** Create the database; returns its JDBC url. */
  def create(name: String): String = {
    // keep derby.log out of the working tree
    System.setProperty("derby.stream.error.file",
      s"${System.getProperty("java.io.tmpdir")}/derby.log")
    val url = s"jdbc:derby:memory:$name"
    val c = DriverManager.getConnection(url + ";create=true")
    try {
      val st = c.createStatement()
      Seq(
        "CREATE SCHEMA SHOP",
        "CREATE TABLE SHOP.CUSTOMERS(" +
          "ID INT NOT NULL PRIMARY KEY, NAME VARCHAR(40) NOT NULL, BAL DOUBLE)",
        "CREATE TABLE SHOP.ORDERS(" +
          "ID INT NOT NULL, ITEM VARCHAR(40) NOT NULL, QTY INT, PRIMARY KEY (ID, ITEM))",
        "CREATE TABLE SHOP.AUDIT_LOG(MSG VARCHAR(60))", // no PK: must be rejected
        "CREATE SCHEMA SCRATCH",
        "CREATE TABLE SCRATCH.TMP(X INT NOT NULL PRIMARY KEY)", // rule-pruned
        "INSERT INTO SHOP.CUSTOMERS VALUES (1, 'ada', 10.5), (2, 'bob', 0.25), (3, 'eve', -3.0)",
        "INSERT INTO SHOP.ORDERS VALUES (1, 'anvil', 2), (1, 'rope', 1), " +
          "(2, 'anvil', 1), (3, 'glue', 7)",
        "INSERT INTO SHOP.AUDIT_LOG VALUES ('boot'), ('login')",
        "INSERT INTO SCRATCH.TMP VALUES (42)",
        // the information_schema shape the reference queries
        // (mysql_data_source.go:26-30, :51-56), as views over the
        // LIVE catalog
        "CREATE SCHEMA INFORMATION_SCHEMA",
        "CREATE VIEW INFORMATION_SCHEMA.SCHEMATA(SCHEMA_NAME) AS " +
          "SELECT SCHEMANAME FROM SYS.SYSSCHEMAS",
        "CREATE VIEW INFORMATION_SCHEMA.TABLES(TABLE_SCHEMA, TABLE_NAME, TABLE_TYPE) AS " +
          "SELECT S.SCHEMANAME, T.TABLENAME, " +
          "CASE WHEN T.TABLETYPE = 'T' THEN 'BASE TABLE' ELSE 'VIEW' END " +
          "FROM SYS.SYSTABLES T JOIN SYS.SYSSCHEMAS S ON T.SCHEMAID = S.SCHEMAID"
      ).foreach(st.executeUpdate)
    } finally c.close()
    url
  }

  /** Drop the in-memory database (success surfaces as SQLException
    * 08006 by Derby's design).
    */
  def drop(name: String): Unit =
    try { DriverManager.getConnection(s"jdbc:derby:memory:$name;drop=true"); () }
    catch { case _: java.sql.SQLException => () }
}
