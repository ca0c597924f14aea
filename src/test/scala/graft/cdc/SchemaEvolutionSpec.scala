package graft.cdc

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("snapshot DDL roundtrips through fromDdl") {
    val df = graft.Tables.region(spark, "/root/testdata/sf0.001")
    val env = SnapshotJob
      .tableEnvelopes(spark, df, "region", Some(Seq("r_regionkey")), "u:1")
      .filter(_.kind == "create_table")
      .collect()
    assert(SchemaEvolution.fromDdl(env.head.ddl.get) == df.schema)
  }

  test("diff classifies adds, drops and retypes") {
    val old = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", IntegerType)))
    val next = StructType(Seq(
      StructField("id", LongType), StructField("score", LongType),
      StructField("tag", StringType)))
    val d = SchemaEvolution.diff(old, next)
    assert(d.added.map(_.name) == Seq("tag"))
    assert(d.dropped.map(_.name) == Seq("name"))
    assert(d.retyped.map { case (o, n) => (o.name, o.dataType, n.dataType) } ==
      Seq(("score", IntegerType, LongType)))
    assert(!d.isAdditive)
    val additive = SchemaEvolution.diff(old,
      StructType(old.fields :+ StructField("extra", StringType)))
    assert(additive.isAdditive && additive.added.map(_.name) == Seq("extra"))
    assert(SchemaEvolution.diff(old, old).isNoop)
  }

  test("conform aligns a frame to the evolved schema (fill, cast, reorder)") {
    val df = Seq((1L, "a", 10)).toDF("id", "name", "score")
    val target = StructType(Seq(
      StructField("score", LongType), // retyped int -> long
      StructField("id", LongType),
      StructField("tag", StringType) // new, fills null
    ))
    val out = SchemaEvolution.conform(df, target)
    // nullability is input-derived (a non-null source column stays
    // non-null); names/types/order must match the target
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    val row = out.head()
    assert(row.getLong(0) == 10L && row.getLong(1) == 1L && row.isNullAt(2))
  }

  test("additive evolution appends cleanly and reads back merged") {
    val dir = s"target/tmp/schemaevo-${System.nanoTime()}"
    val v1 = Seq((1L, "a")).toDF("id", "name")
    v1.write.parquet(dir)
    val v2schema = StructType(v1.schema.fields :+ StructField("tag", StringType))
    val v2 = Seq((2L, "b", "t")).toDF("id", "name", "tag")
    SchemaEvolution.conform(v2, v2schema).write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("id", "name", "tag"))
    assert(merged.count() == 2)
    val conformedOld = SchemaEvolution.conform(spark.read.parquet(dir), v2schema)
    assert(conformedOld.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      v2schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("DdlOp.parse: the reference-gated non-additive statements") {
    import graft.cdc.CdcPipeline.DdlOp
    assert(DdlOp.parse("ALTER TABLE s.t DROP COLUMN props") ==
      Some(DdlOp.DropColumn("props")))
    assert(DdlOp.parse("alter table t drop c") == Some(DdlOp.DropColumn("c")))
    assert(DdlOp.parse("ALTER TABLE t RENAME COLUMN `value` TO `amount`") ==
      Some(DdlOp.RenameColumn("value", "amount")))
    assert(DdlOp.parse("TRUNCATE TABLE shop.events") == Some(DdlOp.Truncate))
    assert(DdlOp.parse("truncate t") == Some(DdlOp.Truncate))
    // additive / unknown DDL needs no eager migration
    assert(DdlOp.parse("ALTER TABLE t ADD COLUMN props STRING").isEmpty)
    assert(DdlOp.parse("CREATE TABLE t (id INT)").isEmpty)
    assert(DdlOp.parse("INSERT INTO t VALUES (1)").isEmpty)
  }

  test("applyDdl: drop nulls in place, rename moves values, both idempotent") {
    import graft.cdc.{CdcPipeline, WatermarkStore}
    import org.apache.spark.sql.functions.col
    val base = s"target/tmp/ddlmig-${System.nanoTime()}"
    val store = new WatermarkStore(s"$base/wm")
    val feed = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "insert", 1.5, "a"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 11L, "insert", 2.5, "b")
    ).toDF("pos", "ts", "pk", "op", "value", "props")
    CdcPipeline.applyBatch(spark, store, s"$base/state", "src", feed)
    CdcPipeline.applyDdl(spark, s"$base/state",
      CdcPipeline.DdlOp.RenameColumn("value", "amount"))
    CdcPipeline.applyDdl(spark, s"$base/state",
      CdcPipeline.DdlOp.RenameColumn("value", "amount")) // redelivered: no-op
    CdcPipeline.applyDdl(spark, s"$base/state",
      CdcPipeline.DdlOp.DropColumn("props"))
    CdcPipeline.applyDdl(spark, s"$base/state",
      CdcPipeline.DdlOp.DropColumn("props")) // redelivered: no-op
    val st = CdcPipeline.readState(spark, s"$base/state")
      .select("pk", "amount", "value", "props")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.isNullAt(2), r.isNullAt(3)))
      .sortBy(_._1)
    assert(st.toSeq == Seq((10L, 1.5, true, true), (11L, 2.5, true, true)))
  }

  test("applyDdl: truncate resets state, keeps layout, and later applies work") {
    import graft.cdc.{CdcPipeline, WatermarkStore}
    val base = s"target/tmp/ddltrunc-${System.nanoTime()}"
    val store = new WatermarkStore(s"$base/wm")
    def batch(pos: Long, pk: Long, v: Double) = Seq(
      (pos, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), pk, "insert", v)
    ).toDF("pos", "ts", "pk", "op", "value")
    CdcPipeline.applyBatch(spark, store, s"$base/state", "src", batch(1, 10, 1.0))
    CdcPipeline.applyDdl(spark, s"$base/state", CdcPipeline.DdlOp.Truncate)
    assert(CdcPipeline.readState(spark, s"$base/state").count() == 0)
    // post-truncate applies land in the surviving layout
    CdcPipeline.applyBatch(spark, store, s"$base/state", "src", batch(2, 20, 2.0))
    // the watermark survived the truncate: redelivering the
    // pre-truncate batch is a no-op, not a resurrection
    CdcPipeline.applyBatch(spark, store, s"$base/state", "src", batch(1, 10, 1.0))
    val pks = CdcPipeline.readState(spark, s"$base/state")
      .select("pk").collect().map(_.getLong(0)).toSet
    assert(pks == Set(20L))
  }
}
