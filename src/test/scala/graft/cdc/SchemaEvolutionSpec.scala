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
}
