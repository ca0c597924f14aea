package graft.functions

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def cosRow(a: Seq[Float], b: Seq[Float]): Option[Double] = {
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(VectorFunctions.cosine_similarity(col("a"), col("b"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("cosine of identical vectors is 1.0") {
    assert(math.abs(cosRow(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)).get - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0.0") {
    assert(cosRow(Seq(1f, 0f), Seq(0f, 1f)).get == 0.0)
  }

  test("length mismatch yields NULL, never silent truncation") {
    assert(cosRow(Seq(1f, 2f, 3f), Seq(1f, 2f)).isEmpty)
  }

  test("zero-norm vector yields NULL") {
    assert(cosRow(Seq(0f, 0f), Seq(1f, 1f)).isEmpty)
  }

  test("null element yields NULL") {
    val df = Seq((Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 2f, 3f)))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.cosine_similarity(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("dot product matches left-to-right double accumulation") {
    val a = Seq(0.1f, 0.2f, 0.3f)
    val b = Seq(0.4f, 0.5f, 0.6f)
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + x.toDouble * y.toDouble
    }
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(VectorFunctions.dot_product(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(got == expected, "accumulation order is part of the oracle contract")
  }

  test("dot product rejects non-numeric-array inputs at analysis time") {
    val df = Seq(("x", Seq(1f))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(VectorFunctions.dot_product(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("dot_product") ||
      ex.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    val r = spark.sql("select cosine_similarity(array(1.0D,0.0D), array(1.0D,0.0D)) c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
