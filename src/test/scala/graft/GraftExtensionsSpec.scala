package graft

import org.scalatest.funsuite.AnyFunSuite

/** The extension-installed SQL surface: TestSpark's session is built
  * through [[GraftSession.builder]], so the engine functions must
  * resolve in plain SQL and plan the native codegen'd expressions.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("cosine_similarity / dot_product / simhash32 resolve in SQL") {
    val row = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       dot_product(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d,
        |       simhash32(array('hello', 'world')) AS f""".stripMargin
    ).head()
    assert(row.getDouble(0) == 1.0)
    assert(row.getDouble(1) == 23.0)
    // same fingerprint the Column API computes
    import org.apache.spark.sql.functions._
    val viaColumn = spark.range(1)
      .select(graft.functions.SimHashFunctions.simhash32(
        array(lit("hello"), lit("world"))).as("f"))
      .head().getLong(0)
    assert(row.getLong(2) == viaColumn)
  }

  test("the SQL function plans the native expression, not a UDF") {
    val plan = spark.sql(
      "SELECT cosine_similarity(array(1.0D), array(1.0D))").queryExecution.analyzed
    assert(plan.expressions.exists(_.exists(_.isInstanceOf[graft.functions.CosineSimilarity])))
  }
}
