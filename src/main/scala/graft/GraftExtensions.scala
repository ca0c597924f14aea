package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, PolyGrams, PolyShingles, SimHash32, SimHash37}

/** The engine's `SparkSessionExtensions` hook — the idiomatic way to
  * ship custom Catalyst pieces with a library: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) resolve the engine's
  * codegen'd expressions as plain SQL functions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` plans the same
  * native expression the DataFrame API uses — no UDF, no temp-function
  * registration side effects per session.
  *
  * [[GraftSession.builder]] installs this for every engine entry
  * point.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", classOf[CosineSimilarity]),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", classOf[DotProduct]),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      info("simhash32", classOf[SimHash32]),
      (args: Seq[Expression]) => SimHash32(args(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("simhash37"),
      info("simhash37", classOf[SimHash37]),
      (args: Seq[Expression]) => SimHash37(args(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("poly_shingles"),
      info("poly_shingles", classOf[PolyShingles]),
      (args: Seq[Expression]) => PolyShingles(args(0))
    ))
    ext.injectFunction((
      FunctionIdentifier("poly_grams"),
      info("poly_grams", classOf[PolyGrams]),
      // gram length must be a foldable literal — it parameterizes the
      // generated code, it is not data
      (args: Seq[Expression]) => PolyGrams(args(0),
        args(1).eval().asInstanceOf[Int])
    ))
  }
}
