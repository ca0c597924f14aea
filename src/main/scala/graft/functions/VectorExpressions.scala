package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared contract for the binary vector expressions: both inputs must
  * be `array<float>` or `array<double>`; mismatched lengths and null
  * elements yield SQL `NULL` (silently truncating to `min(n)` or
  * reading a null slot as 0 would produce silently-wrong similarities).
  *
  * Both expressions generate code (`doGenCode`), so they stay inside
  * whole-stage codegen — a CodegenFallback here would not only
  * interpret the inner loop but break the WSCG span of the whole
  * projection around it, exactly where similarity search spends its
  * time (millions of candidate pairs × 64 elements).
  */
trait VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** These expressions return NULL for value-level conditions the
    * planner cannot see (length mismatch, null element, zero norm),
    * so they are nullable even when every child is non-nullable —
    * without this override, all-non-nullable children would mark the
    * expression non-nullable while nullSafeCodeGen still assigns
    * `ev.isNull = true` (a literal `false = true;` that fails codegen
    * compile), and the interpreted fallback would then hand a NULL to
    * a schema that declares none.
    */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${left.dataType} / ${right.dataType}"
      )
  }

  @inline protected final def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  @inline protected final def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @inline protected final def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Java source for element i of one side, Double-widened. */
  protected final def elemCode(arr: String, isFloat: Boolean, i: String): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Native Catalyst expression: cosine similarity of two numeric
  * arrays, accumulated in Double in array order.
  *
  * This is the (b)-tier extension point of the design (custom
  * `Expression` over UDF): one tight primitive loop over `ArrayData`,
  * no per-element boxing and no intermediate arrays — unlike composing
  * `zip_with` + `aggregate`, which allocates a zipped array per row
  * and evaluates interpreted lambdas. On a 100 TB embedding table this
  * is the hot inner loop of similarity search, so it must not allocate.
  *
  * Deterministic accumulation order (index 0..n-1, all in Double) is
  * part of the contract: the DuckDB oracle computes the same
  * left-to-right sum, so results hash-match bit-for-bit.
  *
  * Null semantics: NULL when either input is NULL, lengths differ, any
  * element is NULL, or either vector has zero norm.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = leftIsFloat
    val yf = rightIsFloat
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = elem(x, xf, i)
      val yv = elem(y, yf, i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else {
      // clamp: rounding can push |result| past 1 for near-identical
      // vectors; cosine is by definition in [-1, 1] (DuckDB clamps
      // identically, which keeps the oracle compare exact)
      val raw = dot / (math.sqrt(nx) * math.sqrt(ny))
      java.lang.Double.valueOf(math.max(-1.0, math.min(1.0, raw)))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val raw = ctx.freshName("raw")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = ${elemCode(x, leftIsFloat, i)};
         |    final double $yv = ${elemCode(y, rightIsFloat, i)};
         |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  if (${ev.isNull} || $nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    final double $raw = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |    ${ev.value} = java.lang.Math.max(-1.0, java.lang.Math.min(1.0, $raw));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Dot product with the same type/null contract as
  * [[CosineSimilarity]].
  */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = leftIsFloat
    val yf = rightIsFloat
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += elem(x, xf, i) * elem(y, yf, i)
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += ${elemCode(x, leftIsFloat, i)} * ${elemCode(y, rightIsFloat, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Whole-codebook scoring: `codebook_scores(q, svs, ns)[j] =
  * dot(q, svs[j]) / ns[j]` — the IVF cell-assignment inner loop as ONE
  * native expression.
  *
  * Why it exists: nearest-centroid assignment wants k scores per row.
  * Unrolling k `dot_product` columns makes the expression tree — and
  * whole-stage-codegen compile time — grow with k; at SemDeDup's
  * k ∝ corpus that is super-linear in data size (measured 25× at 10×
  * data, compile-bound). Composing `zip_with`+`dot_product` keeps the
  * plan O(1) but higher-order functions are CodegenFallback, dropping
  * the hot projection out of WSCG. This expression is both: generated
  * code is a fixed-size doubly-nested loop over the codebook literal
  * (k never appears in the source text), and it stays inside WSCG.
  *
  * Arithmetic contract (oracle-bit-exactness): per centroid, one
  * left-to-right Double dot then one IEEE division — identical to the
  * unrolled `dot_product(q, sv)/n` it replaces.
  *
  * Null semantics: NULL if `q` is NULL, any `q` element is NULL, or a
  * centroid length mismatches `q`. (The codebook sides are driver-built
  * literals — sums and counts are never null.) Result elements are
  * never null.
  */
case class CodebookScores(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def prettyName: String = "codebook_scores"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** NULL on value-level conditions (null q element, centroid length
    * mismatch) — nullable regardless of child nullability, same
    * rationale as [[VectorBinaryExpression.nullable]].
    */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def qOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val svsOk = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val nsOk = third.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (qOk(first.dataType) && svsOk && nsOk) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float|double>, array<array<double>>, array<double>), " +
          s"got ${first.dataType} / ${second.dataType} / ${third.dataType}")
  }

  private def qIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(qv: Any, svsV: Any, nsV: Any): Any = {
    val q = qv.asInstanceOf[ArrayData]
    val svs = svsV.asInstanceOf[ArrayData]
    val ns = nsV.asInstanceOf[ArrayData]
    val n = q.numElements()
    val k = svs.numElements()
    val qf = qIsFloat
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val sv = svs.getArray(j)
      if (sv.numElements() != n) return null
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (q.isNullAt(i)) return null
        dot += (if (qf) q.getFloat(i).toDouble else q.getDouble(i)) * sv.getDouble(i)
        i += 1
      }
      out(j) = dot / ns.getDouble(j)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, svs, ns) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val dot = ctx.freshName("dot")
      val sv = ctx.freshName("sv")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val qElem =
        if (qIsFloat) s"(double) $q.getFloat($i)" else s"$q.getDouble($i)"
      s"""
         |final int $n = $q.numElements();
         |final int $k = $svs.numElements();
         |final double[] $out = new double[$k];
         |boolean $bad = false;
         |for (int $j = 0; $j < $k && !$bad; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $sv = $svs.getArray($j);
         |  if ($sv.numElements() != $n) { $bad = true; break; }
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($q.isNullAt($i)) { $bad = true; break; }
         |    $dot += $qElem * $sv.getDouble($i);
         |  }
         |  $out[$j] = $dot / $ns.getDouble($j);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression
  ): Expression = copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column-level entry points. */
  def cosine_similarity(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def codebook_scores(q: Column, svs: Column, ns: Column): Column =
    column(CodebookScores(expression(q), expression(svs), expression(ns)))

  /** Register `cosine_similarity` / `dot_product` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "scala_udf"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => DotProduct(exprs(0), exprs(1)),
      "scala_udf"
    )
  }
}
