package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 32-bit SimHash of a word array as one codegen'd scalar — the
  * (b)-tier custom-Expression form of the d4 fingerprint.
  *
  * Semantics are bit-identical to the SQL formulation the oracle
  * evaluates: per word, an 8-char polynomial hash
  * `Σ ascii(char_k) · 31^(7−k)` (missing chars pad 0, exactly like
  * `ascii(substr(w,k,1))` of an empty string); per bit b, a ±1 vote
  * with multiplicity; fingerprint sets bit b iff the vote is
  * positive.
  *
  * Why an Expression: the explode→groupBy formulation shuffles one
  * row per (doc, word) — ~100× the document count — only to reduce
  * them right back to one row per doc. The fingerprint is row-local
  * state (32 counters), so a scalar keeps it in registers, stays
  * inside whole-stage codegen (`doGenCode` emits a static call), and
  * turns d4's first phase into a pure scan projection. At 100 TB that
  * removes the largest shuffle of the dedup suite.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash32"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash32.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The engines' shared 8-char polynomial word hash
  * (`Σ ascii(char_k) · 31^(7−k)`, missing chars pad 0) — the JVM twin
  * of `Text.polyHashSql(e, 8)`, kept bit-identical so expressions
  * built on it stay oracle-comparable.
  */
object PolyHash {

  private def pows(base: Long): Array[Long] = {
    val a = new Array[Long](8)
    var v = 1L
    var k = 7
    while (k >= 0) { a(k) = v; v *= base; k -= 1 }
    a
  }

  /** 31^(7−k) coefficients of the 8-char polynomial. */
  private val POW: Array[Long] = pows(31L)

  /** 37^(7−k) — the independent second hash backing the upper half of
    * the 64-bit SimHash fingerprint.
    */
  private val POW37: Array[Long] = pows(37L)

  def hash8(s: String): Long = {
    var h = 0L
    val len = if (s.length < 8) s.length else 8
    var k = 0
    while (k < len) { h += s.charAt(k).toLong * POW(k); k += 1 }
    h
  }

  def hash8b37(s: String): Long = {
    var h = 0L
    val len = if (s.length < 8) s.length else 8
    var k = 0
    while (k < len) { h += s.charAt(k).toLong * POW37(k); k += 1 }
    h
  }
}

object SimHash32 {

  /** The shared 32-bit vote loop: per word hash, a ±1 vote per bit;
    * fingerprint sets bit b iff the vote is positive.
    */
  private[functions] def voteFp(words: ArrayData, hash: String => Long): Long = {
    val votes = new Array[Int](32)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val h = hash(words.getUTF8String(i).toString)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  /** Static (forwarder) entry point referenced by generated code.
    * Null elements vote nothing (wordsCol never produces them; being
    * lenient here beats a per-row branch to null-out the whole doc).
    */
  def compute(words: ArrayData): Long = voteFp(words, PolyHash.hash8)
}

/** The base-37 twin of [[SimHash32]]: an independent 32-bit SimHash
  * that forms the upper half of the engine's 64-bit fingerprint. Two
  * 32-bit halves instead of one signed 64-bit value because the
  * DuckDB oracle's BIGINT errors on overflow and arithmetic-shifts
  * differently on negatives — two non-negative halves keep every
  * band/Hamming formula identical in both engines.
  */
case class SimHash37(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash37"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash37.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash37.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash37 {
  def compute(words: ArrayData): Long = SimHash32.voteFp(words, PolyHash.hash8b37)
}

/** Distinct 3-gram shingle hashes of a word array as one codegen'd
  * scalar — the JVM twin of the d3 oracle's SQL chain
  * (`((hw0 % P)·1000003 + hw1) % P · 1000003 + hw2) % P` over the
  * [[PolyHash.hash8]] word hashes, first-occurrence order like
  * `array_distinct`). Replaces an interpreted transform/arrays_zip/
  * slice HOF pipeline with a single primitive loop per row — the last
  * interpreted island in the dedup suite's hot path.
  */
case class PolyShingles(child: Expression) extends UnaryExpression {

  override def prettyName: String = "poly_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PolyShingles.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyShingles.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyShingles {

  private val P = 2147483647L // 2^31 - 1

  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val hw = new Array[Long](n)
    var i = 0
    while (i < n) {
      hw(i) = if (words.isNullAt(i)) 0L else PolyHash.hash8(words.getUTF8String(i).toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - 3) {
      val t1 = ((hw(i) % P) * 1000003L + hw(i + 1)) % P
      seen.add((t1 * 1000003L + hw(i + 2)) % P)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Distinct n-gram hashes of a word array — [[PolyShingles]]
  * generalized to any gram length (d6 decontamination uses n=13).
  * Same chain as the oracle SQL: `acc = hw(i); acc = (acc·1000003 +
  * hw(i+k)) % P` for k in 1..n−1 (the raw first word hash is < 2^42,
  * so `acc·1000003` stays below 2^63 — no overflow in either engine).
  *
  * Why an Expression: the SQL formulation
  * `transform(sequence(...), i -> chain(element_at(hw, i+k)...))`
  * is interpreted (HOFs are CodegenFallback) AND collapses the `hw`
  * projection into every element_at reference — the enclosing
  * transform re-evaluates the full per-word hash pass for each of the
  * n offsets of each gram, turning a linear scan quadratic in
  * document length. One primitive loop per row removes both problems.
  */
case class PolyGrams(child: Expression, n: Int) extends UnaryExpression {

  override def prettyName: String = "poly_grams"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string> and n >= 1, got $other / n=$n")
  }

  override def nullSafeEval(input: Any): Any =
    PolyGrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyGrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyGrams {

  private val P = 2147483647L // 2^31 - 1

  def compute(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val hw = new Array[Long](len)
    var i = 0
    while (i < len) {
      hw(i) = if (words.isNullAt(i)) 0L else PolyHash.hash8(words.getUTF8String(i).toString)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= len - n) {
      var acc = hw(i)
      var k = 1
      while (k < n) { acc = (acc * 1000003L + hw(i + k)) % P; k += 1 }
      seen.add(acc)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object SimHashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def simhash32(words: Column): Column = column(SimHash32(expression(words)))
  def simhash37(words: Column): Column = column(SimHash37(expression(words)))
  def poly_shingles(words: Column): Column = column(PolyShingles(expression(words)))
  def poly_grams(words: Column, n: Int): Column = column(PolyGrams(expression(words), n))
}
