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

object SimHash32 {

  /** 31^(7−k) coefficients of the 8-char polynomial. */
  private val POW: Array[Long] = {
    val a = new Array[Long](8)
    var v = 1L
    var k = 7
    while (k >= 0) { a(k) = v; v *= 31L; k -= 1 }
    a
  }

  /** Static (forwarder) entry point referenced by generated code.
    * Null elements vote nothing (wordsCol never produces them; being
    * lenient here beats a per-row branch to null-out the whole doc).
    */
  def compute(words: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val s = words.getUTF8String(i).toString
        var h = 0L
        val len = if (s.length < 8) s.length else 8
        var k = 0
        while (k < len) { h += s.charAt(k).toLong * POW(k); k += 1 }
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
}

object SimHashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def simhash32(words: Column): Column = column(SimHash32(expression(words)))
}
