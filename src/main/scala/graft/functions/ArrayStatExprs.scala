package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scan-statistic kernels for the quality-scoring family. The Gopher and
  * quality-score signals were built-in compositions whose per-element
  * work runs INTERPRETED (`aggregate`/`filter` HOF lambdas) or through a
  * regex engine (`rlike` per token, `regexp_replace` per row) only to be
  * reduced to a count/sum immediately — the dominant per-row cost of
  * `gopher_quality` at sf1. Each kernel computes the identical value in
  * one pass (ArrayStatKernelSpec proves value-parity against the
  * built-in compositions).
  */

/** Sum of element `length()`s over an array<string> — value-identical to
  * `aggregate(arr, 0L, (acc, t) => acc + length(t))`. Counts CODE POINTS
  * like the built-in `length` (UTF8String.numChars), not UTF-16 units. */
case class SumStrLengths(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sum_str_lengths requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sum_str_lengths"

  override protected def nullSafeEval(input: Any): Any =
    SumStrLengths.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SumStrLengths.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SumStrLengths =
    copy(child = newChild)
}

object SumStrLengths {
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) sum += arr.getUTF8String(i).numChars()
      i += 1
    }
    sum
  }
}

/** Count of elements fully matching `^[a-z]+$` — value-identical to
  * `size(filter(arr, t => t.rlike("^[a-z]+\\$")))`. Byte-exact: a UTF-8
  * string is all-[a-z] iff every BYTE is 0x61-0x7A (multi-byte sequences
  * contain bytes ≥ 0x80), so no decode is needed. */
case class CountAlphaTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_alpha_tokens requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_alpha_tokens"

  override protected def nullSafeEval(input: Any): Any =
    CountAlphaTokens.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountAlphaTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CountAlphaTokens =
    copy(child = newChild)
}

object CountAlphaTokens {
  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val nb = s.numBytes()
        if (nb > 0) {
          var j = 0
          var ok = true
          while (ok && j < nb) {
            val b = s.getByte(j)
            if (b < 'a'.toByte || b > 'z'.toByte) ok = false
            j += 1
          }
          if (ok) count += 1
        }
      }
      i += 1
    }
    count
  }
}

/** Count of punctuation CODE POINTS: everything outside
  * `[a-zA-Z0-9\s]` — value-identical to
  * `length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))` (the built-in
  * deletes matching chars then counts code points of the remainder;
  * a supplementary char is one code point on both paths). */
case class CountPunctChars(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_punct_chars requires string, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_punct_chars"

  override protected def nullSafeEval(input: Any): Any =
    CountPunctChars.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountPunctChars.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CountPunctChars =
    copy(child = newChild)
}

object CountPunctChars {
  @inline private def isMember(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') ||
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(input: UTF8String): Int = {
    val s = input.toString
    val n = s.length
    var count = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) {
        count += 1 // one supplementary code point, never in the ASCII set
        i += 2
      } else {
        if (!isMember(c)) count += 1
        i += 1
      }
    }
    count
  }
}
