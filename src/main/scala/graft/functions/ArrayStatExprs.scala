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
  * like the built-in `length` (UTF8String.numChars), not UTF-16 units.
  * A NULL element poisons the whole sum to NULL, exactly like the
  * aggregate form (`length(null)` nulls the accumulator) — an earlier
  * draft skipped nulls and silently diverged (caught by review). */
case class SumStrLengths(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sum_str_lengths requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sum_str_lengths"

  override protected def nullSafeEval(input: Any): Any =
    SumStrLengths.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("sumLen")
      s"""
        java.lang.Long $boxed = graft.functions.SumStrLengths.compute($c);
        ${ev.isNull} = $boxed == null;
        ${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SumStrLengths =
    copy(child = newChild)
}

object SumStrLengths {
  /** Null if any element is null (the aggregate-lambda semantics). */
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      sum += arr.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(sum)
  }
}

/** Count of elements fully matching `^[a-z]+$` — value-identical to
  * `size(filter(arr, t => t.rlike("^[a-z]+\\$")))`, including two
  * regex subtleties (caught by review): Java's default `$` also matches
  * BEFORE a single final line terminator (`\n`, `\r`, `\r\n`, NEL
  * U+0085, U+2028, U+2029 — so "abc\n" counts), and a NULL element makes
  * the rlike predicate NULL, which `filter` drops (so nulls are simply
  * not counted). Byte-exact otherwise: a UTF-8 string is all-[a-z] iff
  * every byte is 0x61-0x7A (multi-byte sequences contain bytes ≥ 0x80),
  * so no decode is needed. */
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

  /** Byte length of the single trailing line terminator Java's `$` can
    * sit before: \n or \r (1), \r\n (2), U+0085 = C2 85 (2),
    * U+2028/U+2029 = E2 80 A8/A9 (3); 0 if none. */
  private def trailingTerminatorBytes(s: UTF8String, nb: Int): Int = {
    if (nb == 0) return 0
    val last = s.getByte(nb - 1)
    if (last == 0x0A.toByte) {
      if (nb >= 2 && s.getByte(nb - 2) == 0x0D.toByte) 2 else 1
    } else if (last == 0x0D.toByte) 1
    else if (last == 0x85.toByte && nb >= 2 && s.getByte(nb - 2) == 0xC2.toByte) 2
    else if ((last == 0xA8.toByte || last == 0xA9.toByte) && nb >= 3 &&
      s.getByte(nb - 2) == 0x80.toByte && s.getByte(nb - 3) == 0xE2.toByte) 3
    else 0
  }

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    var count = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val nb = s.numBytes()
        val m = nb - trailingTerminatorBytes(s, nb)
        if (m > 0) {
          var j = 0
          var ok = true
          while (ok && j < m) {
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
  @inline private def isMemberB(b: Byte): Boolean =
    (b >= 'a'.toByte && b <= 'z'.toByte) ||
      (b >= 'A'.toByte && b <= 'Z'.toByte) ||
      (b >= '0'.toByte && b <= '9'.toByte) ||
      b == 0x20.toByte || (b >= 0x09.toByte && b <= 0x0D.toByte)

  /** Byte scan, no String copy: every code point has exactly one
    * non-continuation byte ((b & 0xC0) != 0x80 -- ASCII or a lead byte),
    * the member set is pure ASCII, and `length()` counts code points the
    * same way (numChars walks lead bytes), so counting non-member
    * non-continuation bytes IS the code-point count of the remainder. */
  def compute(input: UTF8String): Int = {
    val nb = input.numBytes()
    var count = 0
    var i = 0
    while (i < nb) {
      val b = input.getByte(i)
      if ((b & 0xC0) != 0x80 && !isMemberB(b)) count += 1
      i += 1
    }
    count
  }
}
