package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-only token kernels. The `token_count` gate row (and
  * `pack_sequences`' length budget) need token COUNTS, but the built-in
  * forms materialize full token arrays per row — `split` allocates every
  * piece, `regexp_extract_all` every match, and the `filter` HOF evaluates
  * its lambda interpreted per element — only for `size` to throw the
  * array away. These kernels produce the same Int in one allocation-free
  * scan (TokenCountKernelSpec proves count-parity against java.util.regex,
  * the engine behind the built-ins).
  */

/** Count of non-empty `\s+`-separated tokens — value-identical to
  * `size(filter(split(text, "\\s+"), t => length(t) > 0))`, i.e. the
  * number of maximal non-whitespace runs (`\s` = space \t \n \x0B \f \r). */
case class CountWsTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_ws_tokens requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_ws_tokens"

  override protected def nullSafeEval(input: Any): Any =
    CountWsTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountWsTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CountWsTokens =
    copy(child = newChild)
}

object CountWsTokens {
  // \s bytes: space, \t, \n, \x0B, \f, \r. Bytes >= 0x80 (negative as
  // Java bytes) are parts of multi-byte chars -> non-ws, so a byte scan
  // gives the same run structure as a char scan with NO String copy.
  @inline private def isWsB(b: Byte): Boolean =
    b == 0x20.toByte || (b >= 0x09.toByte && b <= 0x0D.toByte)

  def compute(input: UTF8String): Int = {
    val nb = input.numBytes()
    var i = 0
    var count = 0
    while (i < nb) {
      if (isWsB(input.getByte(i))) i += 1
      else {
        count += 1
        i += 1
        while (i < nb && !isWsB(input.getByte(i))) i += 1
      }
    }
    count
  }
}

/** Count of matches of `[a-z]{1,4}|[0-9]+|[^a-z0-9\s]+` — value-identical
  * to `size(regexp_extract_all(input, ...))` with that pattern (the
  * BPE-ish subword count; run it over `lower(text)` like the gate row
  * does — lowercasing itself stays a built-in so its Unicode semantics
  * are Spark's, not this kernel's).
  *
  * The alternation collapses to a scan: a lowercase-letter run of length
  * L yields ceil(L/4) matches (greedy {1,4}, no following constraint so
  * never backtracks), a digit run yields 1, a maximal run of
  * anything-else-except-whitespace yields 1, whitespace separates. */
case class CountSubTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_sub_tokens requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_sub_tokens"

  override protected def nullSafeEval(input: Any): Any =
    CountSubTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountSubTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CountSubTokens =
    copy(child = newChild)
}

object CountSubTokens {
  // all three classes are ASCII; bytes >= 0x80 (negative) fall in the
  // "other" class like the multi-byte chars they encode, so a byte scan
  // preserves the run structure with NO String copy
  @inline private def isWsB(b: Byte): Boolean =
    b == 0x20.toByte || (b >= 0x09.toByte && b <= 0x0D.toByte)
  @inline private def isLowerB(b: Byte): Boolean =
    b >= 'a'.toByte && b <= 'z'.toByte
  @inline private def isDigitB(b: Byte): Boolean =
    b >= '0'.toByte && b <= '9'.toByte

  def compute(input: UTF8String): Int = {
    val nb = input.numBytes()
    var i = 0
    var count = 0
    while (i < nb) {
      val b = input.getByte(i)
      if (isLowerB(b)) {
        var run = 0
        while (i < nb && isLowerB(input.getByte(i))) { i += 1; run += 1 }
        count += (run + 3) / 4 // greedy {1,4}: ceil(run/4) pieces
      } else if (isDigitB(b)) {
        count += 1
        i += 1
        while (i < nb && isDigitB(input.getByte(i))) i += 1
      } else if (isWsB(b)) {
        i += 1
      } else {
        count += 1
        i += 1
        while (i < nb && {
          val d = input.getByte(i); !isLowerB(d) && !isDigitB(d) && !isWsB(d)
        }) i += 1
      }
    }
    count
  }
}
