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
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(input: UTF8String): Int = {
    val s = input.toString
    val n = s.length
    var i = 0
    var count = 0
    while (i < n) {
      if (isWs(s.charAt(i))) i += 1
      else {
        count += 1
        i += 1
        while (i < n && !isWs(s.charAt(i))) i += 1
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
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isLower(c: Char): Boolean = c >= 'a' && c <= 'z'
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def compute(input: UTF8String): Int = {
    val s = input.toString
    val n = s.length
    var i = 0
    var count = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isLower(c)) {
        var run = 0
        while (i < n && isLower(s.charAt(i))) { i += 1; run += 1 }
        count += (run + 3) / 4 // greedy {1,4}: ceil(run/4) pieces
      } else if (isDigit(c)) {
        count += 1
        i += 1
        while (i < n && isDigit(s.charAt(i))) i += 1
      } else if (isWs(c)) {
        i += 1
      } else {
        count += 1
        i += 1
        while (i < n && {
          val d = s.charAt(i); !isLower(d) && !isDigit(d) && !isWs(d)
        }) i += 1
      }
    }
    count
  }
}
