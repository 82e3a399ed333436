package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-token kernels. Spark's higher-order functions (`filter`/
  * `transform` lambdas) evaluate INTERPRETED per element; the lang-ID and
  * quality-score queries ran 5 such lambdas per token, which made `lang_id`
  * a top-5 bench cost at sf0.1. These are the same values computed in one
  * codegen-reachable pass per row — zero shuffles, scan-parallel, so the
  * shape is unchanged at 100 TB; only the per-row constant factor drops.
  */

/** Lowercased word tokens: split on non-alphanumerics, drop empties —
  * value-identical to `filter(split(lower(text), "[^a-z0-9]+"), len>0)`
  * and the DuckDB `list_filter(string_split_regex(...))` mirrors. */
case class WordTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_tokens requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WordTokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordTokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)
}

object WordTokens {
  def compute(input: UTF8String): GenericArrayData = {
    val toks = input.toString.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Count of array elements contained in a fixed word set (WITH
  * multiplicity) — value-identical to
  * `size(filter(arr, t => t.isin(words)))` / DuckDB
  * `len(list_filter(arr, t -> list_contains([...], t)))`. */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_in_set requires array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    CountInSet.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.CountInSet.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

object CountInSet {
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}
