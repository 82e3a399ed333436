package graft

import graft.functions.{BigramCounts, ChunkSpans, ContainsAllTokens,
  CountAlphaTokens, CountPunctChars, CountSubTokens, CountWsTokens,
  DropCoveredTokens, EmbedText, JsonGetExpr, MinKLongs, PiiCountExpr,
  PiiScrubExpr, Simhash64, SumStrLengths, TemplateExpr}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Session extension registering the engine's native expressions so they
  * are usable from SQL (`SELECT simhash64(body) ...`) as well as the
  * DataFrame API. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, or call
  * [[GraftFunctions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

object GraftFunctions {

  /** A one-column-argument builder with an arity check (silent
    * extra-argument swallowing via `children.head` was a review
    * finding). */
  private def unary(name: String)(
      build: Expression => Expression): Seq[Expression] => Expression =
    (children: Seq[Expression]) => {
      require(children.length == 1, s"$name(col) takes exactly 1 argument")
      build(children.head)
    }

  /** Plan-time integer parameter: a foldable int literal. */
  private def litInt(e: Expression, what: String): Int = e match {
    case l if l.foldable &&
        l.dataType == org.apache.spark.sql.types.IntegerType =>
      val v = l.eval(null)
      require(v != null, s"$what must not be null")
      v.asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Plan-time string parameter: a foldable string literal. */
  private def litString(e: Expression, what: String): String = e match {
    case l if l.foldable &&
        l.dataType == org.apache.spark.sql.types.StringType =>
      val v = l.eval(null)
      require(v != null, s"$what must not be null")
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private[graft] val descriptions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      unary("simhash64")(Simhash64(_))),
    (FunctionIdentifier("embed_text"),
      new ExpressionInfo(classOf[EmbedText].getName, "embed_text"),
      unary("embed_text")(EmbedText(_))),
    // the per-row scanner/count kernels (see each expression's scaladoc
    // for the built-in it is parity-proven against)
    (FunctionIdentifier("template_kernel"),
      new ExpressionInfo(classOf[TemplateExpr].getName, "template_kernel"),
      unary("template_kernel")(TemplateExpr(_))),
    (FunctionIdentifier("pii_scrub_kernel"),
      new ExpressionInfo(classOf[PiiScrubExpr].getName, "pii_scrub_kernel"),
      unary("pii_scrub_kernel")(PiiScrubExpr(_))),
    (FunctionIdentifier("pii_count_emails"),
      new ExpressionInfo(classOf[PiiCountExpr].getName, "pii_count_emails"),
      unary("pii_count_emails")(PiiCountExpr(_, emails = true))),
    (FunctionIdentifier("pii_count_phones"),
      new ExpressionInfo(classOf[PiiCountExpr].getName, "pii_count_phones"),
      unary("pii_count_phones")(PiiCountExpr(_, emails = false))),
    (FunctionIdentifier("count_ws_tokens"),
      new ExpressionInfo(classOf[CountWsTokens].getName, "count_ws_tokens"),
      unary("count_ws_tokens")(CountWsTokens(_))),
    (FunctionIdentifier("count_sub_tokens"),
      new ExpressionInfo(classOf[CountSubTokens].getName, "count_sub_tokens"),
      unary("count_sub_tokens")(CountSubTokens(_))),
    (FunctionIdentifier("count_punct_chars"),
      new ExpressionInfo(classOf[CountPunctChars].getName, "count_punct_chars"),
      unary("count_punct_chars")(CountPunctChars(_))),
    (FunctionIdentifier("sum_str_lengths"),
      new ExpressionInfo(classOf[SumStrLengths].getName, "sum_str_lengths"),
      unary("sum_str_lengths")(SumStrLengths(_))),
    (FunctionIdentifier("count_alpha_tokens"),
      new ExpressionInfo(classOf[CountAlphaTokens].getName, "count_alpha_tokens"),
      unary("count_alpha_tokens")(CountAlphaTokens(_))),
    (FunctionIdentifier("term_counts"),
      new ExpressionInfo(classOf[graft.functions.TermCounts].getName, "term_counts"),
      unary("term_counts")(graft.functions.TermCounts(_))),
    (FunctionIdentifier("bigram_counts"),
      new ExpressionInfo(classOf[BigramCounts].getName, "bigram_counts"),
      unary("bigram_counts")(BigramCounts(_))),
    // contains_all_tokens(col, 'query'): the query must be a foldable
    // string literal — it is tokenized once at plan time
    (FunctionIdentifier("contains_all_tokens"),
      new ExpressionInfo(classOf[ContainsAllTokens].getName,
        "contains_all_tokens"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "contains_all_tokens(col, 'query') takes 2 arguments")
        val q = litString(children(1), "contains_all_tokens query")
        ContainsAllTokens(children.head,
          scala.collection.immutable.ArraySeq.unsafeWrapArray(
            q.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)))
      }),
    // chunk_spans(col, c, s): window size and stride are plan-time ints
    (FunctionIdentifier("chunk_spans"),
      new ExpressionInfo(classOf[ChunkSpans].getName, "chunk_spans"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "chunk_spans(col, c, s) takes 3 arguments")
        ChunkSpans(children.head, litInt(children(1), "chunk_spans c"),
          litInt(children(2), "chunk_spans s"))
      }),
    // drop_covered_tokens(ts, starts, w): window width is a plan-time int
    (FunctionIdentifier("drop_covered_tokens"),
      new ExpressionInfo(classOf[DropCoveredTokens].getName,
        "drop_covered_tokens"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "drop_covered_tokens(ts, starts, w) takes 3 arguments")
        DropCoveredTokens(children.head, children(1),
          litInt(children(2), "drop_covered_tokens w"))
      }),
    // min_k_longs(col, k): bounded min-k aggregate; k is a plan-time int
    (FunctionIdentifier("min_k_longs"),
      new ExpressionInfo(classOf[MinKLongs].getName, "min_k_longs"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "min_k_longs(col, k) takes 2 arguments")
        MinKLongs(children.head, litInt(children(1), "min_k_longs k"))
      }),
    // json_get(col, 'key'): the key must be a foldable string literal —
    // the scanner is specialized per key at plan time
    (FunctionIdentifier("json_get"),
      new ExpressionInfo(classOf[JsonGetExpr].getName, "json_get"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "json_get(col, 'key') takes 2 arguments")
        val key = children(1) match {
          case lit if lit.foldable && lit.dataType ==
              org.apache.spark.sql.types.StringType =>
            val v = lit.eval(null)
            require(v != null, "json_get key must not be null")
            v.toString
          case other => throw new IllegalArgumentException(
            s"json_get key must be a string literal, got $other")
        }
        JsonGetExpr(children.head, key)
      }))

  /** Idempotent per-session registration (for sessions built without the
    * extensions config — e.g. the driver's own harness). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }

  /** Column-API form of the registered `simhash64`. */
  def simhash64(c: Column): Column = call_function("simhash64", c)

  /** Column-API form of the registered `embed_text` (384-d array<float>). */
  def embedText(c: Column): Column = call_function("embed_text", c)

  /** Wrap a raw Catalyst expression as a Column (classic-session bridge —
    * used for expressions with non-column parameters that don't fit the
    * SQL-registry path, e.g. [[graft.functions.AffineMinhash]]). */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** Catalyst expression behind a Column (for building native-expression
    * trees from Column-API arguments). */
  def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  /** Hash-aggregable `max_by(payload, ordering)` — the
    * [[graft.functions.MaxByOrd]] typed-imperative aggregate (value-
    * identical to the built-in when the ordering key is unique per
    * group; runs on ObjectHashAggregateExec instead of a full-input
    * SortAggregate). */
  def maxByOrd(payload: Column, ordering: Column): Column =
    columnOf(graft.functions.MaxByOrd(exprOf(payload), exprOf(ordering)))

  /** Fully-codegen `max_by(payload, ordering)` for fixed-width payloads
    * — the [[graft.functions.MaxByPrim]] declarative aggregate (flat
    * primitive buffer, `HashAggregateExec`). Same values as [[maxByOrd]]
    * wherever both apply; requires all payload/ordering fields
    * fixed-width primitives and non-null ordering fields (analysis
    * error / skipped rows otherwise — see the class contract). */
  def maxByPrim(payload: Column, ordering: Column): Column =
    columnOf(graft.functions.MaxByPrim(exprOf(payload), exprOf(ordering)))
}
