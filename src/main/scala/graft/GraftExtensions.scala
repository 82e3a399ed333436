package graft

import graft.functions.{EmbedText, Simhash64}
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

  private[graft] val descriptions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      (children: Seq[Expression]) => Simhash64(children.head)),
    (FunctionIdentifier("embed_text"),
      new ExpressionInfo(classOf[EmbedText].getName, "embed_text"),
      (children: Seq[Expression]) => EmbedText(children.head)))

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
}
