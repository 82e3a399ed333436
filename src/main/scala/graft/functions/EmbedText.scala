package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** V5 — deterministic dense text embedder, the declared stand-in for the
  * reference's `BAAI/bge-small-en-v1.5` ONNX model (384-d, cosine space;
  * `/root/reference/app/services/qdrant_service.py:22-26`, dim probed at
  * `:26`, model name `app/core/config.py:27`). No models or network exist
  * in this environment (SURVEY §7.5.2), so the engine ships a feature-hashed
  * embedding with the SAME interface, dimensionality and downstream
  * semantics (cosine scoring, top-k, recommend), and fully deterministic
  * output — hermetic tests, identical vectors on every executor.
  *
  * Semantics: lowercase, collapse whitespace; features = word unigrams plus
  * character 3-grams; each feature is MurmurHash3-hashed (seed 0x9747b28c)
  * to a bucket in [0, 384) with a sign bit; bucket counts are signed-summed
  * and the vector L2-normalized (zero vector stays zero).
  */
case class EmbedText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"embed_text requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "embed_text"

  override protected def nullSafeEval(input: Any): Any =
    EmbedText.embed(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EmbedText.embed($c)")

  override protected def withNewChildInternal(newChild: Expression): EmbedText =
    copy(child = newChild)
}

object EmbedText {
  val Dim = 384
  private val Seed = 0x9747b28c

  /** Static kernel reachable from generated Java code. */
  def embed(input: UTF8String): GenericArrayData =
    new GenericArrayData(embedString(input.toString))

  def embedString(text: String): Array[Float] = {
    val v = new Array[Float](Dim)
    val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (norm.nonEmpty) {
      norm.split(" ").foreach(addFeature(_, v))
      var i = 0
      while (i + 3 <= norm.length) {
        addFeature(norm.substring(i, i + 3), v)
        i += 1
      }
    }
    var ss = 0.0
    var i = 0
    while (i < Dim) { ss += v(i).toDouble * v(i); i += 1 }
    if (ss > 0) {
      val inv = (1.0 / math.sqrt(ss)).toFloat
      i = 0
      while (i < Dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  private def addFeature(f: String, v: Array[Float]): Unit = {
    val h = scala.util.hashing.MurmurHash3.stringHash(f, Seed)
    val bucket = ((h % Dim) + Dim) % Dim
    v(bucket) += (if (((h >>> 31) & 1) == 1) -1f else 1f)
  }
}
