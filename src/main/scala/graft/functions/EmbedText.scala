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

  /** Direct-mapped per-thread memo of packed 3-gram → (bucket, sign).
    * Three UTF-16 chars pack losslessly into a 48-bit key, so a hit is
    * exact by construction; a miss or slot collision recomputes the
    * MurmurHash — the vector is bit-identical to the uncached kernel
    * (same memoization pattern as the simhash/shingle kernels). The
    * 3-gram loop is the measured bulk of the embedding scan (one
    * substring + hash per CHARACTER); word unigrams stay uncached.
    * Sized by `spark.graft.memo.embedBits` at executor init
    * ([[MemoConf]]) — shrinkable without a rebuild. */
  private lazy val CacheBits =
    MemoConf.bits("spark.graft.memo.embedBits", 16)
  private[functions] final class GramCache(bits: Int) {
    val mask = (1 << bits) - 1
    val shift = 64 - bits
    val keys = new Array[Long](1 << bits)
    val vals = new Array[Int](1 << bits)
  }
  private val caches = new ThreadLocal[GramCache] {
    override def initialValue(): GramCache = new GramCache(CacheBits)
  }

  /** Static kernel reachable from generated Java code. */
  def embed(input: UTF8String): GenericArrayData =
    new GenericArrayData(embedString(input.toString))

  def embedString(text: String): Array[Float] =
    embedString(text, caches.get())

  private[functions] def embedString(text: String,
      cache: GramCache): Array[Float] = {
    val v = new Array[Float](Dim)
    val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
    if (norm.nonEmpty) {
      norm.split(" ").foreach(addFeature(_, v))
      val mask = cache.mask
      var i = 0
      while (i + 3 <= norm.length) {
        val key = (norm.charAt(i).toLong << 32) |
          (norm.charAt(i + 1).toLong << 16) |
          norm.charAt(i + 2).toLong
        val slot = ((key * 0x9E3779B97F4A7C15L) >>> cache.shift).toInt & mask
        val code =
          if (key != 0L && cache.keys(slot) == key) cache.vals(slot)
          else {
            val h = scala.util.hashing.MurmurHash3
              .stringHash(norm.substring(i, i + 3), Seed)
            val c = (((h % Dim) + Dim) % Dim << 1) | ((h >>> 31) & 1)
            if (key != 0L) { cache.keys(slot) = key; cache.vals(slot) = c }
            c
          }
        v(code >>> 1) += (if ((code & 1) == 1) -1f else 1f)
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
