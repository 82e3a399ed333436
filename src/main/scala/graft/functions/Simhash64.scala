package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** P3 — 64-bit Simhash of a string as a native Catalyst `Expression`
  * (codegen'd: the generated code calls the static kernel below, the same
  * pattern Spark's own `sha2`/`crc32` use — no UDF serialization, stays
  * inside WholeStageCodegen).
  *
  * Declared semantics (stable, engine-internal — SURVEY §7.5.1):
  * lowercase, collapse whitespace runs to one space, slide character
  * 4-shingles (whole string when shorter), hash each shingle with MD5 and
  * take the first 8 bytes big-endian as a 64-bit feature hash, then
  * majority-vote each bit weighted by shingle multiplicity; bit i of the
  * result is 1 iff the weighted vote is positive.
  *
  * Reference behavior: `/root/reference/app/services/ingestion_service.py:31-39`
  * (`Simhash(template, f=64)` → 64-element {0,1} vector). We keep the
  * packed long (8 bytes/row) — the reference's binary-quantized Tier-1
  * fingerprint is exactly this bitset.
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    Simhash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
}

object Simhash64 {
  private val Shingle = 4

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static kernel reachable from generated Java code. */
  def compute(input: UTF8String): Long = computeString(input.toString)

  def computeString(text: String): Long = {
    val norm = text.toLowerCase.replaceAll("\\s+", " ")
    val votes = new Array[Int](64)
    if (norm.length <= Shingle) vote(norm, votes)
    else {
      var i = 0
      while (i + Shingle <= norm.length) {
        vote(norm.substring(i, i + Shingle), votes)
        i += 1
      }
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) h |= (1L << b)
      b += 1
    }
    h
  }

  private def vote(feature: String, votes: Array[Int]): Unit = {
    val md = digests.get()
    md.reset()
    val d = md.digest(feature.getBytes(StandardCharsets.UTF_8))
    var hv = 0L
    var i = 0
    while (i < 8) { hv = (hv << 8) | (d(i) & 0xffL); i += 1 }
    var b = 0
    while (b < 64) {
      votes(b) += (if (((hv >>> b) & 1L) == 1L) 1 else -1)
      b += 1
    }
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
