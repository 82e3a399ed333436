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

  /** Direct-mapped per-thread memo of shingle → 64-bit MD5-derived
    * feature hash. A 4-char shingle packs exactly into a long key;
    * corpus text is repetitive (boilerplate, near-duplicates), so most
    * shingles recur and the MD5 — the measured per-row bottleneck of
    * `simhash_fp`/`simhash_dedup` — is paid once per distinct shingle
    * per thread instead of once per occurrence. Collisions simply
    * overwrite (it is a cache, not a map): a miss or slot mismatch
    * recomputes the digest, so the RESULT is bit-identical to the
    * uncached kernel in every case. 2^18 slots × 16 B = 4 MB/thread at
    * the default; sized by `spark.graft.memo.simhashBits` at executor
    * init ([[MemoConf]]) — shrinkable without a rebuild. */
  private lazy val CacheBits =
    MemoConf.bits("spark.graft.memo.simhashBits", 18)
  private[functions] final class ShingleCache(bits: Int) {
    val mask = (1 << bits) - 1
    val shift = 64 - bits
    val keys = new Array[Long](1 << bits)
    val vals = new Array[Long](1 << bits)
  }
  private val caches = new ThreadLocal[ShingleCache] {
    override def initialValue(): ShingleCache = new ShingleCache(CacheBits)
  }

  /** Static kernel reachable from generated Java code. */
  def compute(input: UTF8String): Long = computeString(input.toString)

  def computeString(text: String): Long =
    computeString(text, caches.get())

  private[functions] def computeString(text: String,
      cache: ShingleCache): Long = {
    val norm = text.toLowerCase.replaceAll("\\s+", " ")
    val n = norm.length
    val ones = new Array[Int](64)
    var total = 0
    if (n <= Shingle) {
      accumulate(hashFeature(norm), ones)
      total = 1
    } else {
      val mask = cache.mask
      var i = 0
      while (i + Shingle <= n) {
        // 4 UTF-16 chars pack losslessly into the 64-bit cache key;
        // key 0 (four NUL chars) shares a slot with "empty" and just
        // always recomputes — still exact
        val key = (norm.charAt(i).toLong << 48) |
          (norm.charAt(i + 1).toLong << 32) |
          (norm.charAt(i + 2).toLong << 16) |
          norm.charAt(i + 3).toLong
        val slot = ((key * 0x9E3779B97F4A7C15L) >>> cache.shift).toInt & mask
        val hv =
          if (key != 0L && cache.keys(slot) == key) cache.vals(slot)
          else {
            val h = hashFeature(norm.substring(i, i + Shingle))
            if (key != 0L) { cache.keys(slot) = key; cache.vals(slot) = h }
            h
          }
        accumulate(hv, ones)
        total += 1
        i += 1
      }
    }
    // bit b set iff votes(b) = ones(b) − (total − ones(b)) > 0
    var h = 0L
    var b = 0
    while (b < 64) {
      if (2 * ones(b) > total) h |= (1L << b)
      b += 1
    }
    h
  }

  /** Walk only the SET bits of the feature hash (≈32 vs a fixed-64
    * ±1-vote loop); `ones` + the shingle total reconstruct the exact
    * same vote tallies. */
  private def accumulate(hv: Long, ones: Array[Int]): Unit = {
    var h = hv
    while (h != 0L) {
      ones(java.lang.Long.numberOfTrailingZeros(h)) += 1
      h &= h - 1
    }
  }

  private def hashFeature(feature: String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(feature.getBytes(StandardCharsets.UTF_8))
    var hv = 0L
    var i = 0
    while (i < 8) { hv = (hv << 8) | (d(i) & 0xffL); i += 1 }
    hv
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
