package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass native kernels over `array<long>` hash columns. These replace
  * per-bit / per-permutation higher-order-function pipelines (`filter`/
  * `transform` lambdas are interpreted per element in Spark) with single
  * tight loops reachable from generated code — the profile-driven fix that
  * took the simhash/minhash queries from O(bits·n) interpreted closures to
  * one codegen'd call per row. The MATH is identical to the HOF/SQL forms,
  * so the DuckDB oracle mirrors are untouched.
  */

/** Majority bit-vote over an array of feature hashes: bit b of the result
  * is set iff more than half of the hashes have bit b set — the signature
  * step of SimHash when the per-feature hashes are precomputed (see
  * `queries/SimhashOps`: md5-based 60-bit oracle-parity variant). */
case class SimhashVote(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_vote requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_vote"

  override protected def nullSafeEval(input: Any): Any =
    SimhashVote.vote(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimhashVote.vote($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashVote =
    copy(child = newChild)
}

object SimhashVote {
  def vote(hashes: ArrayData, bits: Int): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](bits)
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    var i = 0
    while (i < n) {
      // walk only the SET bits (≈bits/2 cheap ops instead of a fixed
      // `bits`-iteration test loop — this scan is per shingle hash, the
      // hottest loop of the signature pass); tallies are unchanged
      var h = hashes.getLong(i) & mask
      while (h != 0L) {
        counts(java.lang.Long.numberOfTrailingZeros(h)) += 1
        h &= h - 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (2 * counts(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** K affine-permutation min-hashes `(a_j*h + b_j) mod p` over an array of
  * base hashes, in one pass (see `queries/TextOps`: MinHash signatures).
  * Returns `array<long>` of length k; empty input → all [[AffineMinhash.Empty]]
  * (matches `list_min` over an empty list being NULL-free via the SQL
  * mirror's guard — callers band over non-empty docs). */
case class AffineMinhash(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"affine_minhash requires array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "affine_minhash"

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override protected def nullSafeEval(input: Any): Any =
    AffineMinhash.minhash(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AffineMinhash.minhash($c, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): AffineMinhash =
    copy(child = newChild)
}

object AffineMinhash {
  val Empty: Long = Long.MaxValue

  def minhash(hashes: ArrayData, a: Array[Long], b: Array[Long], p: Long): GenericArrayData = {
    val k = a.length
    val mins = Array.fill(k)(Empty)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Distinct character k-shingles of whitespace-normalized lowercase text,
  * each hashed to `md5-hex[0, hexChars)` parsed base-16 — one native pass
  * replacing the `transform(sequence)→substr→md5→conv` HOF pipeline (the
  * values are IDENTICAL, including the DuckDB mirrors' `substr(md5(s),1,n)`
  * math; only the evaluation path changes). Used by the simhash-dedup and
  * MinHash signature queries. */
case class ShingleHashes(child: Expression, k: Int, hexChars: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $k, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Direct-mapped per-thread memo of (shingle, hexChars) → parsed MD5
    * prefix. Corpus text is repetitive, so most shingles recur across
    * documents and the digest — the measured per-row bottleneck of the
    * simhash/minhash signature scans — is paid once per distinct shingle
    * per thread. Hits are equals-verified on the stored string, and a
    * miss or slot collision recomputes, so the values are bit-identical
    * to the uncached kernel. hexChars rides in the value slot so the
    * k=4/15-hex and k=5/7-hex callers cannot cross-contaminate (shingle
    * LENGTH differs per k, so the string key alone separates the ks).
    * Sized by `spark.graft.memo.shingleBits` at executor init
    * ([[MemoConf]]) — shrinkable without a rebuild. */
  private lazy val CacheBits =
    MemoConf.bits("spark.graft.memo.shingleBits", 17)
  private[functions] final class Memo(bits: Int) {
    val mask = (1 << bits) - 1
    val shift = 32 - bits
    val keys = new Array[String](1 << bits)
    val vals = new Array[Long](1 << bits)
    val hexs = new Array[Int](1 << bits)
  }
  private val memos = new ThreadLocal[Memo] {
    override def initialValue(): Memo = new Memo(CacheBits)
  }

  def compute(input: org.apache.spark.unsafe.types.UTF8String,
      k: Int, hexChars: Int): GenericArrayData =
    compute(input, k, hexChars, memos.get())

  private[functions] def compute(input: org.apache.spark.unsafe.types.UTF8String,
      k: Int, hexChars: Int, memo: Memo): GenericArrayData = {
    val norm = input.toString.toLowerCase.replaceAll("\\s+", " ")
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + k <= norm.length) {
      seen.add(norm.substring(i, i + k))
      i += 1
    }
    val mask = memo.mask
    val out = new Array[Long](seen.size)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) {
      val s = it.next()
      val slot = (s.hashCode * 0x9E3779B1) >>> memo.shift & mask
      val cached = memo.keys(slot)
      if (memo.hexs(slot) == hexChars && cached != null && cached.equals(s)) {
        out(j) = memo.vals(slot)
      } else {
        val v = hashShingle(s, hexChars)
        memo.keys(slot) = s
        memo.vals(slot) = v
        memo.hexs(slot) = hexChars
        out(j) = v
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  private def hashShingle(s: String, hexChars: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // parse the first hexChars hex digits of the md5 as base-16 (exactly
    // conv(substring(md5(s),1,hexChars),16,10) / DuckDB '0x'||substr cast)
    var v = 0L
    var h = 0
    while (h < hexChars) {
      val b = d(h / 2) & 0xff
      val nibble = if (h % 2 == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nibble
      h += 1
    }
    v
  }
}

/** Distinct word n-grams (lowercase, split on non-alphanumerics, joined
  * with single spaces) — native one-pass form of
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ", toks[i..i+n])))`
  * over `TextFunctions.wordTokens`; identical values to the HOF pipeline
  * and the DuckDB `list_distinct(list_transform(range(...), ...))` mirror.
  * Used by the n-gram Jaccard dedup query, where the interpreted HOF
  * dominated the profile. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** ALL word n-grams in document order (duplicates kept — index i is the
  * window starting at token i): the positional counterpart of
  * [[WordNgrams]], feeding the substring-dedup window relation where the
  * start position carries meaning. Identical construction (lowercase,
  * split on non-alphanumerics, single-space joins); one native pass
  * replaces the interpreted transform/slice/array_join HOF chain. */
case class AllWordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"all_word_ngrams requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "all_word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    AllWordNgrams.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AllWordNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): AllWordNgrams =
    copy(child = newChild)
}

object AllWordNgrams {
  import org.apache.spark.unsafe.types.UTF8String

  def compute(input: UTF8String, n: Int): GenericArrayData = {
    val toks = input.toString.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object WordNgrams {
  import org.apache.spark.unsafe.types.UTF8String

  def compute(input: UTF8String, n: Int): GenericArrayData = {
    val toks = input.toString.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
