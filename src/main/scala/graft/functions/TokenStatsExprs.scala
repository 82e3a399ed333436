package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass token statistics.
  *
  * The quality/gopher/lang-id/repetition scans each re-tokenized the
  * document through [[WordTokens]]-family kernels: every call pays a
  * fresh `String.split` (which re-COMPILES the regex per row — the JDK
  * fast path only covers single-char patterns), materializes the token
  * array, converts each token to a `UTF8String`, and then a second
  * kernel walks that array to produce one count. At sf10 (500k docs)
  * those scans were the largest comparable bench rows (quality_score
  * 31.5 s, gopher_quality 53.6 s, lang_id 32.5 s, repetition_score
  * 43.6 s, weighted_sample 58.7 s).
  *
  * These expressions stream the SAME tokens (maximal `[a-z0-9]+` runs of
  * `lower(text)` — the [[ContainsAllTokens]] precedent, value-identical
  * to `split("[^a-z0-9]+")` + drop-empties by construction) and fold the
  * counts in place: no regex, no token array, no per-token UTF8String.
  * They return RAW COUNTS ONLY — every downstream double (score mixes,
  * 6-dp rounds) stays in the existing Catalyst column arithmetic, so
  * cross-engine value parity is untouched by construction.
  * TokenStatsKernelSpec pins value-parity against the composed forms.
  *
  * Scale shape is unchanged (scan-parallel, zero shuffle); only the
  * per-row constant factor drops.
  */
private[functions] object TokenScan {
  @inline def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  @inline def regionEquals(s: String, from: Int, until: Int, t: String): Boolean = {
    if (t.length != until - from) return false
    var i = 0
    while (i < t.length) {
      if (s.charAt(from + i) != t.charAt(i)) return false
      i += 1
    }
    true
  }
}

/** One-pass (n_toks, sum_len, n_alpha, n_stop) over the word tokens —
  * value-identical to `size(wordTokens)`, `SumStrLengths(wordTokens)`,
  * `CountAlphaTokens(wordTokens)` and `CountInSet(wordTokens, words)`
  * (tokens are pure-ASCII runs, so char length == code-point length). */
case class TokenStats(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  @transient private lazy val terms: Array[String] = words.toArray

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String], terms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("terms", terms, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStats.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  import TokenScan._

  def compute(input: UTF8String, terms: Array[String]): GenericInternalRow = {
    val norm = input.toString.toLowerCase
    val n = norm.length
    val k = terms.length
    var nToks = 0L
    var sumLen = 0L
    var nAlpha = 0L
    var nStop = 0L
    var i = 0
    while (i < n) {
      while (i < n && !isWord(norm.charAt(i))) i += 1
      val start = i
      var alpha = true
      while (i < n && isWord(norm.charAt(i))) {
        val c = norm.charAt(i)
        if (c >= '0' && c <= '9') alpha = false
        i += 1
      }
      if (i > start) {
        nToks += 1
        sumLen += i - start
        if (alpha) nAlpha += 1
        var t = 0
        while (t < k) {
          if (regionEquals(norm, start, i, terms(t))) { nStop += 1; t = k }
          else t += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](nToks, sumLen, nAlpha, nStop))
  }
}

/** One-pass membership counts (WITH multiplicity) of the word tokens
  * against SEVERAL word sets at once — value-identical to one
  * `CountInSet(wordTokens, set_i)` per set; `lang_id` folds its five
  * marker sets in a single scan instead of five. */
case class CountInSets(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_in_sets requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_in_sets"

  @transient private lazy val terms: Array[Array[String]] =
    sets.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    CountInSets.compute(input.asInstanceOf[UTF8String], terms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sets", terms, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.CountInSets.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSets =
    copy(child = newChild)
}

object CountInSets {
  import TokenScan._

  def compute(input: UTF8String, sets: Array[Array[String]]): GenericArrayData = {
    val norm = input.toString.toLowerCase
    val n = norm.length
    val counts = new Array[Long](sets.length)
    var i = 0
    while (i < n) {
      while (i < n && !isWord(norm.charAt(i))) i += 1
      val start = i
      while (i < n && isWord(norm.charAt(i))) i += 1
      if (i > start) {
        var s = 0
        while (s < sets.length) {
          val terms = sets(s)
          var t = 0
          while (t < terms.length) {
            if (regionEquals(norm, start, i, terms(t))) {
              counts(s) += 1; t = terms.length
            } else t += 1
          }
          s += 1
        }
      }
    }
    new GenericArrayData(counts)
  }
}

/** One-pass (n_toks, n_distinct) where n_distinct counts DISTINCT word
  * n-grams — value-identical to `size(wordTokens)` and
  * `size(WordNgrams(text, n))`. Space-joined grams are injective over
  * `[a-z0-9]+` tokens, so distinctness of (id_1..id_n) token-id tuples
  * equals distinctness of the joined strings; ids pack into one long
  * (21 bits each for n=3) probed through an open-addressed long set —
  * no gram strings are ever built. Documents beyond 2^21 distinct
  * tokens (≫ any real document) fall back to the string-set path. */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {

  require(n == 2 || n == 3, "ngram_stats supports n = 2 or 3")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_stats requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "ngram_stats"

  override protected def nullSafeEval(input: Any): Any =
    NgramStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
}

object NgramStats {
  import TokenScan._

  private final val IdBits = 21
  private final val MaxIds = 1 << IdBits

  def compute(input: UTF8String, n: Int): GenericInternalRow = {
    val norm = input.toString.toLowerCase
    val len = norm.length
    // pass 1 of 1: tokenize to interned int ids on the fly
    var ids = new Array[Int](64)
    var nToks = 0
    val intern = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < len) {
      while (i < len && !isWord(norm.charAt(i))) i += 1
      val start = i
      while (i < len && isWord(norm.charAt(i))) i += 1
      if (i > start) {
        val tok = norm.substring(start, i)
        var id = intern.get(tok)
        if (id == null) { id = Integer.valueOf(intern.size()); intern.put(tok, id) }
        if (nToks == ids.length) ids = java.util.Arrays.copyOf(ids, ids.length * 2)
        ids(nToks) = id.intValue()
        nToks += 1
      }
    }
    val windows = nToks - n + 1
    if (windows <= 0 || intern.size() >= MaxIds)
      return new GenericInternalRow(Array[Any](nToks.toLong,
        if (windows <= 0) 0L else distinctByString(ids, nToks, intern, n)))
    // open-addressed long set of packed id tuples
    var cap = java.lang.Integer.highestOneBit(math.max(windows * 2 - 1, 4)) * 2
    var table = new Array[Long](cap)
    java.util.Arrays.fill(table, -1L)
    var distinct = 0L
    var w = 0
    while (w < windows) {
      var key = 0L
      var j = 0
      while (j < n) { key = (key << IdBits) | ids(w + j).toLong; j += 1 }
      // linear probe; -1 = empty (keys are non-negative by construction)
      var slot = (java.lang.Long.hashCode(key * 0x9E3779B97F4A7C15L) & (cap - 1))
      var done = false
      while (!done) {
        val v = table(slot)
        if (v == key) done = true
        else if (v == -1L) { table(slot) = key; distinct += 1; done = true }
        else slot = (slot + 1) & (cap - 1)
      }
      w += 1
    }
    new GenericInternalRow(Array[Any](nToks.toLong, distinct))
  }

  /** Exactness fallback for absurdly token-diverse documents. */
  private def distinctByString(ids: Array[Int], nToks: Int,
      intern: java.util.HashMap[String, Integer], n: Int): Long = {
    val rev = new Array[String](intern.size())
    intern.forEach((k, v) => rev(v.intValue()) = k)
    val seen = new java.util.HashSet[String]()
    var w = 0
    while (w + n <= nToks) {
      val sb = new java.lang.StringBuilder(rev(ids(w)))
      var j = 1
      while (j < n) { sb.append(' ').append(rev(ids(w + j))); j += 1 }
      seen.add(sb.toString)
      w += 1
    }
    seen.size().toLong
  }
}
