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

/** Order-sensitive document fingerprint: polynomial rolling hash (the
  * Rabin–Karp family) over the word tokens —
  * `h = fold(tokens)((acc, t) => (acc*B + md5_60(t) mod P) mod P)` with
  * `B = 1000003`, `P = 1e9+7`, `md5_60` = first 15 md5 hex digits parsed
  * base-16 (the engine's standard portable token hash). Unlike the md5
  * content fingerprint (exact-dup identity), the rolling form is
  * incremental — chunk fingerprints of a stream compose without
  * re-hashing — and every step is expressible in the DuckDB oracle
  * (`list_reduce`). One native pass per row; scan-parallel at any scale. */
case class RollingFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fp requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp"

  override protected def nullSafeEval(input: Any): Any =
    RollingFp.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingFp.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)
}

object RollingFp {
  val B = 1000003L
  val P = 1000000007L

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(input: UTF8String): Long = {
    val toks = input.toString.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val md = digests.get()
    var h = 0L
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex digits base-16 == ('0x'||substr(md5(t),1,15))::BIGINT
      var v = 0L
      var hx = 0
      while (hx < 15) {
        val b = d(hx / 2) & 0xff
        val nibble = if (hx % 2 == 0) b >>> 4 else b & 0xf
        v = (v << 4) | nibble
        hx += 1
      }
      h = (h * B + v % P) % P
      i += 1
    }
    h
  }
}

/** Distinct word tokens with their WITHIN-DOCUMENT counts, in one pass —
  * value-identical (as a (tok, tf) multiset) to
  * `explode(wordTokens(text))` followed by `groupBy(doc_id, tok).count()`,
  * but computed scan-locally: term frequency is a per-document statistic,
  * so the exchange that plan pays to co-locate a document's token
  * OCCURRENCES (one shuffle row per token position in the corpus) carries
  * no information the row didn't already have. `keywords_tfidf` uses this
  * to drop its largest exchange; the corpus-level document-frequency
  * census and the tf×idf join still shuffle one row per DISTINCT term per
  * document — the relation that actually needs corpus-wide co-location. */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"term_counts requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tok", StringType, nullable = false),
      StructField("tf", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "term_counts"

  override protected def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

object TermCounts {
  def compute(input: UTF8String): GenericArrayData = {
    val toks = input.toString.toLowerCase.split("[^a-z0-9]+")
    val m = new java.util.LinkedHashMap[String, Integer]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        val prev = m.get(t)
        m.put(t, if (prev == null) Integer.valueOf(1)
          else Integer.valueOf(prev.intValue() + 1))
      }
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue.intValue()))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct ADJACENT token pairs with their within-document counts, in
  * one pass — value-identical (as a (w1, w2, cnt) multiset) to the
  * zip-slice pair explode followed by a per-document pair count. Same
  * rationale as [[TermCounts]]: a document's bigram frequencies are a
  * per-row statistic, so `bigram_surprisal`'s per-pair-occurrence
  * exchanges (census AND scoring join) collapse to
  * one-row-per-distinct-pair-per-document. Documents with < 2 tokens
  * yield an empty array (the guard the zip form needed explicitly). */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bigram_counts requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false),
      StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bigram_counts"

  override protected def nullSafeEval(input: Any): Any =
    BigramCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)
}

object BigramCounts {
  def compute(input: UTF8String): GenericArrayData = {
    val toks = input.toString.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val m = new java.util.LinkedHashMap[(String, String), Integer]()
    var i = 0
    while (i + 1 < toks.length) {
      val key = (toks(i), toks(i + 1))
      val prev = m.get(key)
      m.put(key, if (prev == null) Integer.valueOf(1)
        else Integer.valueOf(prev.intValue() + 1))
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey._1),
          UTF8String.fromString(e.getKey._2), e.getValue.intValue()))
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Tokens surviving substring-dedup span removal: given a document's
  * tokens and the 1-based START positions of its removed `w`-token
  * windows, returns the tokens not covered by any `[p, p+w-1]` interval.
  * Value-identical to exploding every removed window into its `w` token
  * positions, `collect_set`-ing them, and filtering with
  * `array_contains` — but the caller shuffles only window STARTS (a
  * `w`-fold smaller exchange) and the mask applies in O(len + starts)
  * per row via an interval diff-array, where the HOF form paid
  * O(len × covered) interpreted `array_contains` probes per document. */
case class DropCoveredTokens(left: Expression, right: Expression, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType | LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"drop_covered_tokens requires (array<string>, array<int|long>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "drop_covered_tokens"

  private lazy val startsLong =
    right.dataType.asInstanceOf[ArrayType].elementType == LongType

  override protected def nullSafeEval(ts: Any, starts: Any): Any =
    DropCoveredTokens.compute(ts.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], startsLong, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DropCoveredTokens.compute($a, $b, $startsLong, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropCoveredTokens =
    copy(left = newLeft, right = newRight)
}

object DropCoveredTokens {
  def compute(ts: ArrayData, starts: ArrayData, startsLong: Boolean,
      w: Int): GenericArrayData = {
    val n = ts.numElements()
    val diff = new Array[Int](n + 2)
    val m = starts.numElements()
    var i = 0
    while (i < m) {
      val p = if (startsLong) starts.getLong(i) else starts.getInt(i).toLong
      var lo = p
      if (lo < 1L) lo = 1L
      var hi = p + (w - 1)
      if (hi > n) hi = n.toLong
      if (lo <= hi) {
        diff(lo.toInt) += 1
        diff(hi.toInt + 1) -= 1
      }
      i += 1
    }
    var cover = 0
    var kept = 0
    i = 1
    while (i <= n) {
      cover += diff(i)
      if (cover == 0) kept += 1
      i += 1
    }
    val out = new Array[Any](kept)
    cover = 0
    var j = 0
    i = 1
    while (i <= n) {
      cover += diff(i)
      if (cover == 0) { out(j) = ts.getUTF8String(i - 1); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All overlapping context-window chunks of a document in one pass:
  * tokenize (WordTokens rules), then for each start `1 + k·s ≤ n_tok`
  * emit `(chunk_id, chunk_start, n_tok, txt)` where `txt` joins the
  * `c`-token window with single spaces — value-identical to the
  * explode(sequence)+slice+array_join composition, but the token array
  * is built once per DOCUMENT: the explode form copies the full array
  * into every chunk row's unsafe buffer (a ~n/s-fold byte blowup that
  * dominated the chunking scan). Zero-token documents emit an empty
  * array, which explode drops — the same doc-drop the old plan's
  * `filter(size > 0)` did. */
case class ChunkSpans(child: Expression, c: Int, s: Int)
    extends UnaryExpression {

  require(c >= 1 && s >= 1, "chunk_spans requires c >= 1 and s >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"chunk_spans requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_id", LongType, nullable = false),
      StructField("chunk_start", LongType, nullable = false),
      StructField("n_tok", LongType, nullable = false),
      StructField("txt", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "chunk_spans"

  override protected def nullSafeEval(input: Any): Any =
    ChunkSpans.compute(input.asInstanceOf[UTF8String], c, s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.ChunkSpans.compute($in, $c, $s)")

  override protected def withNewChildInternal(newChild: Expression): ChunkSpans =
    copy(child = newChild)
}

object ChunkSpans {
  def compute(input: UTF8String, c: Int, s: Int): GenericArrayData = {
    val toks = input.toString.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val n = toks.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val nChunks = (n - 1) / s + 1
    val out = new Array[Any](nChunks)
    var k = 0
    while (k < nChunks) {
      val start = 1 + k * s
      val end = math.min(start + c - 1, n)
      val sb = new java.lang.StringBuilder
      var i = start - 1
      while (i < end) {
        if (i > start - 1) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](k + 1L, start.toLong, (end - start + 1).toLong,
          UTF8String.fromString(sb.toString)))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** ALL query tokens present in the document's word-token set, one pass,
  * early exit — value-identical to
  * `wordTokens(text)` + an `array_contains` conjunct per query token,
  * but without materializing the token array or re-walking it per
  * conjunct: tokens stream out of the lowercase scan and tick off set
  * membership, returning as soon as every query token has been seen.
  * Empty query matches everything (the conjunction over zero terms). */
case class ContainsAllTokens(child: Expression, query: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"contains_all_tokens requires string, got ${t.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "contains_all_tokens"

  @transient private lazy val terms: Array[String] = query.toArray

  override protected def nullSafeEval(input: Any): Any =
    ContainsAllTokens.compute(input.asInstanceOf[UTF8String], terms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("terms", terms, "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ContainsAllTokens.compute($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ContainsAllTokens =
    copy(child = newChild)
}

object ContainsAllTokens {
  def compute(input: UTF8String, terms: Array[String]): Boolean = {
    val k = terms.length
    if (k == 0) return true
    val norm = input.toString.toLowerCase
    val n = norm.length
    var remaining = k
    val found = new Array[Boolean](k)
    var i = 0
    while (i < n) {
      // skip separators
      while (i < n && !isWord(norm.charAt(i))) i += 1
      val start = i
      while (i < n && isWord(norm.charAt(i))) i += 1
      if (i > start) {
        var t = 0
        while (t < k) {
          if (!found(t) && regionEquals(norm, start, i, terms(t))) {
            found(t) = true
            remaining -= 1
            if (remaining == 0) return true
          }
          t += 1
        }
      }
    }
    false
  }

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  private def regionEquals(s: String, from: Int, until: Int, t: String): Boolean = {
    if (t.length != until - from) return false
    var i = 0
    while (i < t.length) {
      if (s.charAt(from + i) != t.charAt(i)) return false
      i += 1
    }
    true
  }
}
