package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native log de-parameterization — the kernel form of the template
  * triple `regexp_replace` ([[TextFunctions.UuidRe]] → [[TextFunctions.Ipv4Re]]
  * → [[TextFunctions.IntRe]], each to `*`), in the [[PiiScrubExpr]] mold.
  *
  * Why it exists: template extraction runs per EVENT on the always-on
  * ingest path (`IngestPipeline` derives template + rhythm hash for every
  * record; reference: `/root/reference/app/services/ingestion_service.py:16-21`)
  * and the sf1 bench put the regex pipeline at ~6× DuckDB's RE2
  * (template_hash 2.6 s vs 0.43 s). All three patterns are
  * regular-expression-trivial: fixed-shape hex (UUID), dotted digit runs
  * (IPv4), digit runs (int), each `\b`-anchored — scannable without a
  * regex engine.
  *
  * Semantics are BYTE-IDENTICAL to the three-pass java.util.regex
  * pipeline (the engine behind Spark's `regexp_replace`), including:
  *  - three SEQUENTIAL passes (each over the previous pass's output —
  *    the `*` placeholders a pass inserts are non-word chars and thus
  *    form `\b` boundaries for the next pass);
  *  - `\b` = transition between a word code point (`'_'` or
  *    `Character.isLetterOrDigit` — Java's `\b` is Unicode-aware even in
  *    default mode) and non-word/edge, so `abc123`/`123abc`/`é123` digit
  *    runs do NOT match IntRe, and an UPPERCASE or word-embedded UUID
  *    does not match UuidRe (the reference's own lowercase-only
  *    behavior, pinned in SURVEY §2.2);
  *  - IPv4's `\d{1,3}` greedy groups: a 4+-digit run fails every
  *    backtrack (no dot reachable), so `1234.1.2.3` is NOT an address,
  *    while `9.1.2.3.4` matches its first four octets and leaves `.4`;
  *  - leftmost, non-overlapping `find()` scanning per pass.
  *
  * TemplateKernelSpec proves byte-identity on adversarial fixtures plus a
  * 25k-case random fuzz against java.util.regex itself. The DuckDB oracle
  * of the `template_hash` gate row (RE2 `regexp_replace`) remains the
  * independent cross-engine check.
  *
  * Scale shape: one virtual call per row inside WholeStageCodegen, three
  * linear scans, zero allocation when nothing matches (the common case for
  * already-clean text returns the input buffer untouched). */
case class TemplateExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"template requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "template_kernel"

  override protected def nullSafeEval(input: Any): Any =
    Template.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Template.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): TemplateExpr =
    copy(child = newChild)
}

object Template {

  /** java.util.regex's `\b` word character WITHOUT
    * UNICODE_CHARACTER_CLASS (JDK Pattern.Bound): `'_' ||
    * Character.isLetterOrDigit(codePoint)` — Unicode-aware even in
    * default mode (é and ٣ are word chars; a combining mark, ³ or an
    * emoji is not). NOT the ASCII `[A-Za-z0-9_]` — an earlier draft used
    * that and diverged from the regex pipeline on any non-ASCII
    * letter/digit adjacent to a digit run (caught by review; the fuzz
    * alphabet now carries non-ASCII word and non-word chars). Note the
    * DuckDB oracle's RE2 `\b` IS ASCII-only — the cross-engine check is
    * valid on the ASCII fixtures, and the engine follows java.util.regex
    * (= the Python reference's Unicode `\b`) where they diverge. */
  @inline private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isHex(c: Char): Boolean =
    isDigit(c) || (c >= 'a' && c <= 'f')

  /** JDK Bound's combining-mark rule (measured: `1́ 25` has NO
    * boundary before the 25, `x́́ 25` none either, while
    * `_́ 25` and `.́ 25` DO — and Mc/Me mark classes get no
    * special treatment): a NON_SPACING_MARK counts as word-side iff
    * walking back over the mark run reaches `Character.isLetterOrDigit`
    * (note: NOT '_'). */
  private def hasBase(s: String, from: Int): Boolean = {
    var j = from
    while (j > 0) {
      val cp = s.codePointBefore(j)
      if (Character.isLetterOrDigit(cp)) return true
      if (Character.getType(cp) != Character.NON_SPACING_MARK) return false
      j -= Character.charCount(cp)
    }
    false
  }

  /** `\b` before position i (i is the match start; its char is a word
    * char in all three patterns, so the boundary is "start or
    * non-word-side before"). Surrogate pairs decode to one code point,
    * like the regex engine. */
  private def boundaryBefore(s: String, i: Int): Boolean = {
    if (i == 0) return true
    val cp = s.codePointBefore(i)
    if (isWordCp(cp)) false
    else if (Character.getType(cp) == Character.NON_SPACING_MARK)
      !hasBase(s, i - Character.charCount(cp))
    else true
  }

  /** `\b` after exclusive end e (last matched char is a word char). */
  private def boundaryAfter(s: String, e: Int): Boolean = {
    if (e >= s.length) return true
    val cp = s.codePointAt(e)
    if (isWordCp(cp)) false
    else if (Character.getType(cp) == Character.NON_SPACING_MARK)
      !hasBase(s, e)
    else true
  }

  /** Next UUID match at-or-after `from`, packed (start << 32 | end) or -1.
    * Shape: 8-4-4-4-12 lowercase hex, dashes at offsets 8/13/18/23,
    * `\b`-anchored both sides. */
  private def findUuid(s: String, from: Int): Long = {
    val n = s.length
    var i = from
    while (i + 36 <= n) {
      if (isHex(s.charAt(i)) && boundaryBefore(s, i) &&
          s.charAt(i + 8) == '-' && s.charAt(i + 13) == '-' &&
          s.charAt(i + 18) == '-' && s.charAt(i + 23) == '-' &&
          boundaryAfter(s, i + 36) && uuidHexRuns(s, i))
        return (i.toLong << 32) | (i + 36).toLong
      i += 1
    }
    -1L
  }

  private def uuidHexRuns(s: String, i: Int): Boolean = {
    var p = i + 1
    while (p < i + 8) { if (!isHex(s.charAt(p))) return false; p += 1 }
    p = i + 9
    while (p < i + 13) { if (!isHex(s.charAt(p))) return false; p += 1 }
    p = i + 14
    while (p < i + 18) { if (!isHex(s.charAt(p))) return false; p += 1 }
    p = i + 19
    while (p < i + 23) { if (!isHex(s.charAt(p))) return false; p += 1 }
    p = i + 24
    while (p < i + 36) { if (!isHex(s.charAt(p))) return false; p += 1 }
    true
  }

  /** Next IPv4 match: four 1-3 digit runs joined by '.', `\b` both sides.
    * The greedy `\d{1,3}` semantics collapse to: each run's FULL length
    * must be 1-3 (a longer run leaves a digit after every backtrack, which
    * can never satisfy the following '.' or `\b`). */
  private def findIpv4(s: String, from: Int): Long = {
    val n = s.length
    var i = from
    while (i + 7 <= n) { // minimal form d.d.d.d
      if (isDigit(s.charAt(i)) && boundaryBefore(s, i)) {
        var p = i
        var g = 0
        var ok = true
        while (ok && g < 4) {
          val runStart = p
          while (p < n && isDigit(s.charAt(p))) p += 1
          val len = p - runStart
          if (len < 1 || len > 3) ok = false
          else if (g < 3) {
            if (p < n && s.charAt(p) == '.') p += 1 else ok = false
          }
          g += 1
        }
        if (ok && boundaryAfter(s, p))
          return (i.toLong << 32) | p.toLong
      }
      i += 1
    }
    -1L
  }

  /** Next `\b\d+\b` match: a maximal digit run with non-word on both
    * sides (any backtracked shorter run ends digit-before-digit — never a
    * boundary). */
  private def findInt(s: String, from: Int): Long = {
    val n = s.length
    var i = from
    while (i < n) {
      if (isDigit(s.charAt(i)) && boundaryBefore(s, i)) {
        var p = i + 1
        while (p < n && isDigit(s.charAt(p))) p += 1
        if (boundaryAfter(s, p)) return (i.toLong << 32) | p.toLong
        i = p // run rejected as a whole; no start inside it can have \b
      } else i += 1
    }
    -1L
  }

  private def replaceAll(s: String, find: (String, Int) => Long): String = {
    var m = find(s, 0)
    if (m < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (m >= 0) {
      val start = (m >>> 32).toInt
      val end = (m & 0xffffffffL).toInt
      sb.append(s, pos, start).append('*')
      pos = end
      m = find(s, end)
    }
    sb.append(s, pos, s.length).toString
  }

  /** UUID→IPv4→int masking on a String — byte-identical to the
    * three-pass `regexp_replace` pipeline. */
  def extractString(text: String): String =
    replaceAll(replaceAll(replaceAll(text, findUuid), findIpv4), findInt)

  /** Static kernel reachable from generated Java code. */
  def extract(input: UTF8String): UTF8String = {
    val s = input.toString
    val out = extractString(s)
    if (out eq s) input else UTF8String.fromString(out)
  }
}
