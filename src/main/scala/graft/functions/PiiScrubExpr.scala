package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass PII scrub — the production form of the
  * `pii_scrub` double `regexp_replace` ([[graft.queries.TextOps.EmailRe]]
  * then [[graft.queries.TextOps.PhoneRe]]), as a codegen'd kernel in the
  * [[Simhash64]] mold.
  *
  * Why it exists: the sf1 bench put the regex pair at ~15× DuckDB
  * (java.util.regex backtracking vs RE2), and a 100 TB pre-training
  * scrub is regex-BOUND — the masking pass touches every byte of the
  * corpus. The two patterns are simple enough to scan without a regex
  * engine: this kernel hand-implements java.util.regex's exact
  * leftmost-greedy, non-overlapping semantics for BOTH patterns
  * (including `[a-zA-Z0-9.-]+` backtracking to the rightmost viable dot
  * and the greedy `{3,4}` middle phone group), so output is
  * byte-identical to the built-in pipeline — PiiScrubKernelSpec proves
  * it on adversarial fixtures plus a 20k-case random fuzz against
  * java.util.regex itself. The `pii_scrub` GATE row stays on the
  * built-ins (its oracle mirrors them in RE2); `api/Curation.curate`
  * uses this kernel as its masking stage.
  *
  * Scale shape: one virtual call per row inside WholeStageCodegen, three
  * linear char scans (email spans, email rewrite, phone rewrite), zero
  * allocation when the row contains no PII (the common case returns the
  * input buffer untouched). */
case class PiiScrubExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_scrub requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "pii_scrub_kernel"

  override protected def nullSafeEval(input: Any): Any =
    PiiScrub.scrub(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScrub.scrub($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiScrubExpr =
    copy(child = newChild)
}

object PiiScrub {

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isLocal(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  @inline private def isDomain(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'
  @inline private def isSep(c: Char): Boolean = c == '-' || c == '.'

  /** Next email match at-or-after `from`, packed (start << 32 | end), or
    * -1. Semantics == java.util.regex find() of
    * `[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}`:
    *  - the local `+` is effectively possessive here ('@' is not a local
    *    char, so no shorter prefix can reach it): a start position
    *    matches iff its maximal local run ends at '@';
    *  - the domain `+` backtracks longest-first, i.e. the match uses the
    *    RIGHTMOST dot with ≥2 letters after it; the TLD `{2,}` is
    *    greedy (maximal letter run). */
  private def findEmail(s: String, from: Int): Long = {
    val n = s.length
    var i = from
    while (i < n) {
      if (!isLocal(s.charAt(i))) i += 1
      else {
        var j = i
        while (j < n && isLocal(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == '@') {
          var kEnd = j + 1
          while (kEnd < n && isDomain(s.charAt(kEnd))) kEnd += 1
          var end = -1
          // rightmost dot leaving >=1 domain char before it (p >= j+2)
          var p = kEnd - 1
          while (p >= j + 2 && end < 0) {
            if (s.charAt(p) == '.') {
              var q = p + 1
              while (q < n && isAlpha(s.charAt(q))) q += 1
              if (q - p - 1 >= 2) end = q
            }
            p -= 1
          }
          if (end > 0) return (i.toLong << 32) | end.toLong
          i = j + 1 // no viable domain on this '@': every start up to and
                    // including '@' fails the same way
        } else i = j // local run not followed by '@': starts inside it
                     // all die at the same terminator
      }
    }
    -1L
  }

  /** Next phone match at-or-after `from`, packed like [[findEmail]].
    * Semantics == find() of `\d{3}[-.]\d{3,4}[-.]\d{4}` — the `{3,4}`
    * middle group is greedy (4 digits tried before 3). */
  private def findPhone(s: String, from: Int): Long = {
    val n = s.length
    var i = from
    while (i + 12 <= n) {
      if (isDigit(s.charAt(i)) && isDigit(s.charAt(i + 1)) &&
          isDigit(s.charAt(i + 2)) && isSep(s.charAt(i + 3))) {
        // greedy middle: 4 digits first
        if (i + 13 <= n &&
            isDigit(s.charAt(i + 4)) && isDigit(s.charAt(i + 5)) &&
            isDigit(s.charAt(i + 6)) && isDigit(s.charAt(i + 7)) &&
            isSep(s.charAt(i + 8)) &&
            isDigit(s.charAt(i + 9)) && isDigit(s.charAt(i + 10)) &&
            isDigit(s.charAt(i + 11)) && isDigit(s.charAt(i + 12)))
          return (i.toLong << 32) | (i + 13).toLong
        if (isDigit(s.charAt(i + 4)) && isDigit(s.charAt(i + 5)) &&
            isDigit(s.charAt(i + 6)) && isSep(s.charAt(i + 7)) &&
            isDigit(s.charAt(i + 8)) && isDigit(s.charAt(i + 9)) &&
            isDigit(s.charAt(i + 10)) && isDigit(s.charAt(i + 11)))
          return (i.toLong << 32) | (i + 12).toLong
      }
      i += 1
    }
    -1L
  }

  private def replaceAll(s: String,
      find: (String, Int) => Long, placeholder: String): String = {
    var m = find(s, 0)
    if (m < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var pos = 0
    while (m >= 0) {
      val start = (m >>> 32).toInt
      val end = (m & 0xffffffffL).toInt
      sb.append(s, pos, start).append(placeholder)
      pos = end
      m = find(s, end)
    }
    sb.append(s, pos, s.length).toString
  }

  private def countAll(s: String, find: (String, Int) => Long): Long = {
    var c = 0L
    var m = find(s, 0)
    while (m >= 0) { c += 1; m = find(s, (m & 0xffffffffL).toInt) }
    c
  }

  /** Email-then-phone masking on a String — byte-identical to
    * `regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe,
    * "<PHONE>")`. */
  def scrubString(text: String): String =
    replaceAll(replaceAll(text, findEmail, "<EMAIL>"), findPhone, "<PHONE>")

  /** Static kernel reachable from generated Java code. */
  def scrub(input: UTF8String): UTF8String = {
    val s = input.toString
    val out = scrubString(s)
    if (out eq s) input else UTF8String.fromString(out)
  }

  /** Match counts on the ORIGINAL text (the `pii_scrub` gate row's
    * n_email/n_phone semantics) — spec-side verification surface. */
  def countEmails(text: String): Long = countAll(text, findEmail)
  def countPhones(text: String): Long = countAll(text, findPhone)

  /** UTF8String forms reachable from generated Java code
    * ([[PiiCountExpr]]). */
  def countEmailsU(input: UTF8String): Long = countEmails(input.toString)
  def countPhonesU(input: UTF8String): Long = countPhones(input.toString)
}

/** Count of email (or phone) matches — the kernel form of
  * `size(regexp_extract_all(text, EmailRe|PhoneRe))`, sharing
  * [[PiiScrub]]'s parity-proven finders; backs the `pii_scrub_kernel`
  * gate row's evidence columns. */
case class PiiCountExpr(child: Expression, emails: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pii_count requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String =
    if (emails) "pii_count_emails" else "pii_count_phones"

  override protected def nullSafeEval(input: Any): Any =
    if (emails) PiiScrub.countEmailsU(input.asInstanceOf[UTF8String])
    else PiiScrub.countPhonesU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (emails) "countEmailsU" else "countPhonesU"
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiScrub.$m($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PiiCountExpr =
    copy(child = newChild)
}
