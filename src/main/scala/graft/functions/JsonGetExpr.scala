package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.util.control.NoStackTrace

/** Native single-key JSON extraction — the kernel form of
  * `get_json_object(col, "$.key")`, in the [[PiiScrubExpr]] mold.
  *
  * Why it exists: the sf1 bench put `json_filter` at ~36x DuckDB (7.1 s vs
  * 0.2 s) — the worst honest per-row-kernel flag in SCALE.md's class 3.
  * Measurement there showed the gap is JVM JSON-parse throughput, not API
  * choice (get_json_object / from_json / variant_get all within 10%): every
  * one tokenizes the full document through a general streaming parser. The
  * engine's dominant JSON shape is the reference's payload probe — ONE
  * top-level key out of a small object (`$.k` over `props`,
  * `/root/reference/app/services/forensic_analysis_service.py:45-62` groups
  * by a payload field exactly this way) — which a specialized single-pass
  * scanner serves with no token objects, no field-name hashing, and zero
  * allocation until the match is found.
  *
  * Semantics are BYTE-IDENTICAL to `get_json_object(col, "$.key")` for
  * simple `[A-Za-z0-9_]+` keys — JsonGetKernelSpec proves it on a pinned
  * edge-case table plus a 25k-case random fuzz against the built-in
  * expression itself. The quirks this kernel reproduces (all measured
  * against Spark 4.1.2, which evaluates through Jackson with
  * `ALLOW_SINGLE_QUOTES` + `ALLOW_UNESCAPED_CONTROL_CHARS`):
  *
  *  - root must be an object; anything else → NULL; trailing garbage AFTER
  *    the closing root brace is ignored, but the whole root object is
  *    validated (a malformed sibling value anywhere → NULL);
  *  - the first match whose value is not literal `null` wins; null-valued
  *    matches are transparent (`{"k":null,"k":7}` → 7, `{"k":null}` → NULL);
  *  - string values are returned UNESCAPED; single-quoted strings are
  *    accepted; `\'` and `\"` are accepted in either quote style; raw
  *    control characters inside strings are accepted; a TOP-LEVEL captured
  *    string whose `\u` escapes produce a mispaired surrogate → NULL (the
  *    built-in fails UTF-8-encoding its output there; mispaired surrogates
  *    in skipped values, names, or nested captures are fine — nested
  *    writes escape them);
  *  - float values (any '.' or exponent) are re-rendered via
  *    `Double.toString` (`1.5e3` → `1500.0`, `1e21` → `1.0E21`); overflow
  *    renders as a QUOTED `"Infinity"`/`"-Infinity"`; integer values are
  *    returned verbatim (arbitrary precision) except `-0` → `0`;
  *  - object/array values are re-serialized compactly; nested strings are
  *    re-escaped (short escapes for \b \t \n \f \r, `\u00XX` UPPERCASE hex
  *    for other control chars, surrogate halves always escaped as `\uXXXX`
  *    uppercase, all other chars raw); nested floats re-render like
  *    top-level ones;
  *  - Jackson's stream constraints are enforced: nesting depth > 1000 →
  *    NULL, number literals > 1000 chars → NULL.
  *
  * Scale shape: one virtual call per row inside WholeStageCodegen; the
  * filter/projection around it pushes to the scan unchanged. Only the
  * per-row constant factor drops — measured 4-6x on the sf1 events table.
  */
case class JsonGetExpr(child: Expression, key: String) extends UnaryExpression {
  require(key.nonEmpty && key.forall(c =>
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'),
    s"json_get key must be a simple [A-Za-z0-9_]+ name, got '$key'")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"json_get requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_get"

  override protected def nullSafeEval(input: Any): Any =
    JsonGet.get(input.asInstanceOf[UTF8String], key)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("jsonGetKey", key, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JsonGet.get($c, $keyRef);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): JsonGetExpr =
    copy(child = newChild)
}

object JsonGet {

  /** Control-flow signal for any malformed input; preallocated, no stack. */
  private object Bad extends RuntimeException with NoStackTrace

  /** Jackson StreamReadConstraints defaults (measured: depth 1000 parses,
    * 1002 → NULL; 999-digit number parses, 1001 → NULL). */
  private val MaxDepth = 1000
  private val MaxNumLen = 1000

  /** Static kernel reachable from generated Java code. */
  def get(input: UTF8String, key: String): UTF8String = {
    val out = getString(input.toString, key)
    if (out == null) null else UTF8String.fromString(out)
  }

  /** `get_json_object(s, "$." + key)` on a String; null on no-match or any
    * malformed document. */
  def getString(s: String, key: String): String =
    try new Scanner(s, key).run()
    catch { case Bad => null }

  // string-parse modes
  private final val MSkip = 0    // validate only
  private final val MEmit = 1    // re-escape compactly into out
  private final val MCapture = 2 // unescape into out (top-level string value)
  private final val MCompare = 3 // validate + compare against `key`

  private final class Scanner(s: String, key: String) {
    private[this] val n = s.length
    private[this] var i = 0
    private[this] var depth = 0
    private[this] var out: java.lang.StringBuilder = null
    private[this] var matched = false

    def run(): String = {
      skipWs()
      if (i >= n || s.charAt(i) != '{') return null // $.key needs an object root
      parseObject(root = true, emit = false)
      // anything after the root object is ignored (measured)
      if (matched) out.toString else null
    }

    @inline private[this] def cur(): Char = {
      if (i >= n) throw Bad
      s.charAt(i)
    }

    @inline private[this] def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
    @inline private[this] def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r'

    private[this] def skipWs(): Unit = {
      while (i < n && isWs(s.charAt(i))) i += 1
    }

    private[this] def hex(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else throw Bad

    /** Cursor on '{'. At the root, field names are compared against `key`
      * and the first non-null-valued match is captured. */
    private[this] def parseObject(root: Boolean, emit: Boolean): Unit = {
      depth += 1
      if (depth > MaxDepth) throw Bad
      i += 1
      if (emit) out.append('{')
      skipWs()
      if (cur() == '}') {
        i += 1; if (emit) out.append('}'); depth -= 1; return
      }
      var first = true
      while (true) {
        if (!first && emit) out.append(',')
        first = false
        skipWs()
        val nameMode = if (root) MCompare else if (emit) MEmit else MSkip
        val isMatch = parseString(nameMode)
        skipWs()
        if (cur() != ':') throw Bad
        i += 1
        if (emit) out.append(':')
        skipWs()
        if (root && isMatch && !matched) parseCaptured()
        else parseValue(emit)
        skipWs()
        val c = cur()
        if (c == ',') i += 1
        else if (c == '}') {
          i += 1; if (emit) out.append('}'); depth -= 1; return
        } else throw Bad
      }
    }

    private[this] def parseArray(emit: Boolean): Unit = {
      depth += 1
      if (depth > MaxDepth) throw Bad
      i += 1
      if (emit) out.append('[')
      skipWs()
      if (cur() == ']') {
        i += 1; if (emit) out.append(']'); depth -= 1; return
      }
      var first = true
      while (true) {
        if (!first && emit) out.append(',')
        first = false
        skipWs()
        parseValue(emit)
        skipWs()
        val c = cur()
        if (c == ',') i += 1
        else if (c == ']') {
          i += 1; if (emit) out.append(']'); depth -= 1; return
        } else throw Bad
      }
    }

    private[this] def parseValue(emit: Boolean): Unit = cur() match {
      case '"' | '\'' => parseString(if (emit) MEmit else MSkip)
      case '{' => parseObject(root = false, emit = emit)
      case '[' => parseArray(emit)
      case 't' => literal("true", emit)
      case 'f' => literal("false", emit)
      case 'n' => literal("null", emit)
      case c if c == '-' || isDigit(c) => parseNumber(if (emit) MEmit else MSkip)
      case _ => throw Bad
    }

    /** The root-match value. Literal `null` leaves `matched` unset so a
      * later duplicate key can still capture (measured first-non-null-wins
      * semantics). */
    private[this] def parseCaptured(): Unit = cur() match {
      case '"' | '\'' =>
        out = new java.lang.StringBuilder; matched = true
        parseString(MCapture)
      case '{' =>
        out = new java.lang.StringBuilder; matched = true
        parseObject(root = false, emit = true)
      case '[' =>
        out = new java.lang.StringBuilder; matched = true
        parseArray(emit = true)
      case 't' =>
        out = new java.lang.StringBuilder; matched = true; literal("true", emit = true)
      case 'f' =>
        out = new java.lang.StringBuilder; matched = true; literal("false", emit = true)
      case 'n' =>
        literal("null", emit = false) // validated, not a match
      case c if c == '-' || isDigit(c) =>
        parseNumber(MCapture)
      case _ => throw Bad
    }

    private[this] def literal(txt: String, emit: Boolean): Unit = {
      if (!s.regionMatches(i, txt, 0, txt.length)) throw Bad
      i += txt.length
      if (i < n) {
        val t = s.charAt(i)
        if (!(isWs(t) || t == ',' || t == '}' || t == ']')) throw Bad
      }
      if (emit) out.append(txt)
    }

    /** Strings in any of the four modes; returns whether the unescaped
      * content equals `key` (meaningful only for MCompare). */
    private[this] def parseString(mode: Int): Boolean = {
      val q = cur()
      if (q != '"' && q != '\'') throw Bad
      i += 1
      if (mode == MEmit) out.append('"')
      var kIdx = 0 // -1 once mismatched
      var pendingHigh = false // MCapture surrogate-pairing state
      while (true) {
        if (i >= n) throw Bad
        val c = s.charAt(i)
        if (c == q) {
          if (pendingHigh) throw Bad // unpaired high surrogate at end
          i += 1
          if (mode == MEmit) out.append('"')
          return kIdx == key.length
        }
        var produced = c
        if (c == '\\') {
          i += 1
          val e = cur()
          i += 1
          e match {
            case '"' => produced = '"'
            case '\'' => produced = '\'' // accepted in either quote style (measured)
            case '\\' => produced = '\\'
            case '/' => produced = '/'
            case 'b' => produced = '\b'
            case 'f' => produced = '\f'
            case 'n' => produced = '\n'
            case 'r' => produced = '\r'
            case 't' => produced = '\t'
            case 'u' =>
              if (i + 4 > n) throw Bad
              produced = ((hex(s.charAt(i)) << 12) | (hex(s.charAt(i + 1)) << 8) |
                (hex(s.charAt(i + 2)) << 4) | hex(s.charAt(i + 3))).toChar
              i += 4
            case _ => throw Bad
          }
        } else {
          i += 1 // raw char, including unescaped control chars (allowed)
        }
        mode match {
          case MEmit => emitEscaped(produced)
          case MCapture =>
            // the built-in UTF-8-encodes its top-level output; a mispaired
            // surrogate fails that encode → whole result NULL (measured)
            if (produced >= 0xD800 && produced <= 0xDBFF) {
              if (pendingHigh) throw Bad
              pendingHigh = true
            } else if (produced >= 0xDC00 && produced <= 0xDFFF) {
              if (!pendingHigh) throw Bad
              pendingHigh = false
            } else if (pendingHigh) throw Bad
            out.append(produced)
          case MCompare =>
            if (kIdx >= 0 && kIdx < key.length && key.charAt(kIdx) == produced) kIdx += 1
            else kIdx = -1
          case _ => ()
        }
      }
      false // unreachable
    }

    private[this] val HexU = "0123456789ABCDEF"

    /** Jackson generator escaping (measured): quote, backslash, control
      * chars, and surrogate halves; everything else raw. */
    private[this] def emitEscaped(c: Char): Unit = {
      if (c == '"') out.append("\\\"")
      else if (c == '\\') out.append("\\\\")
      else if (c < 0x20) c match {
        case '\b' => out.append("\\b")
        case '\t' => out.append("\\t")
        case '\n' => out.append("\\n")
        case '\f' => out.append("\\f")
        case '\r' => out.append("\\r")
        case _ =>
          out.append("\\u00").append(HexU.charAt((c >> 4) & 0xF))
            .append(HexU.charAt(c & 0xF))
      }
      else if (c >= 0xD800 && c <= 0xDFFF) {
        out.append("\\u").append(HexU.charAt((c >> 12) & 0xF))
          .append(HexU.charAt((c >> 8) & 0xF))
          .append(HexU.charAt((c >> 4) & 0xF))
          .append(HexU.charAt(c & 0xF))
      }
      else out.append(c)
    }

    /** JSON number; canonical re-render in MEmit/MCapture (Jackson: floats
      * through Double.toString, ints verbatim, `-0` → `0`). */
    private[this] def parseNumber(mode: Int): Unit = {
      val start = i
      if (cur() == '-') i += 1
      val c = cur()
      if (c == '0') i += 1
      else if (c >= '1' && c <= '9') {
        i += 1
        while (i < n && isDigit(s.charAt(i))) i += 1
      } else throw Bad
      var isFloat = false
      if (i < n && s.charAt(i) == '.') {
        isFloat = true
        i += 1
        if (i >= n || !isDigit(s.charAt(i))) throw Bad
        while (i < n && isDigit(s.charAt(i))) i += 1
      }
      if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        isFloat = true
        i += 1
        if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (i >= n || !isDigit(s.charAt(i))) throw Bad
        while (i < n && isDigit(s.charAt(i))) i += 1
      }
      if (i - start > MaxNumLen) throw Bad
      if (i < n) {
        val t = s.charAt(i)
        if (!(isWs(t) || t == ',' || t == '}' || t == ']')) throw Bad
      }
      if (mode != MSkip) {
        if (mode == MCapture) {
          out = new java.lang.StringBuilder; matched = true
        }
        val txt = s.substring(start, i)
        if (isFloat) {
          val d = java.lang.Double.parseDouble(txt)
          if (java.lang.Double.isInfinite(d))
            out.append('"').append(if (d > 0) "Infinity" else "-Infinity").append('"')
          else out.append(java.lang.Double.toString(d))
        } else {
          if (txt == "-0") out.append('0') else out.append(txt)
        }
      }
    }
  }
}
