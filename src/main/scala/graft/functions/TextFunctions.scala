package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text operators of the VIA surface plus training-data-pipeline text
  * analysis, all expressed as codegen'd built-in `Column` expressions (no
  * UDFs in the hot path — these stay inside WholeStageCodegen and push down
  * to the scan where possible).
  *
  * Reference semantics:
  *  - template extraction: `/root/reference/app/services/ingestion_service.py:16-21`
  *    (mask UUIDs, IPv4s, then all integers with `*`)
  *  - rhythm hash: `/root/reference/app/services/ingestion_service.py:23-28`
  *    (`sha256(template)[:16] + ":" + sha256(service + ":" + severity)[:16]`)
  */
object TextFunctions {

  /** UUID literal — EXACTLY the reference's regex (`ingestion_service.py:18`):
    * lowercase hex only, `\b`-anchored (an uppercase UUID or a UUID-shaped
    * substring inside a longer token is NOT masked, so templates — and
    * therefore rhythm hashes — match the reference byte-for-byte). */
  val UuidRe = "\\b[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\\b"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val IntRe = "\\b\\d+\\b"

  /** P1 — log de-parameterization: UUIDs, IPs, integers → `*`. Served by
    * the native [[TemplateExpr]] kernel — byte-identical to
    * [[templateRegex]] (TemplateKernelSpec fuzz proof); the gate row's
    * DuckDB RE2 oracle stays the cross-engine check. Runs per event on
    * the always-on ingest path, so the kernel's ~6× matters there most. */
  def template(body: Column): Column =
    graft.GraftFunctions.columnOf(
      TemplateExpr(graft.GraftFunctions.exprOf(body)))

  /** The built-in three-pass form of [[template]] — kept as the
    * java.util.regex reference surface the kernel is parity-tested
    * against (and for plans that want the pre-kernel shape). */
  def templateRegex(body: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(body, UuidRe, "*"),
        Ipv4Re, "*"),
      IntRe, "*")

  /** P2 — rhythm hash: template identity x (service, severity) identity. */
  def rhythmHash(template: Column, service: Column, severity: Column): Column =
    concat(
      substring(sha2(template, 256), 1, 16),
      lit(":"),
      substring(sha2(concat_ws(":", service, severity), 256), 1, 16))

  /** Single-key JSON extraction — byte-identical to
    * `get_json_object(c, "$." + key)` for simple keys, as a native
    * single-pass kernel ([[JsonGetExpr]]; JsonGetKernelSpec parity-fuzzed). */
  def jsonGet(c: Column, key: String): Column =
    graft.GraftFunctions.columnOf(
      JsonGetExpr(graft.GraftFunctions.exprOf(c), key))

  /** Word tokens: lowercase, split on non-alphanumerics, drop empties.
    * Mirrors Qdrant's word tokenizer + lowercase text index
    * (`/root/reference/app/services/qdrant_service.py:95`). Native one-pass
    * kernel (the `filter(split(...))` HOF form evaluates its lambda
    * interpreted per element — identical values, ~10× the cost). */
  def wordTokens(text: Column): Column =
    graft.GraftFunctions.columnOf(
      WordTokens(graft.GraftFunctions.exprOf(text)))

  /** Count of tokens present in a fixed word set (with multiplicity) —
    * native form of `size(filter(toks, t.isin(words)))`. */
  def countInSet(tokens: Column, words: Seq[String]): Column =
    graft.GraftFunctions.columnOf(
      CountInSet(graft.GraftFunctions.exprOf(tokens), words))

  /** P7 — full-text match: ALL query tokens present in the word-token
    * set. Native early-exit kernel ([[ContainsAllTokens]]) — same value
    * as an `array_contains(wordTokens(text), t)` conjunct per token,
    * without materializing the token array or re-walking it per term. */
  def matchText(text: Column, query: String): Column = {
    val qTokens = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    // zero query terms match EVERYTHING, including NULL text — the
    // pre-kernel `lit(true)` semantics (ContainsAllTokens null-propagates,
    // which would silently turn the vacuous match into a dropped row)
    if (qTokens.isEmpty) lit(true)
    else graft.GraftFunctions.columnOf(ContainsAllTokens(
      graft.GraftFunctions.exprOf(text),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(qTokens)))
  }

  /** Whitespace token count (training-pipeline token counting) — native
    * count-only kernel, value-identical to
    * `size(filter(split(text, "\\s+"), len > 0))` (TokenCountKernelSpec). */
  def tokenCountWs(text: Column): Column =
    graft.GraftFunctions.columnOf(
      CountWsTokens(graft.GraftFunctions.exprOf(text)))

  /** BPE-ish subword count over ALREADY-LOWERCASED text — native
    * count-only kernel, value-identical to
    * `size(regexp_extract_all(lowered, "[a-z]{1,4}|[0-9]+|[^a-z0-9\\s]+"))`. */
  def tokenCountSub(lowered: Column): Column =
    graft.GraftFunctions.columnOf(
      CountSubTokens(graft.GraftFunctions.exprOf(lowered)))

  /** BPE-ish subword-regex token count: word pieces of <=4 chars, digits,
    * punctuation runs — a deterministic stand-in for a real tokenizer's
    * token count, computable at scan speed. */
  def tokenCountBpe(text: Column): Column =
    size(filter(split(lower(text), "((?<=[a-z]{4})(?=[a-z])|[^a-z0-9]+)"),
      t => length(t) > 0))

  /** Quality score in [0,1]: mix of length, punctuation ratio, stopword
    * ratio, mean word length (training-pipeline quality scoring).
    * Token/stopword counts through the fused one-pass [[TokenStats]]
    * kernel (no token array; TokenStatsKernelSpec parity) — the score
    * arithmetic itself is unchanged Catalyst doubles. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val stats = graft.GraftFunctions.columnOf(
      TokenStats(graft.GraftFunctions.exprOf(text), Stopwords))
    val nToks = greatest(stats.getField("n_toks").cast("double"), lit(1.0))
    val nStop = stats.getField("n_stop").cast("double")
    // count-only kernel for the punctuation ratio (ArrayStatKernelSpec):
    // the built-in form materialized a stripped copy of the text per row
    val punct = graft.GraftFunctions.columnOf(
      CountPunctChars(graft.GraftFunctions.exprOf(text))).cast("double")
    val lenScore = least(nChars / lit(500.0), lit(1.0))
    val stopScore = least(nStop / nToks * lit(3.0), lit(1.0))
    val punctPenalty = least(punct / greatest(nChars, lit(1.0)) * lit(5.0), lit(1.0))
    round(lenScore * lit(0.4) + stopScore * lit(0.4) + (lit(1.0) - punctPenalty) * lit(0.2), 6)
  }

  /** English-ish stopwords used by qualityScore/langId (fixed, documented). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "this", "that", "be")

  /** Document fingerprint: md5 of the lowercased text with all
    * non-alphanumerics removed — content-defined exact-dup identity that is
    * robust to whitespace/punctuation-only edits. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** Character k-shingles of the normalized text, as a distinct array. */
  def shingles(text: Column, k: Int): Column = {
    val norm = regexp_replace(lower(text), "\\s+", " ")
    array_distinct(
      filter(
        transform(sequence(lit(1), greatest(length(norm) - (k - 1), lit(0))),
          i => norm.substr(i, lit(k))),
        s => length(s) === k))
  }
}
