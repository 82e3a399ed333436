package graft.queries

import graft.GraftFunctions.{columnOf, exprOf}
import graft.Tables
import graft.functions.{CountInSet, WordTokens}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators over `documents`: duplicated-substring span
  * detection (the suffix-dedup family) and the published statistical
  * quality-rule battery — the two passes a training-data pipeline runs
  * between exact/near dedup and tokenization.
  */
object CorpusOps {

  def queries: Seq[QueryDef] = Seq(dupSpans, dropSpans, gopherQuality, chunkDocs)

  // ----------------------------------------------------------------------
  // dup_spans
  // ----------------------------------------------------------------------

  /** Duplicated-window width in tokens. Published substring-dedup uses a
    * 50-token threshold on web corpora; 8 here because the synthetic docs
    * are tens of tokens long. */
  val SpanW = 8

  /** Substring-level duplication: maximal per-document spans every one of
    * whose [[SpanW]]-token windows also appears in ANOTHER document.
    * Detection half of suffix-array substring dedup, re-expressed
    * relationally: positional windows → corpus census of windows seen in
    * >1 distinct doc → gaps-and-islands merge of adjacent duplicated
    * start positions (`pos − row_number()` constant within a run), so a
    * run of duplicated windows reports once as `[span_start,
    * span_start+span_len)`.
    *
    * Scale shape: both heavy steps — the census group-by and the
    * membership join — key on a 128-bit window FINGERPRINT (two
    * independently-seeded xxhash64 legs, computed scan-side in codegen),
    * never the window text itself: the shuffle payload is 16 bytes per
    * window instead of the ~60-byte 8-token string, one Exchange
    * partitioning serves both sides, and nothing ever pairs documents.
    * The island merge shuffles only the (doc, pos) survivors on doc_id.
    * 2^128 key space makes a census collision (two distinct grams fusing)
    * vanishingly unlikely at any corpus size; the oracle groups on the
    * raw string, so the gate also proves the fingerprint keying changes
    * no result. */
  /** (doc_id, ts) with the tokenized text — shared scan shape. */
  private def tokenized(df: org.apache.spark.sql.DataFrame) =
    df.select(df("doc_id"), columnOf(WordTokens(exprOf(df("text")))).as("ts"))

  /** Positional [[SpanW]]-token windows: (doc_id, pos [1-based], gram) —
    * one native [[graft.functions.AllWordNgrams]] pass per document (the
    * interpreted transform/slice/array_join HOF chain dominated the
    * profile); documents shorter than the window emit nothing. */
  private def windows(docs: org.apache.spark.sql.DataFrame) =
    docs.select(docs("doc_id"), posexplode(columnOf(
        graft.functions.AllWordNgrams(exprOf(docs("text")), SpanW))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gram"))

  /** Positional windows keyed by the 128-bit fingerprint (h1, h2): the
    * gram string is hashed scan-side and DROPPED before any exchange. */
  private def windowFps(docs: org.apache.spark.sql.DataFrame) =
    windows(docs).select(col("doc_id"), col("pos"),
      xxhash64(col("gram")).as("h1"),
      xxhash64(lit("spanfp:"), col("gram")).as("h2"))

  private val dupSpans = QueryDef(
    "dup_spans",
    (s, dir) => {
      import s.implicits._
      val wins = windowFps(Tables.documents(s, dir))
      // "seen in >1 distinct doc" ⟺ min(doc) ≠ max(doc): O(1) aggregate
      // state with full map-side combine, where an exact distinct-count
      // would shuffle doc ids per gram
      val dupGrams = wins.groupBy($"h1", $"h2")
        .agg((min($"doc_id") =!= max($"doc_id")).as("multi"))
        .filter($"multi")
        .select($"h1", $"h2")
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
      wins.join(dupGrams, Seq("h1", "h2"))
        .withColumn("island", $"pos" - row_number().over(w))
        .groupBy($"doc_id", $"island")
        .agg(min($"pos").cast("long").as("span_start"),
          (max($"pos") - min($"pos") + SpanW).cast("long").as("span_len"))
        .select($"doc_id", $"span_start", $"span_len")
        .orderBy($"doc_id", $"span_start")
    },
    Some {
      val g = (0 until SpanW).map(j => s"ts[i+$j]").mkString(" || ' ' || ")
      s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS ts
        FROM documents),
      wins AS (
        SELECT doc_id, i AS pos, $g AS gram
        FROM toks, unnest(range(1, greatest(len(ts) - ${SpanW - 2}, 1))) AS u(i)),
      dupg AS (
        SELECT gram FROM wins GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
      duppos AS (
        SELECT w.doc_id, w.pos,
          w.pos - row_number() OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS island
        FROM wins w JOIN dupg USING (gram))
      SELECT doc_id, min(pos) AS span_start,
        CAST(max(pos) - min(pos) + $SpanW AS BIGINT) AS span_len
      FROM duppos GROUP BY doc_id, island
      ORDER BY doc_id, span_start
    """
    })

  // ----------------------------------------------------------------------
  // drop_spans
  // ----------------------------------------------------------------------

  /** The removal half of substring dedup: every duplicated [[SpanW]]-token
    * window occurrence is deleted from its document EXCEPT the global
    * first occurrence (owner = lexicographic min (doc_id, pos), encoded
    * as `doc_id·10^6 + pos` because the DuckDB oracle's `arg_min` takes
    * no struct key; the encoding is exact while docs stay under 10^6
    * tokens — at warehouse scale the owner key is the struct `min_by`).
    * Output is the rewritten token stream per document — the transform
    * the `dup_spans` detector feeds in the published substring-dedup
    * recipe (dedup once globally, keep one copy of every boilerplate
    * run).
    *
    * Scale shape: census and ownership ride the SAME gram-keyed aggregate
    * as `dup_spans` (the multi-doc flag and min-owner in one pass, both
    * O(1) state with map-side combine); the only new
    * shuffle is the per-doc removal-set aggregate, whose size is bounded
    * by document length. The rewrite itself is scan-parallel list
    * arithmetic — no sort, no window. */
  /** (doc_id, clean_text, n_kept) — the rewrite of `drop_spans`, reused
    * by [[graft.api.Curation]]'s substring-dedup stage. */
  def dropSpanRewrite(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    val toks = tokenized(docs)
    val wins = windowFps(docs)
    val dup = wins.groupBy($"h1", $"h2")
      .agg((min($"doc_id") =!= max($"doc_id")).as("multi"),
        min($"doc_id" * 1000000L + $"pos").as("owner"))
      .filter($"multi")
      .select($"h1", $"h2", $"owner")
    // shuffle removed-window STARTS only — the ×SpanW token-position
    // explode this replaces multiplied the removal exchange by the
    // window width (and at a duplicate-heavy corpus that exchange is
    // near corpus-scale); the interval mask applies scan-side in
    // O(len + starts) per document via the native kernel, where the
    // array_contains HOF paid O(len × covered) interpreted probes
    val remStarts = wins.join(dup, Seq("h1", "h2"))
      .filter($"doc_id" * 1000000L + $"pos" =!= $"owner")
      .groupBy($"doc_id").agg(collect_list($"pos").as("rem"))
    toks.join(remStarts, Seq("doc_id"), "left")
      .select($"doc_id", columnOf(graft.functions.DropCoveredTokens(
          exprOf($"ts"),
          exprOf(coalesce($"rem", typedLit(Seq.empty[Int]))),
          SpanW)).as("kt"))
      .select($"doc_id",
        array_join($"kt", " ").as("clean_text"),
        size($"kt").cast("long").as("n_kept"))
  }

  private val dropSpans = QueryDef(
    "drop_spans",
    (s, dir) => {
      import s.implicits._
      dropSpanRewrite(Tables.documents(s, dir)).orderBy($"doc_id")
    },
    Some {
      val g = (0 until SpanW).map(j => s"ts[i+$j]").mkString(" || ' ' || ")
      s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS ts
        FROM documents),
      wins AS (
        SELECT doc_id, i AS pos, $g AS gram
        FROM toks, unnest(range(1, greatest(len(ts) - ${SpanW - 2}, 1))) AS u(i)),
      dup AS (
        SELECT gram, min(doc_id * 1000000 + pos) AS owner
        FROM wins GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
      rempos AS (
        SELECT DISTINCT w.doc_id, w.pos + o AS tpos
        FROM wins w JOIN dup d USING (gram), unnest(range(${SpanW})) AS u(o)
        WHERE w.doc_id * 1000000 + w.pos <> d.owner),
      remlist AS (SELECT doc_id, list(tpos) AS rem FROM rempos GROUP BY doc_id),
      kept AS (
        SELECT t.doc_id,
          list_filter(list_transform(range(1, len(t.ts) + 1), i ->
            CASE WHEN r.rem IS NULL OR NOT list_contains(r.rem, i)
              THEN t.ts[i] END), x -> x IS NOT NULL) AS kt
        FROM toks t LEFT JOIN remlist r USING (doc_id))
      SELECT doc_id, coalesce(array_to_string(kt, ' '), '') AS clean_text,
        CAST(len(kt) AS BIGINT) AS n_kept
      FROM kept
      ORDER BY doc_id
    """
    })

  // ----------------------------------------------------------------------
  // gopher_quality
  // ----------------------------------------------------------------------

  /** Word-count band, mean-word-length band, alphabetic-word floor and
    * stopword floor — the document-level statistical rules of the
    * published Gopher/C4 filtering battery that apply to the synthetic
    * corpus (the line-based rules need line structure the fixture lacks).
    * Word-count floor is 20 here vs the published 50 because the fixture
    * docs are short; the lever, not the constant, is the operator. */
  val GopherMinWords = 20L
  val GopherMaxWords = 100000L
  val GopherStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")

  /** The four Gopher signals over a token-array column, as reusable
    * column arithmetic (identical trees collapse via codegen
    * subexpression elimination, so stacking them costs one tokenize). */
  def gopherNWords(ts: Column): Column = size(ts).cast("long")
  // char-sum and alpha-count through the native array-stat kernels
  // (ArrayStatKernelSpec parity) — the built-in forms ran an interpreted
  // aggregate lambda and an rlike PER TOKEN
  def gopherMeanWlen(ts: Column): Column =
    round(columnOf(graft.functions.SumStrLengths(exprOf(ts))).cast("double") /
      gopherNWords(ts), 4)
  def gopherAlphaFrac(ts: Column): Column =
    round(columnOf(graft.functions.CountAlphaTokens(exprOf(ts))).cast("double") /
      gopherNWords(ts), 4)
  def gopherNStop(ts: Column): Column =
    columnOf(CountInSet(exprOf(ts), GopherStopwords))

  /** The four Gopher signals over the fused one-pass
    * [[graft.functions.TokenStats]] struct (n_toks, sum_len, n_alpha,
    * n_stop) — value-identical to the array forms above without
    * materializing a token array (TokenStatsKernelSpec). Identical
    * struct trees collapse via codegen subexpression elimination, so
    * stacking all four signals costs one scan of the text. */
  def gopherStats(text: Column): Column =
    columnOf(graft.functions.TokenStats(exprOf(text), GopherStopwords))
  def gopherNWordsS(st: Column): Column = st.getField("n_toks")
  def gopherMeanWlenS(st: Column): Column =
    round(st.getField("sum_len").cast("double") / st.getField("n_toks"), 4)
  def gopherAlphaFracS(st: Column): Column =
    round(st.getField("n_alpha").cast("double") / st.getField("n_toks"), 4)
  def gopherNStopS(st: Column): Column = st.getField("n_stop")

  /** The composed Gopher keep verdict over a raw text column (math of
    * `gopher_quality`, reused by [[graft.api.Curation]]). */
  def gopherKeepCol(text: Column): Column = {
    val st = gopherStats(text)
    gopherNWordsS(st).between(GopherMinWords, GopherMaxWords) &&
      gopherMeanWlenS(st).between(3.0, 10.0) &&
      gopherAlphaFracS(st) >= 0.7 && gopherNStopS(st) >= 2
  }

  /** Per-document quality signals + the composed keep verdict, all pure
    * column arithmetic over the one native tokenize pass: scan-parallel,
    * shuffle-free, whole-stage-codegen end to end. */
  private val gopherQuality = QueryDef(
    "gopher_quality",
    (s, dir) => {
      import s.implicits._
      val st = gopherStats($"text")
      Tables.documents(s, dir)
        .select($"doc_id",
          gopherNWordsS(st).as("n_words"),
          gopherMeanWlenS(st).as("mean_wlen"),
          gopherAlphaFracS(st).as("alpha_frac"),
          gopherNStopS(st).as("n_stop"),
          gopherKeepCol($"text").as("keep"))
        .orderBy($"doc_id")
    },
    Some {
      val stops = GopherStopwords.map(w => s"'$w'").mkString(", ")
      s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS ts
        FROM documents),
      m AS (
        SELECT doc_id,
          CAST(len(ts) AS BIGINT) AS n_words,
          CAST(coalesce(list_sum(list_transform(ts, t -> len(t))), 0) AS BIGINT) AS chars,
          CAST(len(list_filter(ts, t -> regexp_full_match(t, '[a-z]+'))) AS BIGINT) AS n_alpha,
          CAST(len(list_filter(ts, t -> list_contains([$stops], t))) AS BIGINT) AS n_stop
        FROM toks)
      SELECT doc_id, n_words,
        round(CAST(chars AS DOUBLE) / n_words, 4) AS mean_wlen,
        round(CAST(n_alpha AS DOUBLE) / n_words, 4) AS alpha_frac,
        n_stop,
        (n_words BETWEEN $GopherMinWords AND $GopherMaxWords
          AND round(CAST(chars AS DOUBLE) / n_words, 4) BETWEEN 3.0 AND 10.0
          AND round(CAST(n_alpha AS DOUBLE) / n_words, 4) >= 0.7
          AND n_stop >= 2) AS keep
      FROM m
      ORDER BY doc_id
    """
    })

  // ----------------------------------------------------------------------
  // chunk_docs
  // ----------------------------------------------------------------------

  /** Tokens per chunk (a context-window budget) and the stride between
    * chunk starts; C − S = 8 tokens of overlap so no token-boundary
    * context is lost between adjacent chunks. */
  val ChunkC = 32
  val ChunkS = 24

  /** Context-window chunking with overlap: each document's token stream
    * is cut into [[ChunkC]]-token chunks whose starts advance by
    * [[ChunkS]] (overlap C−S), the transform that fits a corpus to a
    * model's context length before packing. Chunk starts are every
    * 1+k·S ≤ n_tok, so the trailing chunk may be short — the declared,
    * oracle-mirrored rule (deterministic; chunk_id is pure arithmetic on
    * the start, no window/ordering involved). Entirely scan-parallel:
    * one tokenize, a `sequence` of starts exploded per document, and a
    * `slice` per start — zero shuffles at any corpus size; output order
    * is the only sort and belongs to the gate, not the operator. */
  /** Chunk-id namespace width when chunk rows replace documents
    * downstream (new id = doc_id·2²⁰ + chunk_id): 2²⁰ chunks/doc ≈ 25M
    * tokens per document before collision at the default stride. */
  val ChunkIdBase: Long = 1L << 20

  /** The `chunk_docs` transform as reusable rows: (doc_id, carry...,
    * chunk_id, chunk_start, n_chunk_tok, chunk_text) — ONE native
    * [[graft.functions.ChunkSpans]] pass per document, exploded; zero
    * shuffles. The explode(sequence)+slice form this replaces carried
    * the full token ARRAY through the explode, copying it into every
    * chunk row's unsafe buffer — an ~n/stride-fold byte blowup that
    * dominated the chunking scan. Shared by the gate query and
    * [[graft.api.Curation]]'s chunk-to-context stage. */
  def chunkRows(docs: org.apache.spark.sql.DataFrame,
      carry: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    val keep = col("doc_id") +: carry.map(col)
    docs
      .select(keep :+ explode(columnOf(graft.functions.ChunkSpans(
        exprOf(docs("text")), ChunkC, ChunkS))).as("ch"): _*)
      .select(keep ++ Seq(
        $"ch.chunk_id".as("chunk_id"),
        $"ch.chunk_start".as("chunk_start"),
        $"ch.n_tok".as("n_chunk_tok"),
        $"ch.txt".as("chunk_text")): _*)
  }

  private val chunkDocs = QueryDef(
    "chunk_docs",
    (s, dir) => {
      import s.implicits._
      chunkRows(Tables.documents(s, dir))
        .select($"doc_id", $"chunk_id", $"chunk_start",
          $"n_chunk_tok", $"chunk_text")
        .orderBy($"doc_id", $"chunk_id")
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS ts
        FROM documents),
      st AS (
        SELECT doc_id, ts, i
        FROM toks, unnest(range(1, len(ts) + 1, $ChunkS)) AS u(i)
        WHERE len(ts) > 0)
      SELECT doc_id,
        CAST((i - 1) // $ChunkS + 1 AS BIGINT) AS chunk_id,
        CAST(i AS BIGINT) AS chunk_start,
        CAST(len(list_slice(ts, i, i + ${ChunkC - 1})) AS BIGINT) AS n_chunk_tok,
        array_to_string(list_slice(ts, i, i + ${ChunkC - 1}), ' ') AS chunk_text
      FROM st
      ORDER BY doc_id, chunk_id
    """))
}
