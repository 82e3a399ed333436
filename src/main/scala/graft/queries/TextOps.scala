package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Training-data-pipeline text operators over `documents` (text ≡ corpus
  * docs): dedup family, token counting, quality scoring, language ID,
  * BM25 scoring. All pure `Column` expressions (codegen'd, no UDFs).
  *
  * Scale shape: per-doc ops are scan-parallel; pair-forming ops (Jaccard,
  * LSH) go through explode → shuffle on the feature/bucket key → pair agg,
  * which is the standard sub-quadratic dedup layout at 100 TB (pair count
  * bounded by feature selectivity, never all-pairs).
  */
object TextOps {

  def queries: Seq[QueryDef] = Seq(
    dedupExact, rollingFp, tokenCount, qualityScoreQ, langId, jaccardPairs,
    jaccardCapped, minhashSig, lshPairs, bm25Score, piiScrub, piiScrubKernel,
    keywordsTfidf,
    lmScore, bigramSurprisal, dedupIncremental)

  /** PII patterns shared verbatim by Spark (Java regex) and the oracle
    * (RE2) — kept inside the common syntax subset of both engines. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\d{3}[-.]\\d{3,4}[-.]\\d{4}"

  /** PII scrubbing: redact emails/phone-shaped spans with typed
    * placeholders, reporting match counts as evidence — the masking pass a
    * corpus takes before training. Pure per-row regex work on the scan
    * (codegen'd built-ins, no shuffle); the gate fixture contains no PII,
    * so its row additionally proves the patterns raise NO false positives
    * on ordinary text (the redaction itself is spec-driven on synthetic
    * PII, PiiScrubSpec). */
  private val piiScrub = QueryDef(
    "pii_scrub",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          size(regexp_extract_all($"text", lit(EmailRe), lit(0)))
            .cast("long").as("n_email"),
          size(regexp_extract_all($"text", lit(PhoneRe), lit(0)))
            .cast("long").as("n_phone"),
          regexp_replace(regexp_replace($"text", EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>").as("scrubbed"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_email,
        CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phone,
        regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
          '$PhoneRe', '<PHONE>', 'g') AS scrubbed
      FROM documents
      ORDER BY doc_id
    """))

  /** The masking pass through the native [[graft.functions.PiiScrubExpr]]
    * / [[graft.functions.PiiCountExpr]] kernels — same values as
    * `pii_scrub` (byte-parity fuzz-proven in PiiScrubKernelSpec), same
    * DuckDB RE2 oracle. The built-in row stays as the general-regex
    * cross-engine check; this row is `Curation.curate`'s actual masking
    * stage and closes the pii half of the sf1 per-row-kernel flags
    * (pii_scrub 5.1 s vs DuckDB 0.34 s). */
  private val piiScrubKernel = QueryDef(
    "pii_scrub_kernel",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{PiiCountExpr, PiiScrubExpr}
      import graft.GraftFunctions.{columnOf, exprOf}
      Tables.documents(s, dir)
        .select($"doc_id",
          columnOf(PiiCountExpr(exprOf($"text"), emails = true)).as("n_email"),
          columnOf(PiiCountExpr(exprOf($"text"), emails = false)).as("n_phone"),
          columnOf(PiiScrubExpr(exprOf($"text"))).as("scrubbed"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id,
        CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_email,
        CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phone,
        regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
          '$PhoneRe', '<PHONE>', 'g') AS scrubbed
      FROM documents
      ORDER BY doc_id
    """))

  /** Keyword extraction: top-3 TF-IDF terms per document (tf · ln((N+1)/
    * (df+1)), ties broken by term) — corpus-level term weighting as a
    * per-doc summary. Term frequency is computed SCAN-LOCALLY by the
    * [[graft.functions.TermCounts]] kernel (tf is a per-document
    * statistic — the old `explode → groupBy(doc, tok)` exchange shuffled
    * one row per token OCCURRENCE in the corpus only to count things each
    * row already knew); the document-frequency census and the tf×idf join
    * shuffle one row per DISTINCT term per document, N broadcasts as a
    * scalar, and the per-doc top-3 runs on the custom
    * [[graft.plans.TopKPerGroup]] operator (bounded buffers — the
    * row_number window the oracle uses would sort every document's terms). */
  private val keywordsTfidf = QueryDef(
    "keywords_tfidf",
    (s, dir) => {
      import s.implicits._
      val tf = Tables.documents(s, dir)
        .select($"doc_id", explode(graft.GraftFunctions.columnOf(
          graft.functions.TermCounts(graft.GraftFunctions.exprOf($"text"))))
          .as("tc"))
        .select($"doc_id", $"tc.tok".as("tok"), $"tc.tf".cast("long").as("tf"))
      val dfc = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
      val n = Tables.documents(s, dir)
        .agg(count(lit(1)).cast("double").as("n_docs"))
      val scored = tf.join(dfc, Seq("tok")).crossJoin(broadcast(n))
        .select($"doc_id", $"tok",
          // floor(x·1e6+0.5)/1e6 over round(x, 6): same value for this
          // x ≥ 0 product, no per-row BigDecimal (Spark's Round on
          // DoubleType allocates one per row); the oracle mirrors the
          // formula so both engines run identical IEEE ops
          (floor($"tf" * log(($"n_docs" + 1.0) / ($"df" + 1.0)) * 1e6 + 0.5)
            / 1e6).as("score"))
      graft.plans.TopKPerGroup(scored, Seq("doc_id"),
          Seq(("score", false), ("tok", true)), 3)
        .orderBy($"doc_id", $"score".desc, $"tok")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0)) AS tok
        FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfc AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
      scored AS (
        SELECT doc_id, t.tok, floor(tf * ln((n_docs + 1.0) / (df + 1.0)) * 1000000.0 + 0.5) / 1000000.0 AS score
        FROM tf t JOIN dfc USING (tok) CROSS JOIN n),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS rn
        FROM scored)
      SELECT doc_id, tok, score
      FROM r
      WHERE rn <= 3
      ORDER BY doc_id, score DESC, tok
    """))

  /** Corpus unigram LM score: per-document mean negative log-likelihood
    * of its tokens under the corpus unigram distribution — the
    * CCNet/Gopher-style statistical quality signal (a doc of rare or
    * garbled tokens scores high surprisal; boilerplate scores low) that
    * complements the rule-based `quality_score`.
    *
    * Plan: the scan-local [[graft.functions.TermCounts]] relation (one
    * row per DISTINCT token per document, tf attached) feeds both the
    * vocabulary aggregate (Σ tf, map-side-combined) and the scoring join
    * on the token key — no per-occurrence row ever shuffles; the corpus
    * total is an exact integer broadcast scalar. The join key is
    * heavy-tailed (stop words) but the vocabulary side is one row per
    * token, so AQE's skew-join split handles oversized probe partitions —
    * no salting needed when the build side is 1-row-per-key.
    *
    * Determinism: token counts are exact integers; each token's surprisal
    * `-ln(cnt/total)` is a pure function of them, quantized to INTEGER
    * MICRO-NATS before the per-doc sum so a last-ulp `ln` difference
    * between engines cannot propagate, the sum is order-independent, and
    * the 4-dp mean is computed by exact integer arithmetic — see the
    * inline note in [[lmScores]] for the boundary case that made the
    * previous round-of-double-mean form diverge between engines. */
  /** Per-doc (n_tok, avg_nll) under the corpus unigram model (math of
    * `lm_score`, reused by [[graft.api.Curation]]'s surprisal gate). */
  def lmScores(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    // one row per DISTINCT token per document, tf attached scan-locally
    // (TermCounts) — the occurrence-level explode this replaces shuffled
    // one row per token POSITION through the census and the scoring join;
    // every downstream value is unchanged: uni = Σ tf, tot = Σ tf, and
    // the per-doc micro-nat sum Σ_occurrences micro ≡ Σ_tokens tf·micro
    val tc = docs.select($"doc_id", explode(graft.GraftFunctions.columnOf(
        graft.functions.TermCounts(graft.GraftFunctions.exprOf($"text"))))
        .as("tc"))
      .select($"doc_id", $"tc.tok".as("tok"), $"tc.tf".cast("long").as("tf"))
    val uni = tc.groupBy($"tok").agg(sum($"tf").as("cnt"))
    // tot derives from the vocabulary census (Σ_tok Σ tf ≡ Σ tf exactly —
    // integer sums), saving a third full TermCounts scan of the corpus
    val tot = uni.agg(sum($"cnt").cast("double").as("n"))
    // per-token surprisal in INTEGER MICRO-NATS, and the 4-dp mean as
    // exact integer arithmetic: floor((2·sum + 100·n)/(200·n)) / 1e4 is
    // HALF_UP of sum/(n·100) on exact rationals. `round(sum(r6)/n, 4)`
    // here was a cross-engine landmine: when the mean lands exactly on a
    // 4-dp boundary (~1/1000 docs), Spark's decimal HALF_UP and DuckDB's
    // double-math rounding DISAGREE on the same input double (found by an
    // sf0.1 full-oracle sweep, doc 4599) — integer micros make the
    // summation and the boundary decision identical on both engines.
    // micro is a function of the TOKEN alone, so compute it on the
    // vocab-sized relation BEFORE the big join — the per-(doc,token)
    // path carries neither the log nor the rounding. floor(x+0.5), not
    // round(x): Spark's Round on DoubleType allocates a BigDecimal per
    // row; floor is pure codegen double math, equal here (x ≥ 0), and
    // the oracle uses the identical formula so both engines run the
    // same IEEE ops.
    val uniMicro = uni.crossJoin(broadcast(tot))
      .select($"tok",
        floor(-log($"cnt" / $"n") * 1e6 + 0.5).cast("long").as("micro"))
    tc.join(uniMicro, Seq("tok"))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_tok"), sum($"tf" * $"micro").as("sm"))
      .select($"doc_id", $"n_tok",
        (floor(($"sm" * 2 + $"n_tok" * 100).cast("double") /
          ($"n_tok" * 200).cast("double")) / 1e4).as("avg_nll"))
  }

  private val lmScore = QueryDef(
    "lm_score",
    (s, dir) => {
      import s.implicits._
      lmScores(Tables.documents(s, dir).select($"doc_id", $"text"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0)) AS tok
        FROM documents),
      uni AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
      tot AS (SELECT count(*)::DOUBLE AS n FROM toks)
      SELECT doc_id, count(*) AS n_tok,
        floor((2 * sum(CAST(floor(-ln(cnt / n) * 1000000.0 + 0.5) AS BIGINT))
            + 100 * count(*))::DOUBLE
          / ((200 * count(*))::DOUBLE)) / 10000.0 AS avg_nll
      FROM toks JOIN uni USING (tok) CROSS JOIN tot
      GROUP BY doc_id
      ORDER BY doc_id
    """))

  /** Interpolation weight of the conditional bigram term; the remaining
    * mass backs off to the corpus unigram distribution (Jelinek–Mercer
    * smoothing — the λ·P(w₂|w₁) + (1−λ)·P(w₂) fixed-weight form). */
  val BigramLambda = 0.7

  /** Corpus bigram LM surprisal: per-document mean negative log-likelihood
    * of its ADJACENT TOKEN PAIRS under a Jelinek–Mercer-interpolated
    * bigram model fit on the corpus itself — one LM order up from
    * `lm_score`, which a curation stack runs when unigram stats stop
    * separating fluent text from shuffled-token soup (unigram NLL is
    * permutation-invariant; bigram NLL is exactly what drops when word
    * ORDER is natural).
    *
    * Plan: the scan-local [[graft.functions.BigramCounts]] relation (one
    * row per DISTINCT adjacent pair per document, count attached — no
    * per-occurrence row ever shuffles); the unigram/total joins are
    * folded into the DISTINCT-bigram census first (1-row-per-key
    * relations joining 1-row-per-key relations), producing a per-bigram
    * surprisal table, so the per-document pair relation shuffles through
    * exactly ONE (w1,w2) join — AQE's skew split covers the stop-word
    * tail of that single exchange the same way `lm_score`'s join does;
    * the corpus total broadcasts as a scalar. Per-pair surprisal is quantized to INTEGER
    * MICRO-NATS before the per-doc sum (a last-ulp ln() difference cannot
    * propagate; the sum is order-independent) and the 4-dp mean is exact
    * integer arithmetic — see [[lmScores]]. Docs with <2 tokens have no
    * pairs and drop from the output on both engines. */
  private val bigramSurprisal = QueryDef(
    "bigram_surprisal",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select($"doc_id", $"text")
      // scan-local count relations (TermCounts / BigramCounts): one row
      // per distinct token / adjacent pair per document, counts attached —
      // no per-occurrence row ever shuffles (the zip-slice pair explode
      // this replaces carried one row per pair POSITION through the
      // census and the scoring join). BigramCounts yields an empty array
      // for <2-token docs, which explode drops — the same doc-drop
      // behavior the old plan needed an explicit size guard for.
      val tc = docs.select($"doc_id", explode(graft.GraftFunctions.columnOf(
          graft.functions.TermCounts(graft.GraftFunctions.exprOf($"text"))))
          .as("t"))
        .select($"doc_id", $"t.tok".as("tok"), $"t.tf".cast("long").as("tf"))
      val bc = docs.select($"doc_id", explode(graft.GraftFunctions.columnOf(
          graft.functions.BigramCounts(graft.GraftFunctions.exprOf($"text"))))
          .as("b"))
        .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"),
          $"b.cnt".cast("long").as("c"))
      val uni = tc.groupBy($"tok").agg(sum($"tf").as("c1"))
      val big = bc.groupBy($"w1", $"w2").agg(sum($"c").as("c2"))
      // exact-integer identity Σ_tok Σ tf ≡ Σ tf — one fewer corpus scan
      val tot = uni.agg(sum($"c1").cast("double").as("n"))
      // fold the unigram/total joins into a per-DISTINCT-bigram surprisal
      // table first: the full pair relation (one row per adjacent pair in
      // the corpus) then shuffles into exactly ONE join, instead of
      // carrying every pair occurrence through three key-hash exchanges —
      // the census relations are 1-row-per-key and strictly smaller
      // per-pair surprisal in INTEGER MICRO-NATS and an exact-integer
      // 4-dp mean — see lmScores for why (cross-engine rounding on exact
      // 4-dp boundaries; found by the sf0.1 full-oracle sweep)
      val surpTab = big
        .join(uni.select($"tok".as("w1"), $"c1".as("cw1")), Seq("w1"))
        .join(uni.select($"tok".as("w2"), $"c1".as("cw2")), Seq("w2"))
        .crossJoin(broadcast(tot))
        .select($"w1", $"w2",
          // floor(x+0.5) over round(x): same value for these x ≥ 0
          // inputs, no per-row BigDecimal — see lmScores
          floor(-log(lit(BigramLambda) * $"c2" / $"cw1"
            + lit(1.0 - BigramLambda) * $"cw2" / $"n") * 1e6 + 0.5)
            .cast("long").as("micro"))
      bc
        .join(surpTab, Seq("w1", "w2"))
        .groupBy($"doc_id")
        .agg(sum($"c").as("n_bigrams"), sum($"c" * $"micro").as("sm"))
        .select($"doc_id", $"n_bigrams",
          (floor(($"sm" * 2 + $"n_bigrams" * 100).cast("double") /
            ($"n_bigrams" * 200).cast("double")) / 1e4).as("avg_nll"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS ts
        FROM documents),
      tok AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
      uni AS (SELECT tok, count(*) AS c1 FROM tok GROUP BY 1),
      tot AS (SELECT count(*)::DOUBLE AS n FROM tok),
      bg AS (
        SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        FROM toks, unnest(range(1, greatest(len(ts), 1))) AS u(i)),
      big AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2)
      SELECT doc_id, count(*) AS n_bigrams,
        floor((2 * sum(CAST(floor(-ln($BigramLambda::DOUBLE * c2 / u1.c1
              + ${1.0 - BigramLambda}::DOUBLE * u2.c1 / n) * 1000000.0 + 0.5) AS BIGINT))
            + 100 * count(*))::DOUBLE
          / ((200 * count(*))::DOUBLE)) / 10000.0 AS avg_nll
      FROM bg
      JOIN big USING (w1, w2)
      JOIN uni u1 ON bg.w1 = u1.tok
      JOIN uni u2 ON bg.w2 = u2.tok
      CROSS JOIN tot
      GROUP BY doc_id
      ORDER BY doc_id
    """))


  /** Document fingerprinting, rolling-hash form (training-pipeline op):
    * order-sensitive polynomial hash over word tokens — the incremental/
    * composable counterpart to the md5 exact-dup fingerprint above. Native
    * one-pass kernel; the oracle folds the identical arithmetic with
    * `list_reduce`. */
  private val rollingFp = QueryDef(
    "rolling_fp",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          graft.GraftFunctions.columnOf(graft.functions.RollingFp(
            graft.GraftFunctions.exprOf($"text"))).as("fp"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id,
        list_reduce(
          list_prepend(0::BIGINT,
            list_transform(
              list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                t -> len(t) > 0),
              t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % ${graft.functions.RollingFp.P})),
          (acc, x) -> (acc * ${graft.functions.RollingFp.B} + x) % ${graft.functions.RollingFp.P})
          AS fp
      FROM documents
      ORDER BY doc_id
    """))

  /** Exact dedup by content fingerprint (md5 of lowercased alnum-only
    * text): keeper = min doc_id per fingerprint. */
  private val dedupExact = QueryDef(
    "dedup_exact",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .groupBy(fingerprint($"text").as("fp"))
        .agg(min($"doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
        .orderBy($"keeper_id")
    },
    Some("""
      SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
        min(doc_id) AS keeper_id, count(*) AS n_copies
      FROM documents
      GROUP BY 1
      ORDER BY keeper_id
    """))

  /** Token counting: whitespace tokens + a BPE-ish subword regex count
    * (word pieces <=4 chars / digit runs / punctuation runs). */
  private val tokenCount = QueryDef(
    "token_count",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          // both counts through the native count-only kernels
          // (TokenCountKernelSpec parity); the DuckDB oracle keeps the
          // regex forms as the cross-engine check
          tokenCountWs($"text").cast("long").as("n_ws"),
          tokenCountSub(lower($"text")).cast("long").as("n_sub"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id,
        CAST(len(list_filter(string_split_regex(text, '\s+'),
          x -> len(x) > 0)) AS BIGINT) AS n_ws,
        CAST(len(regexp_extract_all(lower(text),
          '[a-z]{1,4}|[0-9]+|[^a-z0-9\s]+')) AS BIGINT) AS n_sub
      FROM documents
      ORDER BY doc_id
    """))

  /** Quality scoring: blend of length, stopword ratio and punctuation
    * penalty (deterministic arithmetic mirrored in the oracle). */
  private val qualityScoreQ = QueryDef(
    "quality_score",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id", qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH f AS (
        SELECT doc_id,
          len(text)::DOUBLE AS n_chars,
          greatest(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            t -> len(t) > 0))::DOUBLE, 1.0) AS n_toks,
          len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            t -> list_contains([${Stopwords.map("'" + _ + "'").mkString(", ")}], t)))::DOUBLE AS n_stop,
          len(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE AS n_punct
        FROM documents)
      SELECT doc_id,
        round(least(n_chars / 500.0, 1.0) * 0.4
          + least(n_stop / n_toks * 3.0, 1.0) * 0.4
          + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 5.0, 1.0)) * 0.2,
          6) AS quality
      FROM f
      ORDER BY doc_id
    """))

  /** Language ID: stopword-marker voting with a fixed tie-break order —
    * the n-gram-heuristic family, deterministic on both engines. */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "les", "et", "des", "un", "une"),
    "zh" -> Seq("shi", "de", "le", "wo", "ni", "ta"))

  private val langId = QueryDef(
    "lang_id",
    (s, dir) => {
      import s.implicits._
      // fused CountInSets kernel: all five marker sets fold in ONE token
      // scan with no token array (was: a WordTokens array + 5 CountInSet
      // walks; before that, 5 interpreted HOF lambdas) — values identical
      val counts = graft.GraftFunctions.columnOf(graft.functions.CountInSets(
        graft.GraftFunctions.exprOf($"text"), LangMarkers.map(_._2)))
      val scores: Seq[(String, Column)] = LangMarkers.zipWithIndex.map {
        case ((lang, _), i) => lang -> element_at(counts, i + 1)
      }
      val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
      val pred = scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
        when(sc === best && best > 0, lang).otherwise(acc)
      }
      // foldRight gives first-match-wins in LangMarkers order
      Tables.documents(s, dir)
        .select($"doc_id" +: scores.map { case (l, c) => c.as(s"score_$l") }
          :+ pred.as("pred_lang"): _*)
        .orderBy($"doc_id")
    },
    Some {
      val toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)"
      val scoreExprs = LangMarkers.map { case (lang, ms) =>
        s"CAST(len(list_filter($toks, t -> list_contains([${ms.map("'" + _ + "'").mkString(", ")}], t))) AS BIGINT) AS score_$lang"
      }.mkString(",\n          ")
      val bestExpr = "greatest(" + LangMarkers.map("score_" + _._1).mkString(", ") + ")"
      val caseExpr = LangMarkers.map { case (lang, _) =>
        s"WHEN score_$lang = best AND best > 0 THEN '$lang'"
      }.mkString(" ")
      s"""
      WITH sc AS (
        SELECT doc_id,
          $scoreExprs
        FROM documents),
      b AS (SELECT *, $bestExpr AS best FROM sc)
      SELECT doc_id, ${LangMarkers.map("score_" + _._1).mkString(", ")},
        CASE $caseExpr ELSE 'und' END AS pred_lang
      FROM b
      ORDER BY doc_id
    """
    })

  /** N-gram Jaccard near-dup, candidate-generation + exact-verification
    * form: candidate pairs must share at least one DISCRIMINATIVE word
    * 4-gram (2 ≤ df ≤ [[JaccardDfCap]]); each candidate's Jaccard is then
    * computed EXACTLY over the full distinct-gram sets (hot grams included
    * in both numerator and denominators) via per-pair array intersection.
    *
    * This is the standard production pairing of a bounded candidate
    * generator with an exact verifier: a gram shared by f documents forms
    * f(f−1)/2 candidate pairs, so the df-cap bounds every gram's
    * contribution and NO uncapped pair-formation plan exists — the old
    * brute-force variant (self-join on all shared grams) was quadratic in
    * hot-gram document frequency and is retained only as the in-JVM spec
    * recompute. The trade-off is declared: a pair sharing ONLY
    * above-cap grams is never considered (the same false-negative class
    * LSH banding accepts probabilistically; true near-dups share rare
    * grams).
    *
    * Scale shape — NOTHING in this plan is whole-corpus-resident and no
    * gram text ever crosses an exchange:
    *
    *  1. Every gram is fingerprinted scan-side to 128 bits (two
    *     independently-seeded xxhash64 legs — the `dup_spans` move), so
    *     the census shuffles 16 bytes per gram.
    *  2. ONE map-side-combined aggregate builds the gram census with
    *     [[graft.functions.BoundedCollectSet]] — a SATURATING doc-id
    *     collector whose per-gram state is O(cap) even for a stop-phrase
    *     shared by 10^7 documents (`collect_set` there is an OOM). A
    *     census row of size in [2, cap] yields that gram's candidate
    *     pairs by in-partition array math (no self-join, no window); size
    *     == cap+1 marks the gram HOT exactly (saturation keeps both
    *     answers exact).
    *  3. The exact intersection is assembled WITHOUT doc→gram arrays:
    *     i = (shared discriminative grams, free from the pair census)
    *       + (shared hot grams, from a membership join of the gram
    *          relation against the BROADCAST hot-gram list, restricted to
    *          candidate pairs — volume Σ_pairs |hot(A)|, bounded by the
    *          cap-bounded pair count × per-doc hot-gram count).
    *     Set sizes |A|,|B| are scan-side `size(word_ngrams(text))` — no
    *     shuffle. A df=1 gram is in neither term and in both set sizes,
    *     exactly as the oracle's full-set intersect counts it.
    *
    * Contrast `jaccard_capped`, which DEFINES its score over the post-cap
    * gram sets; this query reports the exact one. */
  private val jaccardPairs = QueryDef(
    "jaccard_pairs",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      // (doc_id, h1, h2): distinct 4-grams fingerprinted scan-side; the
      // gram string is dropped before any exchange. h2 is a second
      // xxhash64 LEG (different seed), not a re-hash of a prefixed string
      // — no per-gram concat allocation.
      val gramFps = docs
        .select($"doc_id", explode(graft.GraftFunctions.columnOf(
          graft.functions.WordNgrams(
            graft.GraftFunctions.exprOf($"text"), 4))).as("gram"))
        .select($"doc_id",
          xxhash64($"gram").as("h1"),
          graft.GraftFunctions.columnOf(
            org.apache.spark.sql.catalyst.expressions.XxHash64(
              Seq(graft.GraftFunctions.exprOf($"gram")), 0x6a616366L)).as("h2"))
      // `df` (true document frequency) rides the same census exchange as
      // one extra long per gram — the saturating set alone cannot report
      // how MUCH volume the cap diverted, and the observe point below is
      // the cap telemetry: jaccard_pairs_cap.over_cap_groups counts the
      // hot grams routed to the broadcast membership path (NOT dropped —
      // this query's score is exact), over_cap_rows their total
      // memberships. Observed pre-split, so both census consumers see
      // the full relation (observe is a pushdown barrier).
      val census = gramFps
        .groupBy($"h1", $"h2")
        .agg(graft.GraftFunctions.columnOf(
          graft.functions.BoundedCollectSet(
            graft.GraftFunctions.exprOf($"doc_id"),
            JaccardDfCap + 1).toAggregateExpression()).as("ds"),
          count(lit(1)).as("df"))
        .observe("jaccard_pairs_cap",
          size(collect_set(when($"df" > JaccardDfCap, struct($"h1", $"h2"))))
            .as("over_cap_groups"),
          aggregate(
            collect_set(when($"df" > JaccardDfCap, struct($"h1", $"h2", $"df"))),
            lit(0L), (acc, x) => acc + x.getField("df")).as("over_cap_rows"))
      // discriminative grams (2 <= df <= cap): explode each ds into its
      // unordered pairs; the groupBy both dedups pairs AND counts each
      // pair's shared discriminative grams
      val pairsCapped = census
        .filter(size($"ds").between(2, JaccardDfCap))
        .select(explode(expr(
          """flatten(transform(ds,
               x -> filter(transform(ds,
                      y -> named_struct('a_id', x, 'b_id', y)),
                    p -> p.a_id < p.b_id)))""")).as("p"))
        .groupBy($"p.a_id".as("a_id"), $"p.b_id".as("b_id"))
        .agg(count(lit(1)).as("i_cap"))
      // hot grams (df > cap, detected by saturation): few distinct values
      // by construction — broadcast the list, count each candidate pair's
      // shared hot grams via a pair-restricted membership join
      val hot = census.filter(size($"ds") === JaccardDfCap + 1)
        .select($"h1", $"h2")
      val hotMem = gramFps.join(broadcast(hot), Seq("h1", "h2"))
      val hotPairI = pairsCapped.select($"a_id", $"b_id")
        .join(hotMem.select($"doc_id".as("a_id"), $"h1", $"h2"), Seq("a_id"))
        .join(hotMem.select($"doc_id".as("b_id"), $"h1", $"h2"),
          Seq("b_id", "h1", "h2"))
        .groupBy($"a_id", $"b_id")
        .agg(count(lit(1)).as("i_hot"))
      // full-set sizes, computed scan-side (no shuffle, no arrays kept)
      val sizes = docs.select($"doc_id", size(graft.GraftFunctions.columnOf(
        graft.functions.WordNgrams(
          graft.GraftFunctions.exprOf($"text"), 4))).as("n"))
      pairsCapped
        .join(hotPairI, Seq("a_id", "b_id"), "left")
        .select($"a_id", $"b_id",
          ($"i_cap" + coalesce($"i_hot", lit(0L))).as("i"))
        .join(sizes.select($"doc_id".as("a_id"), $"n".cast("long").as("na")), Seq("a_id"))
        .join(sizes.select($"doc_id".as("b_id"), $"n".cast("long").as("nb")), Seq("b_id"))
        // exact-rational 6-dp rounding over integer i/(na+nb-i) — immune
        // to the cross-engine round()-of-double boundary (see lmScores)
        .select($"a_id", $"b_id",
          (floor(($"i" * 2000000L + ($"na" + $"nb" - $"i")).cast("double") /
            (($"na" + $"nb" - $"i") * 2L).cast("double")) / 1000000.0)
            .as("jaccard"))
        .orderBy($"jaccard".desc, $"a_id", $"b_id")
        .limit(50)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS ts
        FROM documents),
      dg AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, greatest(len(ts) - 2, 1)),
          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3])) AS gs
        FROM toks),
      grams AS (SELECT doc_id, unnest(gs) AS gram FROM dg),
      disc AS (
        SELECT gram FROM grams
        GROUP BY gram HAVING count(*) BETWEEN 2 AND $JaccardDfCap),
      j AS (SELECT doc_id, gram FROM grams WHERE gram IN (SELECT gram FROM disc)),
      cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM j a JOIN j b ON a.gram = b.gram AND a.doc_id < b.doc_id)
      SELECT a_id, b_id,
        floor((len(list_intersect(x.gs, y.gs)) * 2000000
            + (len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs))))::DOUBLE
          / ((len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs))) * 2)::DOUBLE)
          / 1000000.0 AS jaccard
      FROM cand
      JOIN dg x ON a_id = x.doc_id
      JOIN dg y ON b_id = y.doc_id
      ORDER BY jaccard DESC, a_id, b_id
      LIMIT 50
    """))

  /** MinHash signatures: k=16 min-hashes over 5-char shingles, banded 4x4
    * for LSH (signature per doc — the write-side of dedup).
    *
    * One md5 per shingle (28-bit base hash), then k affine permutations
    * `(a_j*h + b_j) mod P` (P = 2^31-1) — the standard trick that makes
    * signature cost O(shingles + k) instead of O(shingles * k) digests.
    * Constants come from a fixed seed so the DuckDB mirror is generated
    * from the same values. */
  val MinhashK = 16
  val BandSize = 4
  private val P = 2147483647L // 2^31 - 1 (prime); 28-bit base hash keeps a*h in range
  private val (permA, permB) = {
    val rng = new scala.util.Random(7)
    val a = Seq.fill(MinhashK)(1L + rng.nextInt(Int.MaxValue - 1).toLong)
    val b = Seq.fill(MinhashK)(rng.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  /** Base 28-bit hash per distinct 5-shingle (native one-pass kernel —
    * same values as transform(shingles)->md5->conv built-ins). */
  private[queries] def baseHashes(text: Column): Column =
    graft.GraftFunctions.columnOf(graft.functions.ShingleHashes(
      graft.GraftFunctions.exprOf(text), 5, 7))

  /** All k min-hashes in ONE native pass over the base-hash array
    * (`graft.functions.AffineMinhash`) — same values as k separate
    * `array_min(transform(...))` HOFs, without the per-element lambda
    * interpretation that dominated the sf0.1 profile. */
  private[queries] def minhashArr(hs: Column): Column =
    graft.GraftFunctions.columnOf(graft.functions.AffineMinhash(
      graft.GraftFunctions.exprOf(hs), permA, permB, P))

  /** All LSH band keys of a document as one array column — the public
    * form of the banding behind `lsh_pairs`/`dedup_incremental`, for
    * callers outside this package (the streaming corpus probe). */
  def minhashBands(text: Column): Column = {
    val mh = minhashArr(baseHashes(text))
    array((0 until MinhashK / BandSize).map(b => bandCol(mh, b)): _*)
  }

  /** (doc_id, band_idx, band_hash) band relation of `docs`. The minhash
    * array is PROJECTED before the explode: a generator expression gets
    * no subexpression elimination, so inlining `mh` into each band would
    * recompute the full shingle+minhash kernel once per band per row
    * (measured 3× the whole query's cost). */
  def bandRelation(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(docs("doc_id"), minhashArr(baseHashes(docs("text"))).as("mh"))
      .select($"doc_id", posexplode(array(
        (0 until MinhashK / BandSize).map(b => bandCol($"mh", b)): _*))
        .as(Seq("band_idx", "band_hash")))
  }

  private[queries] def bandCol(mh: Column, b: Int): Column =
    concat_ws("|", (b * BandSize until (b + 1) * BandSize)
      .map(j => element_at(mh, j + 1)): _*)

  private[queries] val baseHashesSql =
    "list_transform(list_distinct(list_filter(list_transform(" +
      "range(1, greatest(len(norm) - 3, 1)), i -> substr(norm, i, 5)), " +
      "s -> len(s) = 5)), x -> ('0x' || substr(md5(x), 1, 7))::BIGINT)"

  private def minhashSql(j: Int): String =
    s"COALESCE(CAST(list_min(list_transform(hs, h -> (${permA(j)} * h + ${permB(j)}) % $P)) AS VARCHAR), '${Long.MaxValue}')"

  private[queries] def bandSql(b: Int): String =
    (b * BandSize until (b + 1) * BandSize).map(minhashSql).mkString(" || '|' || ")

  /** Document-frequency-capped Jaccard: grams appearing in more than
    * [[JaccardDfCap]] documents are dropped BEFORE pair formation — the
    * standard warehouse-scale dedup guard. A gram shared by f docs makes
    * f(f-1)/2 candidate pairs, so one stop-phrase gram can quadratically
    * dominate the shuffle while carrying no dedup signal; capping bounds
    * every bucket. Jaccard is then DECLARED over the discriminative-gram
    * sets (numerator and denominators both post-cap), mirrored exactly in
    * the oracle. */
  // `final` without a type annotation = compile-time constant, INLINED at
  // every use site: `jaccard_pairs` is declared above this line and builds
  // its oracle SQL eagerly at object init — a plain val would interpolate
  // the yet-uninitialized 0 there (caught by the sf0.01 oracle gate)
  final val JaccardDfCap = 4

  private val jaccardCapped = QueryDef(
    "jaccard_capped",
    (s, dir) => {
      import s.implicits._
      // the `jaccard_pairs` census pattern, minus the hot-gram term (this
      // query DEFINES its score over the post-cap gram sets): ONE
      // map-side-combined aggregate with O(cap) saturating state per gram
      // replaces the old window + cache + self-join — a gram's census row
      // yields its pair contributions AND its per-doc size contributions
      // by in-partition array math, and no whole-group window buffer or
      // in-plan cache exists. Fingerprint keys (16 bytes) replace gram
      // text on the exchange, exactly as in `jaccard_pairs` (2^128 makes
      // a census collision vanishingly unlikely; the oracle groups on the
      // raw string, proving the keying changes no result).
      val gramFps = Tables.documents(s, dir)
        .select($"doc_id", explode(graft.GraftFunctions.columnOf(
          graft.functions.WordNgrams(
            graft.GraftFunctions.exprOf($"text"), 4))).as("gram"))
        .select($"doc_id",
          xxhash64($"gram").as("h1"),
          graft.GraftFunctions.columnOf(
            org.apache.spark.sql.catalyst.expressions.XxHash64(
              Seq(graft.GraftFunctions.exprOf($"gram")), 0x6a616366L)).as("h2"))
      // cap telemetry (see jaccard_pairs): here over-cap grams ARE
      // excluded from the score by definition, so over_cap_rows is the
      // exact count of (doc, gram) memberships the cap removed from this
      // corpus's post-cap universe — the recall price of the skew guard,
      // readable per query run instead of guessed
      val census = gramFps
        .groupBy($"h1", $"h2")
        .agg(graft.GraftFunctions.columnOf(
          graft.functions.BoundedCollectSet(
            graft.GraftFunctions.exprOf($"doc_id"),
            JaccardDfCap + 1).toAggregateExpression()).as("ds"),
          count(lit(1)).as("df"))
        .observe("jaccard_capped_cap",
          size(collect_set(when($"df" > JaccardDfCap, struct($"h1", $"h2"))))
            .as("over_cap_groups"),
          aggregate(
            collect_set(when($"df" > JaccardDfCap, struct($"h1", $"h2", $"df"))),
            lit(0L), (acc, x) => acc + x.getField("df")).as("over_cap_rows"))
        .filter(size($"ds") <= JaccardDfCap) // post-cap universe
      // per-doc sizes over the POST-CAP gram sets (df=1 grams count here
      // but cannot pair)
      val sizes = census
        .select(explode($"ds").as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      val inter = census
        .filter(size($"ds") >= 2)
        .select(explode(expr(
          """flatten(transform(ds,
               x -> filter(transform(ds,
                      y -> named_struct('a_id', x, 'b_id', y)),
                    p -> p.a_id < p.b_id)))""")).as("p"))
        .groupBy($"p.a_id".as("a_id"), $"p.b_id".as("b_id"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(sizes.select($"doc_id".as("a_id"), $"n".as("na")), "a_id")
        .join(sizes.select($"doc_id".as("b_id"), $"n".as("nb")), "b_id")
        // exact-rational 6-dp rounding — see jaccard_pairs
        .select($"a_id", $"b_id",
          (floor(($"i" * 2000000L + ($"na" + $"nb" - $"i")).cast("double") /
            (($"na" + $"nb" - $"i") * 2L).cast("double")) / 1000000.0)
            .as("jaccard"))
        .orderBy($"jaccard".desc, $"a_id", $"b_id")
        .limit(50)
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS ts
        FROM documents),
      grams AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(len(ts) - 2, 1)),
          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' || ts[i+3]))) AS gram
        FROM toks),
      pruned AS (
        SELECT doc_id, gram FROM grams
        WHERE gram NOT IN (
          SELECT gram FROM grams GROUP BY gram HAVING count(*) > $JaccardDfCap)),
      sizes AS (SELECT doc_id, count(*) AS n FROM pruned GROUP BY 1),
      inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        FROM pruned a JOIN pruned b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT a_id, b_id,
        floor((i * 2000000 + (sa.n + sb.n - i))::DOUBLE
          / ((sa.n + sb.n - i) * 2)::DOUBLE) / 1000000.0 AS jaccard
      FROM inter
      JOIN sizes sa ON a_id = sa.doc_id
      JOIN sizes sb ON b_id = sb.doc_id
      ORDER BY jaccard DESC, a_id, b_id
      LIMIT 50
    """))

  private val minhashSig = QueryDef(
    "minhash_sig",
    (s, dir) => {
      import s.implicits._
      val withMh = Tables.documents(s, dir)
        .select($"doc_id", baseHashes($"text").as("hs"))
        .select($"doc_id", minhashArr($"hs").as("mh"))
      withMh.select($"doc_id" +:
        (0 until MinhashK / BandSize).map(b => bandCol($"mh", b).as(s"band_$b")): _*)
        .orderBy($"doc_id")
    },
    Some {
      val bands = (0 until MinhashK / BandSize)
        .map(b => s"${bandSql(b)} AS band_$b").mkString(",\n        ")
      s"""
      WITH h AS (
        SELECT doc_id, $baseHashesSql AS hs
        FROM (SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
              FROM documents))
      SELECT doc_id,
        $bands
      FROM h
      ORDER BY doc_id
    """
    })

  /** The cached (doc_id, band_idx, band_hash) bucket relation behind
    * [[minhashLshPairs]]. Callers that materialize the pair join should
    * `unpersist()` the returned frame afterwards (see
    * [[graft.queries.CurationOps.connectedComponents]]) — the cache exists
    * so minhashing runs once across the self-join's two sides, not to
    * outlive the query. */
  private[queries] def minhashBuckets(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    minhashBuckets(docs, None, None, withBands = true)

  /** [[minhashBuckets]] with an optional BUCKET-SIZE recall cap — the
    * same degenerate-group guard the jaccard census and semdedup carry: a
    * pathological band bucket (one boilerplate template shared by
    * millions of docs at 100 TB) otherwise explodes the downstream
    * self-join quadratically. `bucketCap = Some(c)` keeps each
    * `(band_idx, band_hash)` bucket's `c` LOWEST doc_ids (deterministic;
    * one row_number window over the keys the relation already shuffles
    * on) and drops the rest FROM PAIR FORMATION ONLY — a dropped entry's
    * doc still pairs through its other bands. `capObs` (required iff
    * capped) reports the recall cost before the filter:
    * `over_cap_entries` = band-entries dropped, `over_cap_buckets` =
    * buckets that hit the cap. Gate queries (`lsh_pairs`,
    * `dedup_clusters`) pass None — their oracles model the uncapped
    * join; the cap is the composed-pipeline scale path
    * ([[graft.api.Curation]]). */
  private[queries] def minhashBuckets(
      docs: org.apache.spark.sql.DataFrame,
      bucketCap: Option[Int],
      capObs: Option[org.apache.spark.sql.Observation],
      withBands: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    val withMh = docs
      .select($"doc_id", baseHashes($"text").as("hs"))
      .select($"doc_id", minhashArr($"hs").as("mh"))
    val bandArr = array((0 until MinhashK / BandSize).map(b => bandCol($"mh", b)): _*)
    // `withBands` rides the full band vector on every exploded row —
    // array<string> of the 4 concat_ws("|") band keys (each 4 longs
    // rendered as decimal text, ~60-80 bytes), so roughly 4-5× the
    // exploded row's single band-key payload: the PAIR join uses it to
    // emit each pair at its FIRST shared band only, replacing the
    // pair-level distinct() exchange with scan-side arithmetic (see
    // pairsFromBuckets). Connectivity consumers (star edges) and the
    // capped pipeline path don't read it, so they skip that extra
    // cache/shuffle payload.
    val cols =
      if (withBands)
        Seq($"doc_id", bandArr.as("bands"),
          posexplode(bandArr).as(Seq("band_idx", "band_hash")))
      else Seq($"doc_id", posexplode(bandArr).as(Seq("band_idx", "band_hash")))
    val exploded = withMh.select(cols: _*)
    bucketCap match {
      case None => exploded.cache()
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"band_idx", $"band_hash").orderBy($"doc_id")
        val ranked = exploded.withColumn("rn", row_number().over(w))
        val observed = capObs.fold(ranked)(o => ranked.observe(o,
          coalesce(sum(when($"rn" > cap, 1L)), lit(0L)).as("over_cap_entries"),
          // each over-cap bucket contributes exactly one rn == cap+1 row
          coalesce(sum(when($"rn" === cap + 1, 1L)), lit(0L))
            .as("over_cap_buckets")))
        val capped = observed.filter($"rn" <= cap).drop("rn").cache()
        // materialize the cache NOW, with one action: the downstream
        // self-join scans this relation twice in one stage, and two
        // concurrent first-scans would each run the observe (accumulator
        // metrics double). After count() both sides hit the populated
        // cache and the telemetry is exact.
        capped.count()
        capped
    }
  }

  /** The bucket self-join of [[minhashBuckets]]: distinct unordered
    * candidate pairs (a_id < b_id). Distinctness comes from the
    * FIRST-SHARED-BAND filter, not a pair-level distinct(): a pair
    * colliding in k bands appears k times in the join output, and both
    * rows carry their full band vectors, so "is this the smallest band
    * the two share?" is scan-side arithmetic that keeps exactly one
    * copy — the result SET is unchanged (every candidate shares >= 1
    * band; exactly one is smallest) while the exchange that re-shuffled
    * every pair just to drop duplicates disappears (215M pair rows at
    * sf10). Requires the UNCAPPED bucket relation: under a bucket-size
    * cap an entry can be dropped from its smallest shared band but
    * survive in a later one, and the filter would then drop the pair —
    * both callers (the `lsh_pairs` gate and the CcCheck validator) are
    * uncapped by contract. */
  /** Index of the FIRST band (smallest j) on which the two join sides
    * agree, as a Catalyst CASE chain; `n` when none do. `bandPair(j)`
    * supplies the two sides' band-j expressions. The exactly-once
    * pair-emission proof lives HERE, shared by both enumerators
    * ([[pairsFromBuckets]], SimhashOps): every candidate pair shares
    * ≥ 1 band and exactly one is smallest, so filtering the join on
    * `joined band_idx === firstSharedBand(...)` keeps exactly one copy
    * of each pair with no distinct() exchange. */
  private[queries] def firstSharedBand(n: Int)(
      bandPair: Int => (org.apache.spark.sql.Column, org.apache.spark.sql.Column))
      : org.apache.spark.sql.Column =
    (n - 1 to 0 by -1).foldLeft(lit(n): org.apache.spark.sql.Column) { (acc, j) =>
      val (a, b) = bandPair(j)
      when(a === b, lit(j)).otherwise(acc)
    }

  private[queries] def pairsFromBuckets(
      buckets: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nBands = MinhashK / BandSize
    val firstShared = firstSharedBand(nBands)(j =>
      (element_at(col("a.bands"), j + 1), element_at(col("b.bands"), j + 1)))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(col("a.band_idx") === firstShared)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
  }

  /** The CONNECTIVITY-equivalent star form of [[pairsFromBuckets]]: per
    * `(band_idx, band_hash)` bucket, one edge from every member to the
    * bucket's smallest doc_id instead of the full member clique. A
    * bucket's clique and its min-rooted star connect exactly the same
    * node set, so any union of buckets has IDENTICAL connected
    * components — but the edge count is Σ(n_bucket − 1) (linear in
    * bucket membership, ≤ docs × bands) instead of Σ C(n_bucket, 2)
    * (quadratic in bucket size). Consumers that need the
    * candidate PAIRS themselves (`lsh_pairs`, jaccard verification)
    * keep the clique join; consumers that only need connectivity
    * (components clustering) take this. Edges keep the a_id < b_id
    * orientation (the root IS the bucket min). The roots aggregate and
    * the member join shuffle on the same bucket key, so the join adds
    * no exchange beyond the aggregate's own. */
  private[queries] def starEdgesFromBuckets(
      buckets: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val roots = buckets.groupBy(col("band_idx"), col("band_hash"))
      .agg(min(col("doc_id")).as("a_id"))
    buckets.join(roots, Seq("band_idx", "band_hash"))
      .filter(col("doc_id") =!= col("a_id"))
      .select(col("a_id"), col("doc_id").as("b_id"))
      .distinct()
  }

  /** MinHash-LSH candidate pairs (a_id < b_id, distinct, unordered): docs
    * sharing any band bucket — explode bands → shuffle on the bucket key →
    * pair join. The signature relation is cached before the self-join (at
    * warehouse scale it would be a materialized signature table) so
    * minhashing runs once, not per side. Shared by the `lsh_pairs` gate
    * query and the connected-components clustering in [[CurationOps]].
    * NOTE: the internal bucket cache stays registered until the session's
    * CacheManager drops it — a caller that wants deterministic release
    * should use [[minhashBuckets]]/[[pairsFromBuckets]] directly and
    * unpersist after materializing. */
  private[queries] def minhashLshPairs(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    pairsFromBuckets(minhashBuckets(docs))

  /** SQL mirror of [[minhashLshPairs]]: CTEs `h`, `buckets`, `pairs` —
    * `pairs` holds the distinct (a_id, b_id) candidate set. */
  private[queries] val minhashLshPairsSql: String = {
    val bands = (0 until MinhashK / BandSize)
      .map(b => s"(${b}, ${bandSql(b)})").mkString(", ")
    s"""h AS (
        SELECT doc_id, $baseHashesSql AS hs
        FROM (SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
              FROM documents)),
      buckets AS (SELECT doc_id, unnest([$bands]) AS band FROM h),
      pairs AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.doc_id < b.doc_id)"""
  }

  private val lshPairs = QueryDef(
    "lsh_pairs",
    (s, dir) => {
      import s.implicits._
      minhashLshPairs(Tables.documents(s, dir)).orderBy($"a_id", $"b_id")
    },
    Some(s"""
      WITH $minhashLshPairsSql
      SELECT a_id, b_id FROM pairs
      ORDER BY a_id, b_id
    """))

  /** V4 — BM25 scoring of a fixed query against the corpus, with IDF from
    * corpus stats (two tiny aggregates broadcast back over the scan).
    * Reference: qdrant_service.py:23,80 (Qdrant/bm25 + IDF modifier). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val QueryTerms = Seq("filter", "window", "join")

  /** BM25 score of the fixed [[QueryTerms]] query for EVERY document in
    * `docsIn` (doc_id, text): returns `(doc_id, bm25)` with the score
    * rounded at 6 dp, zero-score docs included — callers filter/rank.
    * Corpus stats (N, avgdl, per-term df) always come from the FULL input
    * relation, so a candidate pre-filter downstream (e.g. `hybrid_rrf`'s
    * MatchText leg) restricts candidates without shifting the IDF model.
    *
    * Term frequencies via explode → filter → pivot-style agg: stays in
    * WholeStageCodegen end to end (a per-term `filter(toks, ...)` HOF
    * evaluates interpreted lambdas per token — 15 s at sf0.1 for the
    * same answer). The explode is narrow; the groupBy shuffles only
    * (doc, 3 counters) partials. Stats are ONE partial-aggregated pass
    * broadcast back over the scan — never a global window (which would
    * funnel the corpus through a single partition at scale). */
  def bm25Scores(docsIn: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import docsIn.sparkSession.implicits._
    val docs = docsIn
      .select($"doc_id", wordTokens($"text").as("toks"))
      .select($"doc_id", size($"toks").cast("double").as("dl"), $"toks")
      .cache() // two consumers: TF explode + final scoring join
    val tfAggs = QueryTerms.map(t =>
      sum(when($"tok" === t, 1.0).otherwise(0.0)).as(s"tf_$t"))
    val tf = docs
      .select($"doc_id", explode($"toks").as("tok"))
      .filter($"tok".isin(QueryTerms: _*))
      .groupBy($"doc_id")
      .agg(tfAggs.head, tfAggs.tail: _*)
    val withTf = QueryTerms.foldLeft(
      docs.drop("toks").join(tf, Seq("doc_id"), "left")) { (df, t) =>
      df.withColumn(s"tf_$t", coalesce(col(s"tf_$t"), lit(0.0)))
    }
    val stats = withTf.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg($"dl").as("avgdl") +:
        QueryTerms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1.0).otherwise(0.0)).as(s"df_$t")): _*)
    val withIdf = withTf.crossJoin(broadcast(stats))
    val score = QueryTerms.map { t =>
      val idf = log((col("n_docs") - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5) + 1.0)
      idf * (col(s"tf_$t") * (Bm25K1 + 1.0)) /
        (col(s"tf_$t") + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    withIdf.select($"doc_id", round(score, 6).as("bm25"))
  }

  private val bm25Score = QueryDef(
    "bm25_score",
    (s, dir) => {
      import s.implicits._
      bm25Scores(Tables.documents(s, dir))
        .filter($"bm25" > 0)
        .orderBy($"bm25".desc, $"doc_id")
        .limit(30)
    },
    Some {
      val toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)"
      val tfCols = QueryTerms.map(t =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf_$t").mkString(",\n          ")
      val dfCols = QueryTerms.map(t =>
        s"sum(CASE WHEN tf_$t > 0 THEN 1.0 ELSE 0.0 END) OVER () AS df_$t").mkString(",\n          ")
      val scoreExpr = QueryTerms.map { t =>
        s"""(ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0)
           * (tf_$t * (${Bm25K1} + 1.0))
           / (tf_$t + ${Bm25K1} * (1.0 - ${Bm25B} + ${Bm25B} * dl / avgdl)))"""
      }.mkString(" + ")
      s"""
      WITH d AS (
        SELECT doc_id, $toks AS toks FROM documents),
      d2 AS (
        SELECT doc_id, len(toks)::DOUBLE AS dl,
          $tfCols
        FROM d),
      st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM d2),
      d3 AS (
        SELECT *,
          $dfCols
        FROM d2, st)
      SELECT doc_id, round($scoreExpr, 6) AS bm25
      FROM d3
      WHERE round($scoreExpr, 6) > 0
      ORDER BY bm25 DESC, doc_id
      LIMIT 30
    """
    })

  // ----------------------------------------------------------------------
  // dedup_incremental
  // ----------------------------------------------------------------------

  /** Modulus splitting the fixture into "existing corpus" (doc_id % 5 ≠ 0)
    * and "incoming shard" (doc_id % 5 = 0) — a stand-in for the real
    * boundary between an indexed corpus and a new crawl delivery. */
  val IncrMod = 5L

  /** Incremental dedup: flag each INCOMING document against the EXISTING
    * corpus — exact (content fingerprint seen before) and near (shares
    * any MinHash band bucket with an existing doc) — without ever
    * re-pairing the corpus against itself. This is how dedup actually
    * runs at 100 TB: the corpus's fingerprint and band tables are
    * materialized once at write time (here derived in-query from the
    * split), and each new shard only probes them; the corpus-vs-corpus
    * work of `dedup_exact`/`lsh_pairs` is never repeated.
    *
    * Plan shape: two key-hash semi-probes (fingerprint key, band-bucket
    * key) of shard-sized relations against corpus-sized build sides —
    * both equi-joins, no pair formation at all; the flags come back via
    * left joins on marker relations so every incoming doc reports a row
    * (a kept doc is evidence too). Oracle mirrors the split and both
    * probes with plain IN-subqueries. */
  private val dedupIncremental = QueryDef(
    "dedup_incremental",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val inc = docs.filter($"doc_id" % IncrMod === 0L)
      val ex = docs.filter($"doc_id" % IncrMod =!= 0L)
      // exact probe: incoming fingerprints seen in the existing corpus
      val exFp = ex.select(fingerprint($"text").as("fp")).distinct()
      val dupExact = inc.select($"doc_id", fingerprint($"text").as("fp"))
        .join(exFp, Seq("fp"), "left_semi")
        .select($"doc_id").withColumn("de", lit(true))
      // near probe: incoming band buckets seen in the existing corpus
      val exBands = bandRelation(ex).select($"band_idx", $"band_hash").distinct()
      val dupNear = bandRelation(inc)
        .join(exBands, Seq("band_idx", "band_hash"), "left_semi")
        .select($"doc_id").distinct().withColumn("dn", lit(true))
      inc.select($"doc_id")
        .join(dupExact, Seq("doc_id"), "left")
        .join(dupNear, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"de", lit(false)).as("dup_exact"),
          coalesce($"dn", lit(false)).as("dup_near"))
        .orderBy($"doc_id")
    },
    Some {
      val bandExprs = (0 until MinhashK / BandSize)
        .map(b => s"${bandSql(b)}").mkString(", ")
      s"""
      WITH inc AS (
        SELECT doc_id, text FROM documents WHERE doc_id % $IncrMod = 0),
      ex AS (
        SELECT doc_id, text FROM documents WHERE doc_id % $IncrMod <> 0),
      exfp AS (
        SELECT DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
        FROM ex),
      incb AS (
        SELECT doc_id, unnest(generate_series(0, ${MinhashK / BandSize - 1})) AS band_idx,
          unnest([$bandExprs]) AS band_hash
        FROM (SELECT doc_id, $baseHashesSql AS hs
              FROM (SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
                    FROM inc))),
      exb AS (
        SELECT DISTINCT band_idx, band_hash
        FROM (
          SELECT doc_id, unnest(generate_series(0, ${MinhashK / BandSize - 1})) AS band_idx,
            unnest([$bandExprs]) AS band_hash
          FROM (SELECT doc_id, $baseHashesSql AS hs
                FROM (SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
                      FROM ex)))),
      dn AS (
        SELECT DISTINCT i.doc_id
        FROM incb i JOIN exb e USING (band_idx, band_hash))
      SELECT i.doc_id,
        md5(regexp_replace(lower(i.text), '[^a-z0-9]', '', 'g')) IN (SELECT fp FROM exfp) AS dup_exact,
        i.doc_id IN (SELECT doc_id FROM dn) AS dup_near
      FROM inc i
      ORDER BY i.doc_id
    """
    })
}
