package graft.api

import graft.functions.TextFunctions
import graft.queries.CurationOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: compose the engine's curation
  * operators into the standard corpus-preparation pipeline
  *
  * {{{
  * documents ─ exact dedup ─ near-dup clusters (keep cluster min)
  *           ─ substring dedup (opt-in span rewrite)
  *           ─ decontaminate (vs a held-out eval set)
  *           ─ semantic decontaminate (opt-in embedding-cosine gate)
  *           ─ quality + repetition filters ─ Gopher rules (opt-in)
  *           ─ LM surprisal gate (opt-in)
  *           ─ quality-weighted sample (opt-in) ─ PII scrub
  *           ─ stratified sample ─ domain-mixture rebalance (opt-in)
  *           ─ chunk to context windows (opt-in) ─ sequence packing
  * }}}
  *
  * Every stage is deterministic (hash-derived, no RNG), so two runs over
  * the same corpus produce byte-identical output — the auditability
  * property curated training sets need. All stages are lazy column plans
  * except the near-dup clustering, which runs its bounded iterative jobs
  * when invoked (declared — connected components has no one-shot plan).
  *
  * Each stage's math is the corresponding oracle-checked gate query
  * (`dedup_exact`, `dedup_clusters`, `decontaminate`, `quality_score`,
  * `repetition_score`, `gopher_quality`, `lm_score`, `weighted_sample`,
  * `pii_scrub`, `sample_stratified`, `mix_sources`, `chunk_docs`,
  * `pack_sequences`) — this object only composes them.
  */
object Curation {

  /** @param sampleRates per-language keep rates out of 1000 for the
    *        stratified-rebalance stage, `None` = no sampling. Languages
    *        NOT listed keep `sampleDefaultRate` out of 1000 — the default
    *        1000 keeps them ALL, so the default pipeline is lossless for
    *        languages outside the rate table (set 0 to drop unlisted
    *        strata, the `sample_stratified` gate query's semantics).
    */
  final case class Config(
      dedupNear: Boolean = true,
      dropDupSpans: Boolean = false,
      /** Embedding-cosine decontamination threshold vs `evalDocs` —
        * `Some(τ)` drops training docs whose [[graft.functions.EmbedText]]
        * embedding reaches cosine ≥ τ to ANY eval doc (the
        * `decontaminate_semantic` operator as a pipeline stage, catching
        * paraphrased contamination the 8-gram stage cannot). `None` (the
        * default) skips the stage. */
      semanticDecontamTau: Option[Double] = None,
      minQuality: Double = 0.3,
      maxRepetition: Double = 0.5,
      gopherRules: Boolean = false,
      maxSurprisal: Option[Double] = None,
      qualityWeighted: Boolean = false,
      scrubPii: Boolean = true,
      sampleRates: Option[Seq[(String, Long)]] = Some(CurationOps.StratRates),
      sampleDefaultRate: Long = 1000L,
      mixTargets: Option[Seq[(String, Long)]] = None,
      chunkToContext: Boolean = false,
      packBudget: Long = CurationOps.PackBudget,
      packShards: Long = CurationOps.PackShards)

  /** Curate `docs` (schema: doc_id, text, lang, ...) into packed training
    * rows (doc_id, lang, text, shard, n_tok, pack_id).
    *
    * @param evalDocs optional held-out benchmark docs (doc_id, text) —
    *                 training docs sharing any 8-gram with them are
    *                 dropped (decontamination)
    */
  def curate(docs: DataFrame, evalDocs: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {
    import docs.sparkSession.implicits._
    // Opting into the semantic gate without eval docs would silently run
    // no decontamination at all — refuse loudly instead.
    require(cfg.semanticDecontamTau.isEmpty || evalDocs.nonEmpty,
      "semanticDecontamTau is set but evalDocs is None: the semantic " +
        "decontamination stage needs the eval corpus to screen against")

    // 1. exact dedup: keeper = min doc_id per content fingerprint
    val keepers = docs
      .groupBy(TextFunctions.fingerprint($"text").as("fp"))
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id")
    val exact = docs.join(keepers, Seq("doc_id"), "left_semi")

    // 2. near-dup clusters: keep each cluster's min id (iterative CC)
    val near =
      if (!cfg.dedupNear) exact
      else {
        val own = CurationOps.connectedComponents(exact)
          .filter($"doc_id" === $"cluster_id").select($"doc_id")
        exact.join(own, Seq("doc_id"), "left_semi")
      }

    // 2b. optional substring dedup: rewrite every doc with duplicated
    // 8-token spans removed (global first occurrence kept), dropping docs
    // the rewrite empties — the doc-level dedups above can't catch
    // boilerplate runs shared between otherwise-distinct docs
    val despanned =
      if (!cfg.dropDupSpans) near
      else near.drop("text")
        .join(graft.queries.CorpusOps.dropSpanRewrite(near)
          .filter($"n_kept" > 0)
          .select($"doc_id", $"clean_text".as("text")), Seq("doc_id"))

    // 3. decontamination: drop docs sharing any 8-gram with the eval set
    val clean = evalDocs.fold(despanned) { ev =>
      def grams(df: DataFrame) = df.select($"doc_id",
        explode(graft.GraftFunctions.columnOf(graft.functions.WordNgrams(
          graft.GraftFunctions.exprOf($"text"), CurationOps.DecontamN)))
          .as("gram"))
      val evGrams = grams(ev).select($"gram").distinct()
      val contaminated = grams(despanned).join(evGrams, Seq("gram"))
        .select($"doc_id").distinct()
      despanned.join(contaminated, Seq("doc_id"), "left_anti")
    }

    // 3b. optional SEMANTIC decontamination: drop docs whose embedding
    // reaches cosine >= tau to any eval doc — catches paraphrased
    // contamination that shares no 8-gram. The eval side is
    // benchmark-sized, so its embeddings collect into ONE BestMatchExpr
    // reference object and the stage is a pure scan filter (no join, no
    // shuffle — the `decontaminate_semantic` shape).
    val semClean = (cfg.semanticDecontamTau, evalDocs) match {
      case (Some(tau), Some(ev)) =>
        val evEmb = ev
          .select($"doc_id", graft.GraftFunctions.columnOf(
            graft.functions.EmbedText(
              graft.GraftFunctions.exprOf($"text"))).as("e"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
          .sortBy(_._1).toSeq
        if (evEmb.isEmpty) clean
        else clean.filter(graft.GraftFunctions.columnOf(
          graft.functions.BestMatchExpr(
            graft.GraftFunctions.exprOf(graft.GraftFunctions.columnOf(
              graft.functions.EmbedText(graft.GraftFunctions.exprOf($"text")))),
            evEmb.map(_._1), evEmb.map(_._2))).getField("sim") < tau)
      case _ => clean
    }

    // 4. per-row quality gates (pure scan filters); the Gopher rule
    // battery is opt-in because its constants are corpus-tuned
    val ruleFiltered = semClean
      .filter(TextFunctions.qualityScore($"text") >= cfg.minQuality)
      .filter(CurationOps.repetitionCol($"text") <= cfg.maxRepetition)
    val gated =
      if (!cfg.gopherRules) ruleFiltered
      else ruleFiltered.filter(graft.queries.CorpusOps.gopherKeepCol($"text"))

    // 4b. optional corpus-statistical gate: unigram LM surprisal (one
    // extra vocabulary aggregate + token-keyed join over the survivors —
    // the model is fit on the gated corpus itself, CCNet-style)
    val surpFiltered = cfg.maxSurprisal.fold(gated) { maxNll =>
      val ok = graft.queries.TextOps
        .lmScores(gated.select($"doc_id", $"text"))
        .filter($"avg_nll" <= maxNll).select($"doc_id")
      gated.join(ok, Seq("doc_id"), "left_semi")
    }

    // 4c. optional quality-weighted importance sampling: P(keep) = the
    // quality score, hash-decided (`weighted_sample` semantics) — the
    // soft counterpart of the hard minQuality gate above
    val filtered =
      if (!cfg.qualityWeighted) surpFiltered
      else surpFiltered.filter(
        CurationOps.qualityWeightedKeep($"doc_id", $"text"))

    // 5. PII masking (per-row regex, after the filters so quality scores
    // judged the original text; placeholders count as tokens downstream)
    val scrubbed =
      if (!cfg.scrubPii) filtered
      else filtered.withColumn("text",
        regexp_replace(regexp_replace($"text",
          graft.queries.TextOps.EmailRe, "<EMAIL>"),
          graft.queries.TextOps.PhoneRe, "<PHONE>"))

    // 6. stratified rebalance (pure scan filter); unlisted languages keep
    // cfg.sampleDefaultRate/1000 — lossless by default (see Config)
    val sampled = cfg.sampleRates.fold(scrubbed)(r =>
      scrubbed.filter(CurationOps.stratSampleKeep($"doc_id", $"lang", r,
        cfg.sampleDefaultRate)))

    // 6b. optional domain-mixture rebalance to a target source mix
    // (`mix_sources` semantics: allowlist + downsample-only reweight);
    // requires a `source` column
    val mixed = cfg.mixTargets.fold(sampled)(t =>
      CurationOps.mixSourceFilter(sampled, t))

    // 6c. optional chunk-to-context rewrite (`chunk_docs` semantics):
    // each surviving document becomes its overlapping context-window
    // chunks; chunk rows get a namespaced id so packing sees unique keys
    val prepacked =
      if (!cfg.chunkToContext) mixed.select($"doc_id", $"lang", $"text")
      else graft.queries.CorpusOps
        .chunkRows(mixed.select($"doc_id", $"lang", $"text"), carry = Seq("lang"))
        .select(
          ($"doc_id" * graft.queries.CorpusOps.ChunkIdBase + $"chunk_id")
            .as("doc_id"),
          $"lang", array_join($"chunk", " ").as("text"))

    // 7. sequence packing
    CurationOps.packColumns(prepacked, budget = cfg.packBudget,
        shards = cfg.packShards)
      .select($"doc_id", $"lang", $"text", $"shard", $"n_tok", $"pack_id")
  }
}
