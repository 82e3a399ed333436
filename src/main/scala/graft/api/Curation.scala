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
      /** LSH bucket-size recall cap for the near-dup stage (entries kept
        * per band bucket; `None` = uncapped). The default sits far above
        * any healthy bucket — it exists so ONE degenerate boilerplate
        * bucket at 100 TB cannot explode the candidate self-join
        * quadratically. Its recall cost is surfaced per run by
        * [[curateWithReport]] (`over_cap_entries`/`over_cap_buckets`). */
      lshBucketCap: Option[Int] = Some(DefaultLshBucketCap),
      /** Path of a persisted incremental simhash census
        * ([[graft.search.SimhashCensusIndex]]) maintained by the ingest
        * side. When set, [[curateWithReport]] reads the FOLDED census and
        * surfaces the corpus's standing near-dup pressure (involved docs,
        * pair endpoints, hamming-0 docs) as a telemetry row — the batch
        * `simhash_dedup_stats` signal without re-running the corpus×corpus
        * band join inside the pipeline (VERDICT r16 item 8). Telemetry
        * only: the drop decision stays with the near-dup cluster stage. */
      simhashCensusPath: Option[String] = None,
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
      packShards: Long = CurationOps.PackShards,
      /** Rows×dims bound on the eval matrix the semantic stage may
        * collect to the driver ([[graft.queries.VectorOps.MaxEvalRefCells]]
        * — ~32 MB of doubles); an eval split past it takes the broadcast
        * anti-join shape instead of OOMing the driver. Overridable here
        * so tests (and memory-constrained drivers) can force the switch. */
      maxEvalRefCells: Long = graft.queries.VectorOps.MaxEvalRefCells)

  /** See [[Config.lshBucketCap]]. */
  val DefaultLshBucketCap = 4096

  /** One row of [[curateWithReport]]'s per-stage recall-cost report.
    * `rowsExcluded` is the stage's drop count; `capExcluded` carries any
    * recall-CAP telemetry the stage's kernel reported (entries a bounded
    * candidate structure excluded — a recall cost invisible in the row
    * counts, since a capped entry's doc usually survives the stage). */
  final case class StageReport(stage: String, rowsIn: Long, rowsOut: Long,
      capExcluded: Map[String, Long] = Map.empty) {
    def rowsExcluded: Long = rowsIn - rowsOut
    override def toString: String =
      f"$stage%-24s in=$rowsIn%8d out=$rowsOut%8d dropped=$rowsExcluded%8d" +
        (if (capExcluded.isEmpty) ""
         else capExcluded.toSeq.sorted.map { case (k, v) => s" $k=$v" }.mkString)
  }

  /** Curate `docs` (schema: doc_id, text, lang, ...) into packed training
    * rows (doc_id, lang, text, shard, n_tok, pack_id).
    *
    * @param evalDocs optional held-out benchmark docs (doc_id, text) —
    *                 training docs sharing any 8-gram with them are
    *                 dropped (decontamination)
    */
  def curate(docs: DataFrame, evalDocs: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame =
    build(docs, evalDocs, cfg, (_, df) => df, (_, _) => ())

  /** [[curate]] plus the per-stage recall-cost report (VERDICT r9 item
    * 7): every ENABLED stage's rows in/out and any cap telemetry its
    * kernel reported, in pipeline order — the one place a 100 TB
    * operator reads what each stage (and each recall cap) cost this run.
    *
    * This is the AUDIT verb: it materializes (cache + count) each stage
    * boundary, one extra counting pass per stage, where [[curate]] stays
    * one lazy end-to-end plan. Run it on a sample or when the audit is
    * worth a bounded multiple of the corpus scan; the returned frame is
    * the (cached) final stage. */
  def curateWithReport(docs: DataFrame, evalDocs: Option[DataFrame] = None,
      cfg: Config = Config()): (DataFrame, Seq[StageReport]) = {
    val report = scala.collection.mutable.ArrayBuffer.empty[StageReport]
    val caps = scala.collection.mutable.Map.empty[String, Map[String, Long]]
    var prev: DataFrame = docs.cache()
    var prevN = prev.count()
    def chk(name: String, df: DataFrame): DataFrame =
      if (df eq prev) df // stage disabled: nothing ran, nothing to report
      else {
        val cached = df.cache()
        val n = cached.count()
        report += StageReport(name, prevN, n, caps.getOrElse(name, Map.empty))
        prev.unpersist()
        prev = cached
        prevN = n
        cached
      }
    val out = build(docs, evalDocs, cfg, chk,
      (stage, m) => caps(stage) = m)
    // standing near-dup pressure from the ingest side's incremental
    // simhash census (build-once/append-per-shard; see Config doc).
    // Report-mode only by construction: curate() never pays this read.
    cfg.simhashCensusPath.foreach { p =>
      import org.apache.spark.sql.functions.{coalesce, count, lit, sum, when}
      val spark = docs.sparkSession
      val row = graft.search.SimhashCensusIndex.census(spark, p)
        .agg(count(lit(1)).as("docs"),
          coalesce(sum(org.apache.spark.sql.functions.col("n_dups")), lit(0L)),
          count(when(org.apache.spark.sql.functions.col("min_hamming") === 0, 1)))
        .first()
      val censusDocs = row.getLong(0)
      report += StageReport("simhash_census", censusDocs, censusDocs,
        Map("near_dup_docs" -> censusDocs,
          "pair_endpoints" -> row.getLong(1),
          "hamming0_docs" -> row.getLong(2)))
    }
    (out, report.toSeq)
  }

  private def build(docs: DataFrame, evalDocs: Option[DataFrame],
      cfg: Config, chk: (String, DataFrame) => DataFrame,
      onCap: (String, Map[String, Long]) => Unit): DataFrame = {
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
    val exact = chk("exact_dedup",
      docs.join(keepers, Seq("doc_id"), "left_semi"))

    // 2. near-dup clusters: keep each cluster's min id (iterative CC)
    val near = chk("neardup_clusters",
      if (!cfg.dedupNear) exact
      else {
        val own = CurationOps.connectedComponents(exact, cfg.lshBucketCap,
            m => onCap("neardup_clusters", m))
          .filter($"doc_id" === $"cluster_id").select($"doc_id")
        exact.join(own, Seq("doc_id"), "left_semi")
      })

    // 2b. optional substring dedup: rewrite every doc with duplicated
    // 8-token spans removed (global first occurrence kept), dropping docs
    // the rewrite empties — the doc-level dedups above can't catch
    // boilerplate runs shared between otherwise-distinct docs
    val despanned = chk("drop_dup_spans",
      if (!cfg.dropDupSpans) near
      else near.drop("text")
        .join(graft.queries.CorpusOps.dropSpanRewrite(near)
          .filter($"n_kept" > 0)
          .select($"doc_id", $"clean_text".as("text")), Seq("doc_id")))

    // 3. decontamination: drop docs sharing any 8-gram with the eval set
    val clean = chk("decontaminate", evalDocs.fold(despanned) { ev =>
      def grams(df: DataFrame) = df.select($"doc_id",
        explode(graft.GraftFunctions.columnOf(graft.functions.WordNgrams(
          graft.GraftFunctions.exprOf($"text"), CurationOps.DecontamN)))
          .as("gram"))
      val evGrams = grams(ev).select($"gram").distinct()
      val contaminated = grams(despanned).join(evGrams, Seq("gram"))
        .select($"doc_id").distinct()
      despanned.join(contaminated, Seq("doc_id"), "left_anti")
    })

    // 3b. optional SEMANTIC decontamination: drop docs whose embedding
    // reaches cosine >= tau to any eval doc — catches paraphrased
    // contamination that shares no 8-gram. A benchmark-sized eval side
    // (rows × 384 dims within VectorOps.MaxEvalRefCells) collects its
    // embeddings into ONE BestMatchExpr reference object and the stage
    // is a pure scan filter (no join, no shuffle — the
    // `decontaminate_semantic` shape); an eval side PAST the cap would
    // OOM the driver collect, so it automatically takes the broadcast
    // anti-join form instead (same kept set — CurationPipelineSpec pins
    // the parity and the report telemetry).
    def embedCol = graft.GraftFunctions.columnOf(
      graft.functions.EmbedText(graft.GraftFunctions.exprOf($"text")))
    val semClean = chk("semantic_decontaminate",
      (cfg.semanticDecontamTau, evalDocs) match {
      case (Some(tau), Some(ev)) =>
        // null-embedding eval docs (e.g. null text) can't contaminate
        // anything — drop them HERE so both shapes see the same reference
        // set (the kernel collect would NPE on a null array otherwise)
        val evEmbDf = ev.select($"doc_id".as("eval_id"), embedCol.as("embedding"))
          .filter($"embedding".isNotNull)
        val evCount = evEmbDf.count()
        if (evCount == 0) clean
        else if (evCount * graft.functions.EmbedText.Dim.toLong
            <= cfg.maxEvalRefCells) {
          val evEmb = evEmbDf.collect()
            .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
            .sortBy(_._1).toSeq
          // coalesce: a doc whose OWN embedding is null (null text) gets a
          // NULL sim from the null-propagating kernel — a bare `< tau`
          // would DROP it while the fallback's `cosine >= tau` never marks
          // it contaminated and KEEPS it; both shapes must keep it
          clean.filter(coalesce(graft.GraftFunctions.columnOf(
            graft.functions.BestMatchExpr(
              graft.GraftFunctions.exprOf(embedCol),
              evEmb.map(_._1), evEmb.map(_._2))).getField("sim"),
            lit(-2d)) < tau)
        } else {
          // surface the shape switch in the run report (CapSpec asserts)
          onCap("semantic_decontaminate", Map("eval_fallback_rows" -> evCount))
          // any-hit suffices for a drop — no argmax needed, just the
          // contaminated-id set (bounded by the corpus, not the pairs)
          val contaminated = clean
            .select($"doc_id", embedCol.as("emb"))
            .crossJoin(broadcast(evEmbDf))
            .filter(graft.functions.VectorFunctions
              .cosine($"emb", $"embedding") >= tau)
            .select($"doc_id").distinct()
          clean.join(contaminated, Seq("doc_id"), "left_anti")
        }
      case _ => clean
    })

    // 4. per-row quality gates (pure scan filters); the Gopher rule
    // battery is opt-in because its constants are corpus-tuned
    val ruleFiltered = chk("quality_gates", semClean
      .filter(TextFunctions.qualityScore($"text") >= cfg.minQuality)
      .filter(CurationOps.repetitionCol($"text") <= cfg.maxRepetition))
    val gated = chk("gopher_rules",
      if (!cfg.gopherRules) ruleFiltered
      else ruleFiltered.filter(graft.queries.CorpusOps.gopherKeepCol($"text")))

    // 4b. optional corpus-statistical gate: unigram LM surprisal (one
    // extra vocabulary aggregate + token-keyed join over the survivors —
    // the model is fit on the gated corpus itself, CCNet-style)
    val surpFiltered = chk("lm_surprisal", cfg.maxSurprisal.fold(gated) { maxNll =>
      val ok = graft.queries.TextOps
        .lmScores(gated.select($"doc_id", $"text"))
        .filter($"avg_nll" <= maxNll).select($"doc_id")
      gated.join(ok, Seq("doc_id"), "left_semi")
    })

    // 4c. optional quality-weighted importance sampling: P(keep) = the
    // quality score, hash-decided (`weighted_sample` semantics) — the
    // soft counterpart of the hard minQuality gate above
    val filtered = chk("quality_weighted_sample",
      if (!cfg.qualityWeighted) surpFiltered
      else surpFiltered.filter(
        CurationOps.qualityWeightedKeep($"doc_id", $"text")))

    // 5. PII masking (after the filters so quality scores judged the
    // original text; placeholders count as tokens downstream). The
    // production path is the native single-pass kernel — byte-identical
    // to the gate row's regexp_replace pair (PiiScrubKernelSpec fuzz
    // proof) but without java.util.regex backtracking, the cost that put
    // the regex form at ~15x DuckDB in the sf1 bench
    val scrubbed = chk("pii_scrub",
      if (!cfg.scrubPii) filtered
      else filtered.withColumn("text",
        graft.GraftFunctions.columnOf(graft.functions.PiiScrubExpr(
          graft.GraftFunctions.exprOf($"text")))))

    // 6. stratified rebalance (pure scan filter); unlisted languages keep
    // cfg.sampleDefaultRate/1000 — lossless by default (see Config)
    val sampled = chk("stratified_sample", cfg.sampleRates.fold(scrubbed)(r =>
      scrubbed.filter(CurationOps.stratSampleKeep($"doc_id", $"lang", r,
        cfg.sampleDefaultRate))))

    // 6b. optional domain-mixture rebalance to a target source mix
    // (`mix_sources` semantics: allowlist + downsample-only reweight);
    // requires a `source` column
    val mixed = chk("mix_sources", cfg.mixTargets.fold(sampled)(t =>
      CurationOps.mixSourceFilter(sampled, t)))

    // 6c. optional chunk-to-context rewrite (`chunk_docs` semantics):
    // each surviving document becomes its overlapping context-window
    // chunks; chunk rows get a namespaced id so packing sees unique keys
    val prepacked =
      if (!cfg.chunkToContext) mixed.select($"doc_id", $"lang", $"text")
      else chk("chunk_docs", graft.queries.CorpusOps
        .chunkRows(mixed.select($"doc_id", $"lang", $"text"), carry = Seq("lang"))
        .select(
          ($"doc_id" * graft.queries.CorpusOps.ChunkIdBase + $"chunk_id")
            .as("doc_id"),
          $"lang", $"chunk_text".as("text")))

    // 7. sequence packing
    chk("pack_sequences",
      CurationOps.packColumns(prepacked, budget = cfg.packBudget,
          shards = cfg.packShards)
        .select($"doc_id", $"lang", $"text", $"shard", $"n_tok", $"pack_id"))
  }
}
