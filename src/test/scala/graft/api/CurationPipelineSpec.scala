package graft.api

import graft.{SparkSpec, Tables}
import graft.queries.CurationOps
import org.apache.spark.sql.functions._

/** End-to-end curation pipeline invariants on the sf0.001 corpus: every
  * stage's contract must hold on the composed output, and the whole run
  * must be deterministic. */
class CurationPipelineSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("curated output honors every stage contract") {
    import spark.implicits._
    val docs = Tables.documents(spark, SfDir).select($"doc_id", $"text", $"lang")
    val eval = docs.filter($"doc_id" % CurationOps.DecontamEvalMod === 0)
      .select($"doc_id", $"text")
    val out = Curation.curate(docs, Some(eval)).cache()
    val rows = out.collect()
    assert(rows.nonEmpty, "pipeline must keep a non-empty corpus")

    // exact dedup: output fingerprints are unique
    val nFp = out.select(graft.functions.TextFunctions.fingerprint($"text"))
      .distinct().count()
    assert(nFp == rows.length, "duplicate content fingerprints survived")

    // near dedup: every kept doc is its own cluster minimum, where
    // clusters are computed on the exact-deduped corpus (as the pipeline
    // does — exact twins share text, hence bands, so connectivity is
    // unaffected by dropping them; only the surviving ids matter)
    val exactKeepers = docs
      .groupBy(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
      .agg(min($"doc_id").as("doc_id")).select($"doc_id")
    val exactDf = docs.join(exactKeepers, Seq("doc_id"), "left_semi")
    val clusters = CurationOps.connectedComponents(exactDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val keptIds = rows.map(_.getLong(0)).toSet
    keptIds.foreach { id =>
      assert(clusters(id) == id,
        s"doc $id kept but its near-dup cluster min is ${clusters(id)}")
    }

    // decontamination: no kept doc shares an 8-gram with the eval set
    def grams(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(CurationOps.DecontamN)
        .filter(_.length == CurationOps.DecontamN).map(_.mkString(" ")).toSet
    }
    val evGrams = eval.collect().flatMap(r => grams(r.getString(1))).toSet
    rows.foreach { r =>
      assert(!grams(r.getString(2)).exists(evGrams.contains),
        s"doc ${r.getLong(0)} is contaminated but survived")
    }

    // quality/repetition gates
    val q = out.select($"doc_id",
      graft.functions.TextFunctions.qualityScore($"text").as("q"),
      CurationOps.repetitionCol($"text").as("rep")).collect()
    q.foreach { r =>
      assert(r.getDouble(1) >= 0.3, s"doc ${r.getLong(0)} below quality floor")
      assert(r.getDouble(2) <= 0.5, s"doc ${r.getLong(0)} above repetition cap")
    }

    // packing: pack ids recompute from shard + id-ordered running totals
    rows.groupBy(_.getLong(3)).foreach { case (shard, ds) =>
      var cum = 0L
      ds.sortBy(_.getLong(0)).foreach { r =>
        val expected = shard * CurationOps.PackIdBase + cum / CurationOps.PackBudget
        assert(r.getLong(5) == expected,
          s"doc ${r.getLong(0)}: pack ${r.getLong(5)} != $expected")
        cum += r.getLong(4)
      }
    }
    out.unpersist()
  }

  test("semantic decontamination catches a paraphrase the 8-gram stage misses") {
    import spark.implicits._
    val evalText = "quantum error correction requires stabilizer codes over " +
      "many physical qubits to protect one logical qubit from decoherence"
    // the paraphrase: same word BAG, shuffled order — shares NO 8-gram
    // with the eval doc, but EmbedText (unigram + char-3-gram features)
    // scores it near-identical
    val shuffled = new scala.util.Random(5)
      .shuffle(evalText.split(" ").toList).mkString(" ")
    val unrelated = (1 to 30).map(i =>
      s"daily operations report number $i covering routine maintenance " +
        s"schedules inventory levels and staffing rotations for site $i").toList
    val docs = ((1L, shuffled, "en") +:
      unrelated.zipWithIndex.map { case (t, i) => (10L + i, t, "en") })
      .toDF("doc_id", "text", "lang")
    val eval = Seq((1000L, evalText)).toDF("doc_id", "text")

    // sanity: the paraphrase shares no 8-gram (the n-gram stage keeps it)
    def grams(t: String): Set[String] = t.toLowerCase
      .split("[^a-z0-9]+").filter(_.nonEmpty)
      .sliding(CurationOps.DecontamN)
      .filter(_.length == CurationOps.DecontamN).map(_.mkString(" ")).toSet
    assert(!grams(shuffled).exists(grams(evalText).contains),
      "fixture broken: paraphrase shares an 8-gram")

    val cfg = Curation.Config(sampleRates = None, dedupNear = false)
    val without = Curation.curate(docs, Some(eval), cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(without.contains(1L),
      "the n-gram stage alone must NOT drop the paraphrase")
    val withSem = Curation.curate(docs, Some(eval),
      cfg.copy(semanticDecontamTau = Some(0.8)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!withSem.contains(1L),
      "semantic stage must drop the shuffled paraphrase")
    assert(without - 1L == withSem,
      s"semantic stage must drop ONLY the paraphrase: ${(without - 1L) diff withSem}")

    // oversized-eval-split guard: force the rows×dims cap below the eval
    // matrix, so the stage may NOT collect it to the driver — the
    // broadcast anti-join fallback must fire (visible in the report's cap
    // telemetry) and keep the identical set
    val (fbOut, fbReport) = Curation.curateWithReport(docs, Some(eval),
      cfg.copy(semanticDecontamTau = Some(0.8), maxEvalRefCells = 1L))
    val fbKept = fbOut.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fbKept == withSem,
      s"fallback shape changed the kept set: ${withSem diff fbKept} / ${fbKept diff withSem}")
    val semRow = fbReport.find(_.stage == "semantic_decontaminate")
      .getOrElse(fail("no semantic_decontaminate stage in the report"))
    assert(semRow.capExcluded.get("eval_fallback_rows").contains(1L),
      s"fallback telemetry missing: ${semRow.capExcluded}")
  }

  test("null-text docs survive the semantic stage identically on both shapes") {
    import spark.implicits._
    // a null text has a null embedding: the kernel's `sim < tau` predicate
    // would evaluate NULL and silently DROP the doc while the fallback's
    // `cosine >= tau` never marks it contaminated and KEEPS it — the kept
    // set of the stage must not depend on which shape ran (ADVICE r15)
    val docs = ((1L, null.asInstanceOf[String], "en") +:
      (2 to 25).map(i => (i.toLong,
        s"daily operations report number $i covering routine maintenance " +
          s"schedules inventory levels and staffing rotations for site $i", "en")))
      .toDF("doc_id", "text", "lang")
    val eval = Seq((1000L, "completely unrelated quantum stabilizer text " +
      "about logical qubits and decoherence protection codes")).toDF("doc_id", "text")
    val cfg = Curation.Config(sampleRates = None, dedupNear = false,
      semanticDecontamTau = Some(0.8))
    def semStage(c: Curation.Config) = {
      val (_, report) = Curation.curateWithReport(docs, Some(eval), c)
      report.find(_.stage == "semantic_decontaminate")
        .getOrElse(fail("no semantic_decontaminate stage in the report"))
    }
    val kernel = semStage(cfg)
    val fallback = semStage(cfg.copy(maxEvalRefCells = 1L))
    assert(kernel.rowsIn == fallback.rowsIn)
    assert(kernel.rowsOut == fallback.rowsOut,
      s"shape-dependent kept set: kernel out=${kernel.rowsOut}, fallback out=${fallback.rowsOut}")
    assert(kernel.rowsOut == kernel.rowsIn,
      "nothing here is contaminated — the null-text doc must be KEPT")
  }

  test("null-text eval docs can't poison either semantic shape") {
    import spark.implicits._
    // a null-text EVAL doc has a null embedding: the kernel collect would
    // NPE on it and the fallback would silently never match it — both
    // shapes must drop it from the reference set up front
    val docs = (2 to 10).map(i => (i.toLong,
      s"daily operations report number $i covering routine maintenance " +
        s"schedules inventory levels and staffing rotations for site $i", "en"))
      .toDF("doc_id", "text", "lang")
    val eval = Seq((1000L, null.asInstanceOf[String]),
      (1001L, "some benign eval question")).toDF("doc_id", "text")
    val cfg = Curation.Config(sampleRates = None, dedupNear = false,
      semanticDecontamTau = Some(0.8))
    val kept = Curation.curate(docs, Some(eval), cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptFb = Curation.curate(docs, Some(eval),
      cfg.copy(maxEvalRefCells = 1L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == keptFb, s"shape-dependent kept set: $kept vs $keptFb")
    assert(kept == (2 to 10).map(_.toLong).toSet)
  }

  test("config toggles: no near-dedup, no sampling, no scrub") {
    import spark.implicits._
    val docs = Tables.documents(spark, SfDir).select($"doc_id", $"text", $"lang")
    val all = Curation.curate(docs, cfg = Curation.Config(
      dedupNear = false, scrubPii = false, sampleRates = None)).collect()
    val sampled = Curation.curate(docs).collect()
    // disabling near-dedup and sampling must strictly widen the output
    assert(all.length > sampled.length,
      s"${all.length} vs ${sampled.length}")
    // cluster minima are exact-dedup keepers, so the strict pipeline's
    // survivors must all exist in the widest config's output
    val allIds = all.map(_.getLong(0)).toSet
    assert(sampled.map(_.getLong(0)).toSet.subsetOf(allIds))
    // exact dedup still applies on the widest config
    val nFp = all.map(_.getString(2)).map(t =>
      t.toLowerCase.replaceAll("[^a-z0-9]", "")).distinct.length
    assert(nFp == all.length, "exact duplicates must still be dropped")
  }

  test("substring-dedup stage rewrites survivors with spans removed") {
    import spark.implicits._
    val docs = Tables.documents(spark, SfDir).select($"doc_id", $"text", $"lang")
    val base = Curation.curate(docs, cfg = Curation.Config(
      dedupNear = false, scrubPii = false, sampleRates = None))
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val despanned = Curation.curate(docs, cfg = Curation.Config(
      dedupNear = false, scrubPii = false, sampleRates = None,
      dropDupSpans = true))
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the stage input is the exact-dedup survivor set (near-dedup off),
    // so every rewrite must match the standalone operator on that input
    val keepers = docs
      .groupBy(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
      .agg(min($"doc_id").as("doc_id")).select($"doc_id")
    val rewritten = graft.queries.CorpusOps
      .dropSpanRewrite(docs.join(keepers, Seq("doc_id"), "left_semi"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    despanned.foreach { case (id, text) =>
      assert(text == rewritten(id)._1, s"doc $id rewrite mismatch")
    }
    assert(base.nonEmpty && despanned.nonEmpty)

    // on the sf fixture the planted dups are exact copies, so exact dedup
    // already removes every duplicated span — prove the REWRITE itself on
    // a synthetic corpus with partial boilerplate overlap
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ")
    val synth = Seq(
      (0L, s"$boiler unique zero content words here now", "en"),
      (1L, s"$boiler other one body tokens text stream", "en"),
      (2L, boiler, "en"), // nothing but boilerplate: empties and drops
      (3L, "fully unique document with its own words", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.curate(synth, cfg = Curation.Config(
      dedupNear = false, scrubPii = false, sampleRates = None,
      minQuality = 0.0, maxRepetition = 1.0, dropDupSpans = true))
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == s"$boiler unique zero content words here now",
      "the global first occurrence keeps its boilerplate")
    assert(out(1L) == "other one body tokens text stream",
      s"later occurrences lose the span: '${out(1L)}'")
    assert(!out.contains(2L), "a doc that is all boilerplate empties and drops")
    assert(out(3L) == "fully unique document with its own words")
  }

  test("gopher + surprisal gates drop exactly the gate-query rejects") {
    import spark.implicits._
    val docs = Tables.documents(spark, SfDir).select($"doc_id", $"text", $"lang")
    val base = Curation.curate(docs, cfg = Curation.Config(
      dedupNear = false, scrubPii = false, sampleRates = None))
      .select($"doc_id").collect().map(_.getLong(0)).toSet

    // gopher rules: survivors of the gated run = base ∩ gopher-keep
    val gophered = Curation.curate(docs, cfg = Curation.Config(
      dedupNear = false, scrubPii = false, sampleRates = None,
      gopherRules = true))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val keepByRule = docs
      .filter(graft.queries.CorpusOps.gopherKeepCol($"text"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(gophered == (base intersect keepByRule),
      s"gopher gate mismatch: ${gophered.size} vs ${(base intersect keepByRule).size}")
    assert(gophered.size < base.size, "the rule battery must actually reject docs")

    // surprisal gate: model is fit on the gate's INPUT corpus (post-rule
    // survivors of this config = base set), threshold at the median keeps
    // roughly half
    val nlls = graft.queries.TextOps
      .lmScores(docs.filter($"doc_id".isInCollection(base)).select($"doc_id", $"text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val cut = nlls.values.toSeq.sorted.apply(nlls.size / 2)
    val lmed = Curation.curate(docs, cfg = Curation.Config(
      dedupNear = false, scrubPii = false, sampleRates = None,
      maxSurprisal = Some(cut)))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val expected = base.filter(id => nlls(id) <= cut)
    assert(lmed == expected,
      s"surprisal gate mismatch: ${lmed.size} vs ${expected.size}")
    assert(lmed.size < base.size && lmed.nonEmpty)
  }

  test("unlisted languages survive the default sampling config") {
    import spark.implicits._
    // a language outside StratRates: default sampleDefaultRate=1000 keeps
    // every row (lossless default), while defaultRate=0 drops them all
    // (the sample_stratified gate semantics)
    val docs = (1L to 50L).map(i => (i, s"text $i", "xx"))
      .toDF("doc_id", "text", "lang")
    val kept = docs.filter(
      CurationOps.stratSampleKeep($"doc_id", $"lang",
        CurationOps.StratRates, 1000L)).count()
    val dropped = docs.filter(
      CurationOps.stratSampleKeep($"doc_id", $"lang",
        CurationOps.StratRates, 0L)).count()
    assert(kept == 50L, s"lossless default kept $kept/50")
    assert(dropped == 0L, s"gate semantics kept $dropped/50")
    // listed languages are unaffected by the default rate
    val en = (1L to 50L).map(i => (i, s"text $i", "en"))
      .toDF("doc_id", "text", "lang")
    val enDefault = en.filter(CurationOps.stratSampleKeep($"doc_id", $"lang",
      CurationOps.StratRates, 1000L)).count()
    val enGate = en.filter(CurationOps.stratSampleKeep($"doc_id", $"lang",
      CurationOps.StratRates, 0L)).count()
    assert(enDefault == enGate, "defaultRate must not change listed strata")
  }

  test("the pipeline is deterministic end to end") {
    import spark.implicits._
    val docs = Tables.documents(spark, SfDir).select($"doc_id", $"text", $"lang")
    def run() = Curation.curate(docs)
      .select($"doc_id", $"pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(run().sameElements(run()), "two runs must be byte-identical")
  }

  test("mix, weighted-sample, and chunk stages match their standalone operators") {
    import spark.implicits._
    val docs = Tables.documents(spark, SfDir)
      .select($"doc_id", $"text", $"lang", $"source")
    val minimal = Curation.Config(dedupNear = false, scrubPii = false,
      sampleRates = None)
    // the stage input under this config is the exact-dedup survivor set
    val keepers = docs
      .groupBy(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
      .agg(min($"doc_id").as("doc_id")).select($"doc_id")
    val base = docs.join(keepers, Seq("doc_id"), "left_semi")
      .filter(graft.functions.TextFunctions.qualityScore($"text") >= 0.3)
      .filter(CurationOps.repetitionCol($"text") <= 0.5)

    // 6b: mixture stage == mixSourceFilter on the same survivor set
    val gotMix = Curation.curate(docs,
        cfg = minimal.copy(mixTargets = Some(CurationOps.MixTargets)))
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    val wantMix = CurationOps.mixSourceFilter(base, CurationOps.MixTargets)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(gotMix.sameElements(wantMix),
      s"mix stage: ${gotMix.length} vs ${wantMix.length}")

    // 4c: weighted stage == qualityWeightedKeep on the same survivor set
    val gotW = Curation.curate(docs, cfg = minimal.copy(qualityWeighted = true))
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    val wantW = base
      .filter(CurationOps.qualityWeightedKeep($"doc_id", $"text"))
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(gotW.sameElements(wantW),
      s"weighted stage: ${gotW.length} vs ${wantW.length}")

    // 6c: chunk stage rows are exactly the chunk_docs windows of the
    // survivors, under namespaced ids, and every chunk fits the budget
    val out = Curation.curate(docs, cfg = minimal.copy(chunkToContext = true))
      .select($"doc_id", $"text", $"n_tok").collect()
    val baseText = base.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = baseText.flatMap { case (id, text) =>
      val ts = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      Iterator.from(0)
        .map(k => 1 + k * graft.queries.CorpusOps.ChunkS)
        .takeWhile(_ <= ts.length)
        .zipWithIndex
        .map { case (start, k) =>
          (id * graft.queries.CorpusOps.ChunkIdBase + k + 1) ->
            ts.slice(start - 1, start - 1 + graft.queries.CorpusOps.ChunkC)
              .mkString(" ")
        }
    }
    assert(out.length == expected.size,
      s"${out.length} chunks vs ${expected.size}")
    out.foreach { r =>
      assert(r.getString(1) == expected(r.getLong(0)),
        s"chunk ${r.getLong(0)} text mismatch")
      assert(r.getLong(2) <= graft.queries.CorpusOps.ChunkC.toLong)
    }
  }

  test("curateWithReport: per-stage recall-cost report with planted over-cap fixture") {
    import spark.implicits._
    // 5 NEAR-identical docs (one trailing token differs, so exact dedup
    // keeps all 5 but every minhash band bucket holds all of them) + 20
    // distinct docs. With lshBucketCap = 2 each shared bucket keeps the 2
    // lowest ids: the over-cap telemetry must report the other 3 entries
    // per bucket, and docs 3..5 fall out of the candidate graph (the
    // recall cost the report exists to surface).
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the rain falls on the quiet grey town tonight"
    val nearDups = (1L to 5L).map(i => (i, s"$base token$i", "en"))
    // genuinely dissimilar filler docs: per-doc hashed token streams so
    // no two share a shingle (template-y filler text near-dups itself)
    val distinct = (100L until 120L).map { i =>
      val words = (0 until 18).map(j => s"tok${(i * 1315423911L + j * 2654435761L) % 100000}q$j")
      (i, words.mkString(" "), "en")
    }
    val docs = (nearDups ++ distinct).toDF("doc_id", "text", "lang")
    val cfg = Curation.Config(lshBucketCap = Some(2),
      sampleRates = None, scrubPii = false)

    val (out, report) = Curation.curateWithReport(docs, cfg = cfg)
    val byStage = report.map(r => r.stage -> r).toMap

    // stage order and enablement: disabled stages are absent
    assert(report.map(_.stage) == Seq("exact_dedup", "neardup_clusters",
      "quality_gates", "pack_sequences"), report.map(_.stage).toString)

    // exact dedup drops nothing here (all texts distinct)
    assert(byStage("exact_dedup").rowsIn == 25
      && byStage("exact_dedup").rowsOut == 25, byStage("exact_dedup").toString)

    // the planted over-cap bucket fired: every band bucket held 5 docs,
    // cap 2 -> 3 entries excluded per bucket
    val cap = byStage("neardup_clusters").capExcluded
    assert(cap.getOrElse("over_cap_buckets", 0L) > 0, s"cap must fire: $cap")
    // each over-cap bucket excludes 1..3 entries (buckets hold 3..5 of
    // the planted docs; cap 2). The upper bound also catches the
    // double-fired-observe failure mode (2x would read 6+ per bucket).
    val entries = cap.getOrElse("over_cap_entries", 0L)
    assert(entries >= cap("over_cap_buckets")
      && entries <= 3 * cap("over_cap_buckets"),
      s"entries per over-cap bucket out of [1,3]: $cap")

    // recall cost made concrete: the capped graph loses SOME planted
    // pairs (which bands survive the cap depends on band membership, so
    // assert the shape, not exact ids): keeper 1 survives, and fewer
    // planted docs are deduped than the family's 4 duplicates
    val nearRep = byStage("neardup_clusters")
    assert(nearRep.rowsExcluded >= 1 && nearRep.rowsExcluded < 4,
      nearRep.toString)
    val kept = out.select($"doc_id").as[Long].collect().toSet
    assert(kept.contains(1L), s"cluster keeper must survive: $kept")

    // an UNCAPPED run dedups the whole near-dup family (keeps only doc
    // 1 of the 5): the survivor delta IS the cap's recall cost, and its
    // report carries no cap metrics
    val (outFull, reportFull) = Curation.curateWithReport(docs,
      cfg = cfg.copy(lshBucketCap = None))
    assert(reportFull.map(r => r.stage -> r.capExcluded).toMap
      .apply("neardup_clusters").isEmpty)
    val keptFull = outFull.select($"doc_id").as[Long].collect().toSet
    assert((2L to 5L).forall(!keptFull.contains(_)),
      s"uncapped run must dedup the whole planted family: $keptFull")
    assert(kept.size > keptFull.size,
      s"capped run must keep strictly more docs: ${kept.size} vs ${keptFull.size}")

    // report counts agree with the lazy verb's output
    val lazyCount = Curation.curate(docs, cfg = cfg).count()
    assert(byStage("pack_sequences").rowsOut == out.count()
      && out.count() == lazyCount)
    out.unpersist(); outFull.unpersist()
  }
}
