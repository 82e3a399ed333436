package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Independent validators for the queries whose DuckDB oracle cannot
  * complete at sf10 (the `CcValidate` mold — VERDICT r13 item 1).
  *
  * Usage: runMain graft.SweepValidate <sfDir> <verifyOutDir> [q1,q2,...]
  *
  * The gate's cross-ENGINE check (DuckDB same-SQL) clamps out on the
  * pair-enumeration family once pair counts go quadratic (215M-965M rows
  * at sf10). Each validator here re-derives the expected result with an
  * INDEPENDENT implementation — pure Spark SQL expressions and plain
  * string/long-keyed joins, none of the engine's native kernels
  * (WordNgrams/ShingleHashes/SimhashVote/BoundedCollectSet) or census
  * plans — and proves set equality against the Verify dump without ever
  * collecting a pair relation to the driver:
  *
  *  - `lsh_pairs`: soundness via a broadcast re-join of every dumped pair
  *    against the `minhash_sig` dump (which IS cross-engine checked at
  *    sf10 — DuckDB completes the linear signature query), completeness
  *    via per-band re-joins anti-joined against the dump, plus a
  *    distinctness aggregate. Chain: DuckDB verifies the signatures,
  *    this validator verifies the banding join over them.
  *  - `simhash_dedup`: signatures recomputed from RAW TEXT with the
  *    oracle's arithmetic (md5 → 60-bit majority vote) as interpreted
  *    SQL lambdas, then the same soundness/completeness/distinctness
  *    proof. No shared code with the engine's one-pass native kernel.
  *  - `jaccard_pairs` / `jaccard_capped`: full recomputation of the
  *    oracle semantics with string-keyed grams (the engine shuffles
  *    128-bit fingerprints through a saturating census aggregate), exact
  *    top-50 compare.
  *  - `decontaminate_semantic`: the oracle's CROSS JOIN cosine DNFs in
  *    DuckDB at sf10 (train × eval quadratic); full-coverage structural
  *    checks (key-set equality both ways, eval ids in the eval split)
  *    plus a deterministic ~1k-row sample whose best match is recomputed
  *    with interpreted SQL HOF arithmetic and the BUILT-IN max_by — no
  *    engine kernel (BestMatchExpr/CosineSimExpr) in the loop.
  *  - `range_join`: the oracle's |Δt| ≤ W join DNFs in DuckDB at sf10
  *    (per-user cross product); recomputed with a DIFFERENT algorithm —
  *    per-user cumulative-count timeline (two boundary probes per error,
  *    one sort window), not the engine's 3-bucket equi-join — and
  *    value-compared on EVERY row.
  *
  * Prints one JSON line per query: {"query":…,"pass":…,…counters}.
  * `dedup_clusters` stays with [[CcValidate]] (fixpoint properties).
  */
object SweepValidate {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val checks: Seq[(String, () => Map[String, Long])] = Seq(
      "lsh_pairs" -> (() => lshPairs(spark, outDir)),
      "simhash_dedup" -> (() => simhashDedup(spark, sfDir, outDir)),
      "jaccard_pairs" -> (() => jaccardTop50(spark, sfDir, outDir, capped = false)),
      "jaccard_capped" -> (() => jaccardTop50(spark, sfDir, outDir, capped = true)),
      "decontaminate_semantic" -> (() => decontamSemantic(spark, sfDir, outDir)),
      "range_join" -> (() => rangeJoin(spark, sfDir, outDir)),
      "simhash_dedup_stats" -> (() => simhashStats(spark, outDir)))
    checks.filter(c => only.forall(_.contains(c._1))).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val m = fn()
        val pass = m.filterNot(_._1 == "rows").values.forall(_ == 0L)
        val counters = (m + ("pass" -> (if (pass) 1L else 0L)))
          .map { case (k, v) => s""""$k": $v""" }.mkString(", ")
        println(f"""{"query": "$name", $counters, "sec": ${(System.nanoTime() - t0) / 1e9}%.1f}""")
      } catch {
        case e: Throwable =>
          println(s"""{"query": "$name", "pass": 0, "err": ${Bench.jsonEscape(
            String.valueOf(e.getMessage).take(300))}}""")
      }
    }
    spark.stop()
  }

  /** Set-equality proof without materializing a distinct candidate set:
    * completeness = (re-derived candidates) LEFT ANTI dump must be empty
    * (anti-join tolerates duplicate left rows), soundness = a broadcast
    * re-join predicate over every dumped row, distinctness = one count
    * aggregate over the dump. */
  private def antiCount(left: DataFrame, right: DataFrame,
      keys: Seq[String]): Long =
    left.join(right, keys, "left_anti").count()

  private def dupRows(dump: DataFrame, keys: Seq[String]): Long =
    dump.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).count()

  // ------------------------------------------------------------------
  // lsh_pairs: derived from the cross-engine-verified minhash_sig dump
  // ------------------------------------------------------------------
  private[graft] def lshPairs(spark: SparkSession, outDir: String): Map[String, Long] = {
    val sig = spark.read.parquet(s"$outDir/minhash_sig")
    val dump = spark.read.parquet(s"$outDir/lsh_pairs")
    val nBands = sig.columns.count(_.startsWith("band_"))
    val aSig = broadcast(sig.select(col("doc_id").as("a_id") +:
      (0 until nBands).map(b => col(s"band_$b").as(s"a_band_$b")): _*))
    val bSig = broadcast(sig.select(col("doc_id").as("b_id") +:
      (0 until nBands).map(b => col(s"band_$b").as(s"b_band_$b")): _*))
    val anyBand = (0 until nBands)
      .map(b => col(s"a_band_$b") === col(s"b_band_$b")).reduce(_ || _)
    val unsound = dump.join(aSig, "a_id").join(bSig, "b_id")
      .filter(!(col("a_id") < col("b_id") && anyBand)).count()
    val missing = (0 until nBands).map { b =>
      val l = sig.select(col("doc_id").as("a_id"), col(s"band_$b").as("bk"))
      val r = sig.select(col("doc_id").as("b_id"), col(s"band_$b").as("bk"))
      val cand = l.join(r, l("bk") === r("bk") && col("a_id") < col("b_id"))
        .select("a_id", "b_id")
      antiCount(cand, dump, Seq("a_id", "b_id"))
    }.sum
    Map("rows" -> dump.count(), "unsound" -> unsound, "missing" -> missing,
      "dup_rows" -> dupRows(dump, Seq("a_id", "b_id")))
  }

  // ------------------------------------------------------------------
  // simhash_dedup: signatures re-derived from raw text via the oracle's
  // md5/majority-vote arithmetic as interpreted SQL lambdas
  // ------------------------------------------------------------------
  /** (doc_id, sh): the oracle's 60-bit simhash, no engine kernels. */
  private[graft] def independentSimhash(spark: SparkSession,
      sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id",
        "regexp_replace(lower(text), '\\\\s+', ' ') AS norm")
      .selectExpr("doc_id",
        """array_distinct(filter(
             transform(
               CASE WHEN length(norm) >= 4 THEN sequence(1, length(norm) - 3)
                    ELSE array() END,
               i -> substring(norm, i, 4)),
             s -> length(s) = 4)) AS sgs""")
      .selectExpr("doc_id",
        "transform(sgs, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) AS bigint)) AS hs",
        "size(sgs) AS n")
      .selectExpr("doc_id",
        """aggregate(
             zip_with(
               aggregate(hs,
                 transform(sequence(0, 59), b -> 0L),
                 (acc, x) -> zip_with(acc, sequence(0, 59),
                   (c, b) -> c + (shiftright(x, b) & 1))),
               sequence(0, 59),
               (v, b) -> IF(2 * v > n, shiftleft(CAST(1 AS BIGINT), b), 0L)),
             0L, (a, x) -> a + x) AS sh""")

  private[graft] def simhashDedup(spark: SparkSession, sfDir: String,
      outDir: String): Map[String, Long] = {
    import graft.queries.SimhashOps.{Bands, BandBits, BandMask, HammingMax}
    val sig = independentSimhash(spark, sfDir).cache()
    sig.count() // one materialization; 4 band jobs + broadcast reuse it
    val dump = spark.read.parquet(s"$outDir/simhash_dedup")
    val aSig = broadcast(sig.select(col("doc_id").as("a_id"), col("sh").as("a_sh")))
    val bSig = broadcast(sig.select(col("doc_id").as("b_id"), col("sh").as("b_sh")))
    val anyBand = (0 until Bands).map { j =>
      (shiftright(col("a_sh"), j * BandBits) bitwiseAND BandMask) ===
        (shiftright(col("b_sh"), j * BandBits) bitwiseAND BandMask)
    }.reduce(_ || _)
    val unsound = dump.join(aSig, "a_id").join(bSig, "b_id")
      .filter(!(col("a_id") < col("b_id") && anyBand &&
        col("hamming") === bit_count(col("a_sh") bitwiseXOR col("b_sh")).cast("long") &&
        col("hamming") <= HammingMax)).count()
    // completeness one band at a time: each job's shuffle is band-sized,
    // not 4x-candidate-sized (disk headroom at 965M output pairs)
    val missing = (0 until Bands).map { j =>
      def side(p: String) = sig.select(col("doc_id").as(s"${p}_id"),
        col("sh").as(s"${p}_sh"),
        (shiftright(col("sh"), j * BandBits) bitwiseAND BandMask).as(s"${p}_bk"))
      val cand = side("a").join(side("b"),
          col("a_bk") === col("b_bk") && col("a_id") < col("b_id"))
        .filter(bit_count(col("a_sh") bitwiseXOR col("b_sh")) <= HammingMax)
        .select("a_id", "b_id")
      antiCount(cand, dump, Seq("a_id", "b_id"))
    }.sum
    val res = Map("rows" -> dump.count(), "unsound" -> unsound,
      "missing" -> missing, "dup_rows" -> dupRows(dump, Seq("a_id", "b_id")))
    sig.unpersist()
    res
  }

  // ------------------------------------------------------------------
  // jaccard_pairs / jaccard_capped: string-keyed recomputation of the
  // oracle semantics, exact top-50 compare
  // ------------------------------------------------------------------
  private[graft] def jaccardTop50(spark: SparkSession, sfDir: String,
      outDir: String, capped: Boolean): Map[String, Long] = {
    val cap = graft.queries.TextOps.JaccardDfCap
    val name = if (capped) "jaccard_capped" else "jaccard_pairs"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dg = docs
      .selectExpr("doc_id",
        "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '') AS ts")
      .selectExpr("doc_id",
        """array_distinct(
             CASE WHEN size(ts) >= 4 THEN
               transform(sequence(1, size(ts) - 3),
                 i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1),
                   ' ', element_at(ts, i + 2), ' ', element_at(ts, i + 3)))
             ELSE array() END) AS gs""")
      .cache()
    dg.count()
    val grams = dg.select(col("doc_id"), explode(col("gs")).as("gram"))
    val df = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    val expected: DataFrame =
      if (!capped) {
        // jaccard_pairs semantics: candidates pair through DISCRIMINATIVE
        // grams (2 <= df <= cap); the score's intersection counts EVERY
        // shared gram, hot ones included — the oracle's list_intersect.
        // Joining candidate pairs back to the full gram ARRAYS (the duck
        // plan) would carry ~5 KB arrays through a pair-sized join, so i
        // splits into i_disc (per-gram pair enumeration) + i_hot
        // (candidate-restricted membership join) — same decomposition the
        // engine uses, but over string keys and plain aggregates.
        val disc = grams.join(df.filter(col("df").between(2, cap)), "gram")
        val iDisc = disc.as("a").join(disc.as("b"),
            col("a.gram") === col("b.gram") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .agg(count(lit(1)).as("i_disc"))
        val hotMem = grams.join(broadcast(
          df.filter(col("df") > cap).select("gram")), "gram")
        val iHot = iDisc.select("a_id", "b_id")
          .join(hotMem.select(col("doc_id").as("a_id"), col("gram")), Seq("a_id"))
          .join(hotMem.select(col("doc_id").as("b_id"), col("gram")),
            Seq("b_id", "gram"))
          .groupBy("a_id", "b_id").agg(count(lit(1)).as("i_hot"))
        val sizes = dg.select(col("doc_id"), size(col("gs")).cast("long").as("n"))
        iDisc.join(iHot, Seq("a_id", "b_id"), "left")
          .select(col("a_id"), col("b_id"),
            (col("i_disc") + coalesce(col("i_hot"), lit(0L))).as("i"))
          .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
          .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
          .select(col("a_id"), col("b_id"),
            (floor((col("i") * 2000000L + (col("na") + col("nb") - col("i")))
              .cast("double") /
              ((col("na") + col("nb") - col("i")) * 2L).cast("double"))
              / 1000000.0).as("jaccard"))
      } else {
        // jaccard_capped semantics: hot grams (df > cap) leave the
        // UNIVERSE — sizes and intersections both run over the pruned set
        val pruned = grams.join(broadcast(
          df.filter(col("df") > cap).select("gram")), Seq("gram"), "left_anti")
        val sizes = pruned.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val inter = pruned.as("a").join(pruned.as("b"),
            col("a.gram") === col("b.gram") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .agg(count(lit(1)).as("i"))
        inter
          .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
          .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
          .select(col("a_id"), col("b_id"),
            (floor((col("i") * 2000000L + (col("na") + col("nb") - col("i")))
              .cast("double") /
              ((col("na") + col("nb") - col("i")) * 2L).cast("double"))
              / 1000000.0).as("jaccard"))
      }
    val top = expected
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id")).limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = spark.read.parquet(s"$outDir/$name")
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    dg.unpersist()
    val mismatch = if (top.toSeq == got.toSeq) 0L else 1L
    Map("rows" -> got.length.toLong, "mismatch" -> mismatch)
  }

  // ------------------------------------------------------------------
  // decontaminate_semantic: structural full coverage + sampled value
  // recompute with interpreted SQL HOF arithmetic (no engine kernels)
  // ------------------------------------------------------------------
  private[graft] def decontamSemantic(spark: SparkSession, sfDir: String,
      outDir: String): Map[String, Long] = {
    val mod = graft.queries.CurationOps.DecontamEvalMod
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dump = spark.read.parquet(s"$outDir/decontaminate_semantic")
    val trainKeys = emb.filter(col("vec_id") % mod =!= 0).select("vec_id")
    val evalKeys = emb.filter(col("vec_id") % mod === 0)
      .select(col("vec_id").as("eval_id"))
    // full-coverage structure: exactly one row per training vector, and
    // every named match comes from the eval split
    val missing = antiCount(trainKeys, dump, Seq("vec_id"))
    val extra = antiCount(dump.select("vec_id"), trainKeys, Seq("vec_id"))
    val badEval = antiCount(dump.select("eval_id"), evalKeys, Seq("eval_id"))
    val dups = dupRows(dump, Seq("vec_id"))
    // sampled values: ~1k deterministic train rows, best match recomputed
    // as interpreted zip_with/aggregate folds + the BUILT-IN max_by —
    // none of the engine's BestMatchExpr/CosineSimExpr codegen kernels.
    // Norms are hoisted per side; the ascending fold order matches the
    // kernel contract, so sims agree to the last ulp (tolerance below is
    // for the rounding boundary only).
    val nTrain = trainKeys.count()
    val step = math.max(1L, nTrain / 1000L)
    // sampling remainder: if step is a multiple of the eval mod, remainder
    // 0 selects ONLY eval-split ids (vec_id % step == 0 ⇒ % mod == 0) and
    // the train-side sample would be empty — a correct dump marked FAIL
    val rem = if (step % mod == 0) 1L else 0L
    def norm(c: String) =
      s"sqrt(aggregate($c, 0D, (a, x) -> a + cast(x AS double) * cast(x AS double)))"
    val sample = emb.filter(col("vec_id") % mod =!= 0)
      .filter(pmod(col("vec_id"), lit(step)) === rem)
      .selectExpr("vec_id", "embedding AS tv", s"${norm("embedding")} AS nt")
    val ev = emb.filter(col("vec_id") % mod === 0)
      .selectExpr("vec_id AS e_id", "embedding AS evv",
        s"${norm("embedding")} AS ne")
    val dot = "aggregate(zip_with(tv, evv, (x, y) -> " +
      "cast(x AS double) * cast(y AS double)), 0D, (a, v) -> a + v)"
    val best = sample.crossJoin(ev)
      .selectExpr("vec_id", "e_id",
        s"CASE WHEN nt * ne = 0D THEN 0D ELSE $dot / (nt * ne) END AS cs")
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("e_id"), col("cs")),
        struct(col("cs"), -col("e_id"))).as("m"))
      .select(col("vec_id"), col("m.e_id").as("exp_eval"),
        round(col("m.cs"), 6).as("exp_sim")).cache()
    val sampled = best.count()
    val covered = dump.join(best, "vec_id").cache()
    val uncovered = sampled - covered.count()
    // null-SAFE comparisons: a corrupted dump carrying NULL where the
    // recompute expects a value must COUNT as a mismatch, not evaluate
    // the predicate to NULL and slip past the filter
    val mismatch = covered.filter(!(col("eval_id") <=> col("exp_eval")) ||
      (!(col("sim") <=> col("exp_sim")) &&
        coalesce(abs(col("sim") - col("exp_sim")) > 1.5e-6, lit(true)))).count()
    val res = Map("rows" -> dump.count(), "missing" -> missing,
      "extra" -> extra, "bad_eval" -> badEval, "dup_rows" -> dups,
      "sample_uncovered" -> uncovered, "mismatch" -> mismatch,
      // vacuous-pass guard: an empty sample must FAIL, not pass
      "empty_sample" -> (if (sampled > 0) 0L else 1L))
    best.unpersist(); covered.unpersist()
    res
  }

  // ------------------------------------------------------------------
  // simhash_dedup_stats: the census must equal an aggregate of the pair
  // LISTING dump — which [[simhashDedup]] has already proven sound,
  // complete, and distinct against raw-text-recomputed signatures — so
  // agreeing with it is agreeing with the independently validated pair
  // set. Null-safe compares; every doc row checked.
  // ------------------------------------------------------------------
  private[graft] def simhashStats(spark: SparkSession,
      outDir: String): Map[String, Long] = {
    val pairs = spark.read.parquet(s"$outDir/simhash_dedup")
    val dump = spark.read.parquet(s"$outDir/simhash_dedup_stats")
    val expected = pairs
      .select(explode(array(
        struct(col("a_id").as("doc_id"), col("hamming")),
        struct(col("b_id").as("doc_id"), col("hamming")))).as("e"))
      .groupBy(col("e.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("exp_n"), min(col("e.hamming")).as("exp_min"))
    val missing = antiCount(expected.select("doc_id"), dump, Seq("doc_id"))
    val extra = antiCount(dump.select("doc_id"),
      expected.select("doc_id"), Seq("doc_id"))
    val dups = dupRows(dump, Seq("doc_id"))
    val mismatch = dump.join(expected, "doc_id")
      .filter(!(col("n_dups") <=> col("exp_n")) ||
        !(col("min_hamming") <=> col("exp_min"))).count()
    Map("rows" -> dump.count(), "missing" -> missing, "extra" -> extra,
      "dup_rows" -> dups, "mismatch" -> mismatch)
  }

  // ------------------------------------------------------------------
  // range_join: every row value-checked against a DIFFERENT algorithm —
  // per-user cumulative-count timeline with two boundary probes per
  // error (one sort window), vs the engine's 3-bucket equi-join
  // ------------------------------------------------------------------
  private[graft] def rangeJoin(spark: SparkSession, sfDir: String,
      outDir: String): Map[String, Long] = {
    val W = graft.queries.SessionOps.RangeBandSec
    val dump = spark.read.parquet(s"$outDir/range_join")
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_sec"), col("event_type"))
    val err = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_sec"))
    // timeline rows: others carry weight 1; each error contributes a HI
    // probe at t+W and a LO probe at t-W-1 (integer seconds, so
    // count(o_sec < t-W) = count(o_sec <= t-W-1)). kind sorts probes
    // AFTER others at an equal second, making the running sum the
    // inclusive count-at-or-before the probe's boundary.
    // NULL user_id never matches the engine's equi-join (NULL = NULL is
    // false), so null-user context rows carry no weight here either —
    // a null-user error must validate to n_nearby = 0, not to a count of
    // its null-user neighbors (the window would otherwise group them)
    val oth = e.filter(col("event_type") =!= "error")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts_sec").as("sec"), lit(1L).as("w"),
        lit(null).cast("long").as("probe_id"), lit(0).as("kind"))
    def probes(off: Long, kind: Int) = err.select(col("user_id"),
      (col("ts_sec") + off).as("sec"), lit(0L).as("w"),
      col("event_id").as("probe_id"), lit(kind).as("kind"))
    val cum = sum(col("w")).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("sec"), col("kind"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow))
    val counts = oth.unionAll(probes(W, 1)).unionAll(probes(-W - 1L, 2))
      .withColumn("c", cum).filter(col("kind") =!= 0)
    val expected = counts.filter(col("kind") === 1)
      .select(col("probe_id").as("event_id"), col("c").as("hi"))
      .join(counts.filter(col("kind") === 2)
        .select(col("probe_id").as("event_id"), col("c").as("lo")), "event_id")
      .join(err.select(col("event_id"), col("user_id").as("exp_uid")), "event_id")
      .select(col("event_id"), col("exp_uid"), (col("hi") - col("lo")).as("exp_n"))
    val missing = antiCount(expected.select("event_id"), dump, Seq("event_id"))
    val extra = antiCount(dump.select("event_id"),
      expected.select("event_id"), Seq("event_id"))
    val dups = dupRows(dump, Seq("event_id"))
    // null-safe: NULL-vs-non-null disagreement is a mismatch, not a skip
    val mismatch = dump.join(expected, "event_id")
      .filter(!(col("n_nearby") <=> col("exp_n")) ||
        !(col("user_id") <=> col("exp_uid"))).count()
    Map("rows" -> dump.count(), "missing" -> missing, "extra" -> extra,
      "dup_rows" -> dups, "mismatch" -> mismatch)
  }
}
