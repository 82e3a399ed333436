package graft

import graft.queries.Registry

/** Plan-shape assertions for the scale-critical queries: these encode the
  * 100 TB design contract (pushdown reaches the scan, small sides
  * broadcast, top-k never becomes a global sort) so a regression in plan
  * shape fails CI even while results stay correct. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String = {
    val q = Registry.all.find(_.name == name).get
    q.fn(spark, dir).queryExecution.executedPlan.toString
  }

  test("projection pruning reaches the parquet scan (token_count)") {
    val p = plan("token_count")
    assert(p.contains("ReadSchema"), p.take(400))
    assert(p.contains("doc_id") && p.contains("text"))
    assert(!p.contains("lang#") || !p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang"),
      "only doc_id+text should be read")
  }

  test("filter pushdown reaches the scan (tail_filter)") {
    val p = plan("ts_window")
    assert(p.contains("PushedFilters: [") , "expected pushed filters in scan")
  }

  test("top-k is TakeOrderedAndProject, not a global sort (topk_sort, cosine_topk)") {
    assert(plan("topk_sort").contains("TakeOrderedAndProject"))
    assert(plan("cosine_topk").contains("TakeOrderedAndProject"))
  }

  test("anomaly detector joins stay broadcast (no shuffled fact join)") {
    val p = plan("anomaly_detect")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast joins in detector plan:\n${p.take(1200)}")
  }

  test("bm25 corpus stats are broadcast, never a global window") {
    val p = plan("bm25_score")
    assert(!p.contains("Window"), "global window would single-partition the corpus")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("grouped_search aggregates map-side before the exchange, no window sort") {
    val p = plan("grouped_search")
    // partial_max_by below the Exchange = map-side combine (struct-buffer
    // aggs compile to SortAggregate, which is fine — the partial is what
    // keeps the shuffle at one row per (partition, hash))
    assert(p.contains("partial_max_by"), p.take(1200))
    assert(!p.contains("Window"))
  }

  test("ANN variants broadcast their centroid/probe sides (ann_ivf, int8_topk)") {
    val ivf = plan("ann_ivf")
    assert(ivf.contains("BroadcastHashJoin") || ivf.contains("BroadcastExchange"),
      "centroid + probe tables must broadcast, never shuffle the vectors")
    assert(plan("int8_topk").contains("TakeOrderedAndProject"),
      "quantized scoring stays a single-pass top-k")
  }

  test("dim-chain broadcast is STATS-GATED, never unconditional (q3/q5/q7)") {
    // customer and supplier grow with SF, so their broadcast hints must
    // come from broadcastIfSmall's size gate: present when the projected
    // dim's estimate fits DimBroadcastBytes (every bench SF — this is
    // what collapses q5/q7 to the ≤3-exchange plan on bucketed facts),
    // ABSENT when the estimate exceeds it (no OOM promise at 100×).
    import org.apache.spark.sql.functions.col
    def analyzed(name: String): String = {
      val q = Registry.all.find(_.name == name).get
      q.fn(spark, dir).queryExecution.analyzed.toString
    }
    Seq("q3_topk", "q5_join", "q7_flow").foreach { n =>
      assert(analyzed(n).contains("ResolvedHint"),
        s"$n: small-dim hint must fire at the test SF")
    }
    // the gate half: a relation whose OWN estimate exceeds the bound gets
    // NO hint (spark.range stats are static — no job runs here)
    val big = spark.range(300L * 1000 * 1000)
      .select(col("id").as("c_custkey"), (col("id") % 25).as("c_nationkey"))
    assert(big.queryExecution.optimizedPlan.stats.sizeInBytes
      > BigInt(graft.queries.Relational.DimBroadcastBytes),
      "fixture broken: the synthetic dim must exceed the gate bound")
    val gated = graft.queries.Relational.broadcastIfSmall(big, big)
    assert(!gated.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "an over-bound dim must NOT carry a broadcast hint")
    val small = spark.range(10)
      .select(col("id").as("c_custkey"), (col("id") % 25).as("c_nationkey"))
    assert(graft.queries.Relational.broadcastIfSmall(small, small)
      .queryExecution.analyzed.toString.contains("ResolvedHint"),
      "an under-bound dim must carry the hint")
  }

  test("q5/q7 executed plans keep the dim chain broadcast at the test SF") {
    Seq("q5_join", "q7_flow").foreach { n =>
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"),
        s"$n: expected broadcast dim joins:\n${p.take(1200)}")
    }
  }

  test("q7_flow pushes nation filters below the fact joins") {
    val q = Registry.all.find(_.name == "q7_flow").get
    val p = q.fn(spark, dir).queryExecution.optimizedPlan.toString
    // the nation-name IN filter must sit on the dimension side (under the
    // supplier/customer joins), not above the joined fact relation
    assert("Filter.*n_name".r.findFirstIn(p.replace("\n", " ")).isDefined ||
      p.contains("isin"), s"nation filter must survive into the dim scans:\n${p.take(1500)}")
    assert(!p.contains("CartesianProduct"),
      "the cross-nation inequality must stay a post-join filter")
  }

  test("neardup_cosine blocks on the LSH bucket, not a low-cardinality label") {
    val q = Registry.all.find(_.name == "neardup_cosine").get
    val p = q.fn(spark, dir).queryExecution.optimizedPlan.toString
    assert(!p.contains("(label"), "label must not be a join key")
    assert(p.contains("bucket"), "expected the sign-bucket block key")
  }

  test("detector/promotion tier-1 reads scan ONLY the windowed dt partitions") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("dtprune").toString + "/tier1"
    val now = 1754000000L // fixed epoch: derivation and pruning share the session tz
    // three day-partitions: in-window, 40 d back, 80 d back
    Seq(now - 10, now - 86400L * 40, now - 86400L * 80)
      .toDF("ts_sec")
      .withColumn("dt", graft.analysis.DtPrune.dtOf(col("ts_sec")))
      .repartition(1)
      .write.partitionBy("dt").parquet(store)
    val win = graft.streaming.AnalysisJob.tier1Window(spark, store, now - 3600, now)
    win.collect()
    val scan = win.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in the tier-1 window plan"))
    assert(scan.metadata("PartitionFilters").contains("dt"),
      s"dt must be a partition filter, got: ${scan.metadata("PartitionFilters")}")
    assert(scan.metrics("numFiles").value == 1,
      s"only the in-window day partition may be listed/read, " +
        s"got ${scan.metrics("numFiles").value} files")
  }

  test("pack_sequences shuffles once on the shard key, window stays per-shard") {
    val p = plan("pack_sequences")
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(p).size == 1,
      s"exactly one shard exchange expected:\n${p.take(1200)}")
    assert(p.toLowerCase.contains("windowspecdefinition(shard"),
      "cumsum window must partition by shard, never run global")
  }

  test("sample_stratified is a pure scan filter — zero hash exchanges") {
    val p = plan("sample_stratified")
    assert(!p.contains("Exchange hashpartitioning"),
      s"stratified sampling must not shuffle:\n${p.take(1200)}")
  }

  test("sample_topk_stratified plans through the custom TopKPerGroup operator") {
    val q = Registry.all.find(_.name == "sample_topk_stratified").get
    val df = q.fn(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"),
      s"expected the custom operator, not a window sort:\n${p.take(1200)}")
    assert(!p.contains("Window"), "row_number window would sort every stratum")
  }

  test("decontaminate joins on the gram key, never a nested loop") {
    val q = Registry.all.find(_.name == "decontaminate").get
    val df = q.fn(spark, dir)
    df.collect() // let AQE finalize join strategy from real sizes
    val p = df.queryExecution.executedPlan.toString
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[gram".r
        .findFirstIn(p).isDefined,
      s"expected an equi-join keyed on gram:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "membership must never degrade to a product join")
  }

  test("whole-stage codegen covers the scan->project hot path (template_hash)") {
    val q = Registry.all.find(_.name == "template_hash").get
    val p = q.fn(spark, dir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), p.take(400))
  }

  test("asof_join is a single user_id shuffle — no join operator at all") {
    val p = plan("asof_join")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"exactly one user_id exchange expected:\n${p.take(1200)}")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"the as-of must be the union+running-last shape, never a pair join:\n${p.take(1200)}")
  }

  test("sessionize windows stay per-user (lag + cumsum share one sort)") {
    val p = plan("sessionize")
    assert(p.toLowerCase.contains("windowspecdefinition(user_id"),
      "session windows must partition by user_id, never run global")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"lag and cumsum must reuse ONE user_id exchange:\n${p.take(1200)}")
  }

  test("range_join stays an equi-join on (user, bucket) — never a product") {
    val q = Registry.all.find(_.name == "range_join").get
    val df = q.fn(spark, dir)
    df.collect() // let AQE finalize join strategies from real sizes
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the band bucketing must keep the interval join equi-keyed:\n${p.take(1200)}")
  }

  test("above_avg_orders decorrelates: subqueries become one aggregate + join") {
    val q = Registry.all.find(_.name == "above_avg_orders").get
    val df = q.fn(spark, dir)
    val analyzed = df.queryExecution.analyzed.toString
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(analyzed.contains("scalar-subquery"),
      "the query must genuinely enter Catalyst as a correlated subquery")
    assert(!optimized.contains("scalar-subquery"),
      s"decorrelation must eliminate the per-row subquery:\n${optimized.take(1200)}")
    assert(optimized.contains("Join"),
      "the rewrite is a grouped aggregate joined back on the key")
    assert(!optimized.contains("CartesianProduct"))
  }

  test("rollup_pricing: Expand runs over the aggregated grain, not the fact scan") {
    // two-level rollup (r11): the fact aggregates to (flag, status) first,
    // and ROLLUP's Expand triples the ~6-row grain relation instead of the
    // 6M-row fact (measured ~1 s at sf1). One scan; both exchanges carry
    // grouping-grain partials only.
    val p = plan("rollup_pricing")
    assert(p.contains("Expand"), s"ROLLUP must plan via Expand:\n${p.take(1200)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected the grain exchange + the rollup exchange:\n${p.take(1200)}")
    // below the Expand there must be an aggregate (the grain pass), i.e.
    // Expand's input is pre-aggregated — the plan string is top-down
    val afterExpand = p.substring(p.indexOf("Expand"))
    assert(afterExpand.contains("HashAggregate"),
      s"Expand must consume the pre-aggregated grain, not the scan:\n${p.take(1200)}")
    assert("Scan |FileScan".r.findAllIn(p).size <= 1,
      s"still one fact scan:\n${p.take(1200)}")
  }

  test("dup_spans joins on the window fingerprint, islands stay per-doc") {
    val q = Registry.all.find(_.name == "dup_spans").get
    val df = q.fn(spark, dir)
    df.collect() // let AQE finalize join strategies from real sizes
    val p = df.queryExecution.executedPlan.toString
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[h1".r
        .findFirstIn(p).isDefined,
      s"census membership must be an equi-join on the (h1, h2) fingerprint:\n${p.take(1200)}")
    assert("Exchange hashpartitioning\\(gram".r.findFirstIn(p).isEmpty,
      s"the gram string must be dropped before any exchange:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span detection must never pair documents")
    assert(p.toLowerCase.contains("windowspecdefinition(doc_id"),
      "island merge must partition by doc_id, never run global")
  }

  test("running_totals: both frames share one user_id exchange") {
    val p = plan("running_totals")
    assert(p.toLowerCase.contains("windowspecdefinition(user_id"),
      "running frames must partition by user_id, never run global")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"cumsum and ma3 must reuse ONE user_id exchange:\n${p.take(1200)}")
  }

  test("semdedup: one-scan assignment, fused pair kernel, no pair join") {
    val q = Registry.all.find(_.name == "semdedup").get
    val df = q.fn(spark, dir)
    df.collect() // let AQE finalize join strategies from real sizes
    val p = df.queryExecution.executedPlan.toString
    // the r8 perf-weak fix, round 2 (kernel fusion): verdicts come from
    // ONE sem_pair_drop call per cluster after the collect_list
    // exchange — the relational pair join + pair distinct + corpus-wide
    // verdict join are gone entirely, so vectors cross exactly one
    // exchange and pair rows never materialize
    assert(p.contains("sem_pair_drop"),
      s"expected the fused pair kernel:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no shuffled join may remain (census/over-cap sides broadcast):\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"),
      "the only broadcast product is the nlist-row census table")
    // assignment is scan-side constant-kernel argmax: the crossJoin+
    // max_by relational form would show a vec_id re-aggregation here
    assert(p.contains("cosine_const"),
      s"assignment must be constant-centroid kernels on the scan:\n${p.take(1200)}")

    def walk(n: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = n +: (n match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        walk(s.plan)
      case o => o.children.flatMap(walk)
    })
    val shuffles = walk(df.queryExecution.executedPlan).collect {
      case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => ex
    }
    // census partials + the cid collect_list + the output range sort
    assert(shuffles.size <= 3,
      s"expected ≤3 shuffles (census, collect_list, sort), got ${shuffles.size}")
  }

  test("pq_topk is one kernel pass: no exchange at all, top-k ranking") {
    val q = Registry.all.find(_.name == "pq_topk").get
    val df = q.fn(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // encode + ADC fused into PqAdcExpr with the codebook as a reference
    // object: the corpus is scanned once and NOTHING shuffles or
    // broadcasts (the former relational form needed an m-way explode and
    // two broadcast joins)
    assert(p.contains("pq_adc"), s"expected the native ADC kernel:\n${p.take(1200)}")
    assert(!p.contains("Exchange"),
      s"scan → kernel → top-k must not exchange:\n${p.take(1200)}")
    assert(p.contains("TakeOrderedAndProject"),
      "ADC ranking must stay a single-pass top-k, never a global sort")
  }

  test("gopher_quality is shuffle-free scan arithmetic") {
    val p = plan("gopher_quality")
    assert(!p.contains("Exchange hashpartitioning"),
      s"quality rules are per-row — no shuffle is justified:\n${p.take(1200)}")
  }

  test("quality/lang/repetition scans run the fused one-pass kernels") {
    // the r14 fused kernels replaced per-statistic re-tokenization; a
    // regression to the WordTokens-array forms re-pays a regex compile +
    // token array per row (KernelAbBench: 2.3-4.4x at sf10)
    Seq("quality_score" -> "token_stats",
        "weighted_sample" -> "token_stats",
        "gopher_quality" -> "token_stats",
        "lang_id" -> "count_in_sets",
        "repetition_score" -> "ngram_stats").foreach { case (name, kernel) =>
      val p = plan(name)
      assert(p.contains(kernel),
        s"$name must scan through the fused $kernel kernel:\n${p.take(1200)}")
      assert(!p.contains("word_tokens("),
        s"$name must not materialize a token array:\n${p.take(1200)}")
    }
  }

  test("top-1-per-group aggregates hash, never sort the full input") {
    // max_by(struct, struct) is SortAggregate-only (struct agg buffers).
    // All-primitive call sites ride MaxByPrim → full codegen
    // HashAggregate; the variable-width payload (top1_per_group carries
    // props: string) rides the MaxByOrd typed aggregate →
    // ObjectHashAggregate. A regression on either re-sorts the full
    // fact table on both exchange sides.
    Seq("grouped_search", "ann_ivf").foreach { name =>
      val p = plan(name)
      assert(p.contains("HashAggregate") && !p.contains("ObjectHashAggregate"),
        s"$name must aggregate on the codegen hash path:\n${p.take(1500)}")
      assert(!p.contains("SortAggregate"),
        s"$name fell back to a full-input sort aggregate:\n${p.take(1500)}")
    }
    val p = plan("top1_per_group")
    assert(p.contains("ObjectHashAggregate"),
      s"top1_per_group must aggregate on the object-hash path:\n${p.take(1500)}")
    assert(!p.contains("SortAggregate"),
      s"top1_per_group fell back to a full-input sort aggregate:\n${p.take(1500)}")
  }

  test("lm_score broadcasts the corpus total, joins on the token key") {
    val q = Registry.all.find(_.name == "lm_score").get
    val df = q.fn(spark, dir)
    df.collect() // let AQE finalize join strategies from real sizes
    val p = df.queryExecution.executedPlan.toString
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[tok".r
        .findFirstIn(p).isDefined,
      s"expected an equi-join keyed on tok:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"),
      "corpus total must broadcast, never a product over rows")
  }

  test("chunk_docs and weighted_sample are shuffle-free scan work") {
    Seq("chunk_docs", "weighted_sample").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name is per-row column work — no shuffle is justified:\n${p.take(1200)}")
    }
  }

  test("rand_proj_topk, rerank_topk, ann_rerank rank via TakeOrderedAndProject") {
    Seq("rand_proj_topk", "rerank_topk", "ann_rerank").foreach { name =>
      val p = plan(name)
      assert(p.contains("TakeOrderedAndProject"), s"$name:\n${p.take(800)}")
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name must not shuffle the corpus:\n${p.take(1200)}")
    }
  }

  test("mix_sources broadcasts the rate table onto the scan") {
    val q = Registry.all.find(_.name == "mix_sources").get
    val df = q.fn(spark, dir)
    df.collect() // let AQE finalize join strategies from real sizes
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"rates must broadcast onto the corpus scan:\n${p.take(1200)}")
    // the corpus side must never shuffle into the join — the only hash
    // exchange is the tiny per-source count aggregate inside the rate
    // subtree (AQE prints initial+final plans, so count-based asserts
    // double; assert the join strategies instead)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus must not shuffle into the rate join:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("percentile_stats windows stay per-(flag,bucket), never per-flag only") {
    val p = plan("percentile_stats")
    // phase-2 within-bucket ranking partitions by (returnflag, bucket) —
    // a per-flag-only window would serialize each group on one task
    assert("hashpartitioning\\(l_returnflag[^,)]*, bucket".r
        .findFirstIn(p).isDefined,
      s"expected a (flag,bucket) partitioning:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "the located-bucket relation must broadcast")
  }

  test("rules_antijoin probes the aggregate output, not every event") {
    // the suppression predicate is on the GROUP key, so the anti-join
    // belongs ABOVE the aggregate (probe ~#groups rows, not the corpus).
    // PushDownLeftSemiAntiJoin rewrites a grouping-key-only condition
    // back below the agg — the always-true `n >= 0` conjunct on the
    // aggregated column blocks that (anti-join conditions cannot be
    // split), and this pin fails if a Spark upgrade or an edit lets the
    // per-event probe sneak back in.
    val q = Registry.all.find(_.name == "rules_antijoin").get
    val p = q.fn(spark, dir).queryExecution.executedPlan.toString
    val agg = p.indexOf("HashAggregate")
    val anti = p.indexOf("LeftAnti")
    assert(anti >= 0 && agg >= 0, p.take(800))
    // plan strings print top-down: the join above the agg appears FIRST
    assert(anti < agg,
      s"anti-join must sit above the aggregate (probe group rows):\n${p.take(1200)}")
  }

  test("bigram_surprisal joins stay keyed, no product") {
    val q = Registry.all.find(_.name == "bigram_surprisal").get
    val df = q.fn(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin) \\[w1".r
        .findFirstIn(p).isDefined,
      s"expected an equi-join keyed on w1:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"),
      "corpus total must broadcast, never a product over rows")
  }
}
