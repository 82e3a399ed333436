package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators — the pipeline steps that sit AFTER
  * the per-document analyses in [[TextOps]] and turn a scored/deduplicated
  * corpus into training input:
  *
  *  - `dedup_clusters`: connected components over the MinHash-LSH pair
  *    graph — the dedup *finisher* that turns pairwise candidates into
  *    per-document cluster assignments (keeper = min doc_id per cluster).
  *  - `pack_sequences`: deterministic sequence packing — assign documents
  *    to fixed-token-budget packs, the step that turns a corpus into
  *    training batches.
  *  - `sample_stratified` / `sample_topk_stratified`: deterministic
  *    hash-based stratified sampling (rate-based and exactly-k) — corpus
  *    rebalancing with reproducible membership.
  *  - `decontaminate`: flag training docs sharing n-grams with a held-out
  *    eval split — test-set hygiene.
  *  - `repetition_score`: duplicate-n-gram-fraction quality signal.
  *
  * All deterministic (hash-derived, no RNG state) so the DuckDB oracle
  * mirrors them exactly; [[graft.api.Curation]] composes the same column
  * helpers into the end-to-end pipeline.
  */
object CurationOps {

  def queries: Seq[QueryDef] =
    Seq(dedupClusters, packSequences, sampleStratified, sampleTopkStratified,
      decontaminate, repetitionScore, mixSources, weightedSample)

  /** 60-bit positive hash of a salted string key — same md5-prefix trick
    * as the other oracle-parity hashes (`conv(substr(md5(s),1,15),16,10)`
    * == DuckDB `('0x'||substr(md5(s),1,15))::BIGINT`). */
  private def hash60(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  private def hash60Sql(salt: String, idExpr: String): String =
    s"('0x' || substr(md5('$salt' || CAST($idExpr AS VARCHAR)), 1, 15))::BIGINT"

  // ----------------------------------------------------------------------
  // dedup_clusters
  // ----------------------------------------------------------------------

  /** Iteration cap for the label-propagation loop: each round widens every
    * label's reach by one hop, so the cap bounds the cluster DIAMETER the
    * operator accepts — near-dup clusters are dense (LSH links most
    * members directly) and sit far below it. Exceeding the cap throws
    * rather than returning a not-yet-converged labeling. */
  val MaxClusterIters = 25

  /** Edge-relation size (2 × the bucket-derived star-edge bound) below
    * which the fixpoint materializes edges as a direct localCheckpoint
    * (fast hop plans, ~0.5-5 GB of deserialized blocks at the cap) and
    * above which it uses the evictable disk-spillable src-partitioned
    * form that survives unbounded membership growth (SCALE.md, sf10
    * decade — proven on the 431M-row clique relation the star form
    * replaced). */
  val EdgeCheckpointMaxRows = 32000000L

  /** Edge-count bound below which components run as ONE driver-side
    * union-find pass over the collected star edges instead of the
    * distributed fixpoint (≤ ~64 MB of edge data; union-find state is
    * node-sized). Override per session with
    * `spark.graft.cc.driverMaxPairs` (tests force the distributed tiers
    * with 0). UNIT CHANGE r14-s2: the conf keeps its name for
    * compatibility but now bounds STAR edges (membership-linear,
    * Σ(n_bucket−1)) where it used to bound clique pairs (quadratic,
    * Σ C(n_bucket,2)) — a value tuned against the old bound admits
    * strictly smaller graphs than before (the bound shrank for the same
    * corpus), so carried-over settings stay safe; they just under-use
    * the driver tier until retuned. */
  val DriverCcMaxPairs = 4000000L

  /** Connected components over the MinHash-LSH candidate graph via
    * min-label propagation WITH pointer jumping: every document's
    * cluster_id converges to the smallest doc_id reachable through
    * near-dup pairs (singletons keep their own id). This is the canonical
    * dedup finisher at warehouse scale — pairs alone don't say *which*
    * rows to keep; components do (keep cluster_id == doc_id, or aggregate
    * per cluster). The iterated edge relation is the connectivity-
    * equivalent STAR form of each LSH bucket (member → bucket min,
    * [[TextOps.starEdgesFromBuckets]]) — identical components to the
    * full bucket cliques at Σ(n−1) instead of Σ C(n,2) edges, which is
    * the difference between membership-linear and bucket-quadratic work
    * on a duplication-heavy corpus.
    *
    * The fixpoint loop iterates ONLY over nodes that appear in the edge
    * relation. A document with no candidate pair can never change label,
    * and in a real corpus singletons are the overwhelming majority — so
    * the iterated table scales with the near-dup GRAPH, not the corpus;
    * singletons rejoin at the end as `lbl = id` via one anti-join against
    * the converged node set. The seed already performs the first
    * neighbor-min round as a single aggregate over the edges (both edge
    * directions are materialized, so `groupBy(dst)` covers every graph
    * node), and each loop round does (1) a neighbor-min step
    * (edges⋈labels + min-agg) and (2) TWO shortcut steps lbl ← lbl(lbl)
    * (labels⋈labels) — pointer jumps that each double every label's
    * effective reach, giving O(log diameter) rounds instead of
    * O(diameter) (plain propagation measured 10 rounds on the sf0.1
    * fixture, single-jump 7, this form 3). Every step preserves the
    * invariant "lbl(x) is reachable from x and ≥ the component minimum"
    * (each lbl value is itself a graph-node id, and each jump's right
    * side is keyed by the unique `id`, so the inner self-join neither
    * loses nor duplicates rows), and labels only ever decrease, so the
    * fixpoint is exactly the component minimum. `localCheckpoint` after
    * each round truncates the lineage so plan size stays constant;
    * convergence is detected by the label-sum fixpoint (an unchanged
    * exact decimal sum == no label moved) — an O(1)-row aggregate per
    * round, never a collect of the data.
    *
    * Reusable core of the `dedup_clusters` gate query, also composed by
    * [[graft.api.Curation]]. */
  def connectedComponents(docs: DataFrame): DataFrame =
    connectedComponents(docs, None, _ => ())

  /** [[connectedComponents]] with the optional LSH bucket-size recall cap
    * (see `TextOps.minhashBuckets`' capped overload). When capped,
    * `onCapMetrics` receives `over_cap_entries` / `over_cap_buckets`
    * once the candidate graph has materialized — the recall-cost number
    * the composed pipeline surfaces per stage ([[graft.api.Curation]]).
    * The gate query passes no cap (its oracle models the full join). */
  def connectedComponents(docs: DataFrame, bucketCap: Option[Int],
      onCapMetrics: Map[String, Long] => Unit): DataFrame = {
    import docs.sparkSession.implicits._
    val capObs = bucketCap.map(_ => org.apache.spark.sql.Observation())
    val buckets = TextOps.minhashBuckets(docs, bucketCap, capObs)
    // The edge relation is the STAR form, not the bucket cliques:
    // connectivity only needs every bucket member linked to the bucket's
    // min doc_id — identical components (see `starEdgesFromBuckets`'
    // proof sketch) at Σ(n_bucket − 1) edges instead of Σ C(n_bucket, 2).
    // This is what keeps clustering LINEAR in bucket membership while the
    // pair-enumeration gates (`lsh_pairs`) stay quadratic by contract:
    // measured sf10, the same corpus that produced 431M clique pairs
    // yields the same clusters from the star relation at membership
    // scale, and the independent CcCheck validator still re-derives the
    // full cliques when proving the output.
    //
    // UPPER BOUND on star edges from bucket sizes alone: Σ (n_bucket − 1)
    // counts every member-to-root edge before distinct(), so it can only
    // overestimate the edge relation. One cheap agg over the bucket
    // relation (this is also the action that materializes the bucket
    // cache the star join reads), paid BEFORE the edges exist — which
    // lets the small-graph path below skip the repartition shuffle and
    // persist pass entirely instead of deciding after a materialization
    // it then throws away (the r11 adaptive form cost the gate-scale
    // query an extra shuffle + copy; BenchOne A/B r12). Overestimating is
    // safe in exactly one direction: a graph the bound calls big but is
    // small runs the scale path (correct, modestly slower); a graph the
    // bound calls small IS small.
    val estEdges = buckets.groupBy($"band_idx", $"band_hash").count()
      .agg(coalesce(sum(expr("count - 1")), lit(0L)))
      .head().getLong(0)
    val pairs = TextOps.starEdgesFromBuckets(buckets)
    val spark = docs.sparkSession
    // DRIVER-SIZED tier: when the edge bound fits comfortably on the
    // driver, the whole fixpoint machinery is overhead — collect the
    // star edges (≤ cap × 16 B of data) and run the exact min-rooted
    // union-find in one pass (the same kernel CcCheck validates the
    // distributed output with; the DuckDB recursive-CTE oracle stays the
    // independent gate). Labels broadcast back onto the corpus as one
    // join — the corpus itself never shuffles. This is the broadcast-join
    // analogue for iterative graph work: the star relation is bounded by
    // bucket MEMBERSHIP (docs × bands), so at gate scale it is KBs-MBs
    // while the corpus is the big thing; the distributed tiers remain
    // for graphs that outgrow the driver (BenchOne same-session:
    // dedup_clusters 3.5 → 1.8 s at sf0.1).
    val driverMax = spark.conf.getOption("spark.graft.cc.driverMaxPairs")
      .map(_.toLong).getOrElse(DriverCcMaxPairs)
    if (estEdges <= driverMax) {
      val edges = pairs.as[(Long, Long)].collect()
      buckets.unpersist()
      capObs.foreach { o =>
        onCapMetrics(o.get.collect { case (k, v: Long) => k -> v }.toMap)
      }
      val labeled = CcCheck.labeledNodes(edges.toSeq)
      val labelsDf = spark.createDataFrame(labeled).toDF("doc_id", "lbl")
      return docs.select($"doc_id")
        .join(broadcast(labelsDf), Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"lbl", $"doc_id").as("cluster_id"))
    }
    // both directions in ONE pass over the star relation (a two-branch
    // union would recompute the bucket join once per direction),
    // materialized once — read by every iteration. A plain persist, not
    // localCheckpoint, above the threshold: on the pre-star CLIQUE
    // relation the checkpoint's non-recomputable deserialized blocks
    // starved the pair join of execution memory and OOM'd a 48 GB JVM
    // (431M edge rows from 500k docs; the r11 decade sweep's find) — the
    // star form is membership-bounded, but a pathological corpus (every
    // doc in one bucket per band at 100 TB) still reaches the same
    // blow-up through sheer membership, so the evictable tier stays. A
    // plain persist keeps lineage, so its blocks are EVICTABLE: memory
    // pressure degrades to spill-to-disk/recompute instead of failing
    // the job, while gate-scale corpora keep deserialized in-memory
    // blocks with zero per-hop decode cost (a SER level measured +150%
    // on the sf1 fixpoint — decode per hop — for no benefit once blocks
    // can evict). The per-NODE label state below stays localCheckpoint'd
    // — it is small and its lineage must truncate or the iterative plan
    // grows. Pre-partitioned on the JOIN KEY: every fixpoint hop joins
    // edges on src, and an un-partitioned edge relation would re-shuffle
    // all of them per hop — shuffle files live for the whole job, so an
    // iterative plan accumulates rounds × edge-sized spill until the
    // disk fills (measured at sf10 on the clique relation: 431M edges ×
    // ~4 rounds ran a 72 GB volume dry). Partitioned once here, each
    // hop's join reuses the persisted partitioning and only the
    // NODE-sized label relation crosses the wire per hop.
    val edgesBase = pairs.select(explode(array(
        struct($"a_id".as("src"), $"b_id".as("dst")),
        struct($"b_id".as("src"), $"a_id".as("dst")))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst"))
    // ADAPTIVE on the edge-count BOUND (the true scale variable — doc
    // count is a bad proxy because bucket membership concentrates with
    // duplication): a provably-small graph takes the direct
    // localCheckpoint (one materialization pass, no repartition shuffle,
    // fast RDD-backed hop plans — the r10 form); past the threshold it
    // takes the repartitioned evictable persist, the only form the sf10
    // sweep showed SURVIVES (checkpoint's non-evictable blocks OOM'd at
    // any heap, un-partitioned hops filled a 72 GB volume with
    // per-round edge shuffles).
    val checkpointMax = spark.conf
      .getOption("spark.graft.cc.edgeCheckpointMaxRows")
      .map(_.toLong).getOrElse(EdgeCheckpointMaxRows)
    val edges =
      if (estEdges * 2 <= checkpointMax)
        edgesBase.localCheckpoint()
      else {
        val e = edgesBase.repartition($"src")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count() // eager: one pair-join pass into the blocks
        e
      }
    // the edge materialization above ran the (observed) bucket relation,
    // so the cap metrics are final here — get() cannot block; and the
    // LSH bucket cache is dead weight from here — release it now rather
    // than leaking one cached relation per call in a long-lived session
    // (this is a reusable library entry point)
    buckets.unpersist()
    capObs.foreach { o =>
      onCapMetrics(o.get.collect { case (k, v: Long) => k -> v }.toMap)
    }
    // seed = round 1 fused: lbl0(x) = min(x, min neighbor(x)), one
    // aggregate over the edge relation, graph nodes only
    var labels = edges.groupBy($"dst".as("id"))
      .agg(min($"src").as("nmin"))
      .select($"id", least($"id", $"nmin").as("lbl"))
      .localCheckpoint()
    // fixpoint metric: exact decimal sum of all labels — labels only
    // ever decrease, so an unchanged sum == converged; decimal(38,0)
    // because a LONG sum of 64-bit ids overflows past ~1e7 rows. The sum
    // rides the SAME job that materializes the round's checkpoint
    // (Dataset.observe → accumulator-backed metric), so each round is ONE
    // Spark job, not a materialize + a re-read aggregate.
    def jump(df: DataFrame): DataFrame = df
      .join(df.select($"id".as("lid"), $"lbl".as("llbl")), $"lbl" === $"lid")
      .select($"id", least($"lbl", $"llbl").as("lbl"))
    val sumCol = sum($"lbl".cast("decimal(38,0)")).as("label_sum")
    var lastSum = labels.agg(sumCol).head().getDecimal(0)
    // zero LSH candidate pairs (a clean shard): the edge relation is empty,
    // the label sum aggregates to NULL, and there is nothing to iterate —
    // every document is its own cluster
    if (lastSum == null) {
      edges.unpersist()
      labels.unpersist()
      return docs.select($"doc_id", $"doc_id".as("cluster_id"))
    }
    var converged = false
    var it = 0
    while (!converged && it < MaxClusterIters) {
      // TWO edge propagations per round (then two pointer jumps): the
      // LSH components are hop-limited, not chain-limited — measured at
      // sf0.1 this halves the round count (6 → 4) for the same total
      // work, and at cluster scale the per-round fixed cost (scheduling
      // barriers, checkpoint job) is what dominates an iterative plan.
      val prop = edges.join(labels, $"src" === $"id")
        .select($"dst".as("id"), $"lbl")
      val hopped1 = labels.union(prop).groupBy($"id")
        .agg(min($"lbl").as("lbl"))
      val prop2 = edges.join(hopped1, $"src" === $"id")
        .select($"dst".as("id"), $"lbl")
      val hopped = hopped1.union(prop2).groupBy($"id")
        .agg(min($"lbl").as("lbl"))
      val obs = org.apache.spark.sql.Observation()
      val next = jump(jump(hopped)).observe(obs, sumCol).localCheckpoint()
      val nextSum = obs.get("label_sum").asInstanceOf[java.math.BigDecimal]
      labels.unpersist()
      labels = next
      converged = nextSum.compareTo(lastSum) == 0
      lastSum = nextSum
      it += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] round $it labelSum=$nextSum converged=$converged")
    }
    // the fixpoint loop is done with the edge blocks — release them. The
    // FINAL labels checkpoint is deliberately retained: the returned frame
    // reads from it (localCheckpoint truncates lineage, so unpersisting
    // would break the result); one labels-sized block set per call is the
    // documented cost of calling connectedComponents. Singletons anti-join
    // against that SAME retained checkpoint (its id set == the graph node
    // set, constant across rounds) — never against the released edges.
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"dedup_clusters did not converge in $MaxClusterIters iterations — " +
        "a component wider than the declared diameter bound")
    val singletons = docs.select($"doc_id".as("id"))
      .join(labels, Seq("id"), "left_anti")
      .select($"id", $"id".as("lbl"))
    labels.union(singletons)
      .select($"id".as("doc_id"), $"lbl".as("cluster_id"))
  }

  private val dedupClusters = QueryDef(
    "dedup_clusters",
    (s, dir) => {
      import s.implicits._
      connectedComponents(Tables.documents(s, dir)).orderBy($"doc_id")
    },
    Some(s"""
      WITH RECURSIVE ${TextOps.minhashLshPairsSql},
      edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION ALL
        SELECT b_id AS src, a_id AS dst FROM pairs),
      reach(id, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id)
      SELECT id AS doc_id, min(lbl) AS cluster_id
      FROM reach
      GROUP BY id
      ORDER BY doc_id
    """))

  // ----------------------------------------------------------------------
  // pack_sequences
  // ----------------------------------------------------------------------

  /** Token budget per pack (a training batch's sequence capacity). */
  val PackBudget = 2048L

  /** pack_id = shard * PackIdBase + within-shard bin: 2^40 bins per shard
    * before collision — ≈2.3 petatokens per shard at the default budget
    * (the old 10^6 base collided at ~2 gigatokens/shard, real at 100 TB). */
  val PackIdBase: Long = 1L << 40

  /** Shards packed independently — the parallelism unit. At 100 TB the
    * shard count scales with the corpus (each training worker packs its
    * own shard), so no window ever sees more than one shard's rows. */
  val PackShards = 16L

  /** Deterministic sequence packing: documents are hashed into
    * [[PackShards]] shards, ordered by doc_id within the shard, and
    * assigned to packs wherever the running token total crosses a
    * [[PackBudget]] boundary (a document always lands in the pack its
    * PRECEDING cumulative total points at — first-fill-then-advance, the
    * standard streaming packing rule; oversized documents occupy packs
    * alone).
    *
    * Scale shape: one shuffle on the shard key, then a per-shard window
    * cumsum — the window partitions by shard, so its sort is bounded by
    * shard size, never the corpus; at scale shard count grows with data
    * (mirroring per-worker packing in training pipelines) and the whole
    * operator stays one exchange. */
  private val packSequences = QueryDef(
    "pack_sequences",
    (s, dir) => {
      import s.implicits._
      packColumns(Tables.documents(s, dir).select($"doc_id", $"text"))
        .select($"doc_id", $"shard", $"n_tok", $"pack_id")
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id,
          ${hash60Sql("pack:", "doc_id")} % $PackShards AS shard,
          CAST(len(list_filter(string_split_regex(text, '\\s+'),
            x -> len(x) > 0)) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, shard, n_tok,
          SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT doc_id, shard, n_tok,
        shard * ${PackIdBase}::BIGINT + CAST(floor(CAST(cum - n_tok AS DOUBLE) / $PackBudget.0) AS BIGINT)
          AS pack_id
      FROM c
      ORDER BY doc_id
    """))

  // ----------------------------------------------------------------------
  // sample_stratified
  // ----------------------------------------------------------------------

  /** Per-language keep rates in thousandths: downsample dominant English,
    * keep the rarest stratum whole — corpus rebalancing. Unlisted
    * languages drop (rate 0). */
  val StratRates: Seq[(String, Long)] = Seq(
    "en" -> 250L, "es" -> 500L, "de" -> 500L, "fr" -> 500L, "zh" -> 1000L)

  /** Deterministic stratified sampling: membership is `hash(doc_id) mod
    * 1000 < rate(lang)` — reproducible across runs/engines (no RNG state),
    * the property training-data curation needs for auditable subsets.
    * Scale shape: pure per-row filter on the scan, no shuffle at all;
    * rates are a literal CASE (at scale: a broadcast dim table). */
  private val sampleStratified = QueryDef(
    "sample_stratified",
    (s, dir) => {
      import s.implicits._
      val rate = StratRates.foldRight(lit(0L): Column) { case ((l, r), acc) =>
        when($"lang" === l, lit(r)).otherwise(acc)
      }
      Tables.documents(s, dir)
        .select($"doc_id", $"lang",
          (hash60("strat:", $"doc_id") % 1000L).as("bucket"), rate.as("rate"))
        .filter($"bucket" < $"rate")
        .select($"doc_id", $"lang", $"bucket")
        .orderBy($"doc_id")
    },
    Some {
      val cases = StratRates
        .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")
      s"""
      WITH t AS (
        SELECT doc_id, lang,
          ${hash60Sql("strat:", "doc_id")} % 1000 AS bucket,
          CASE $cases ELSE 0 END AS rate
        FROM documents)
      SELECT doc_id, lang, bucket
      FROM t
      WHERE bucket < rate
      ORDER BY doc_id
    """
    })

  /** Fixed sample size per stratum. */
  val StratTopK = 50

  /** Exactly-k-per-stratum sampling: the k documents with the SMALLEST
    * salted hash per language — a deterministic reservoir ("hash-order
    * sample"), reproducible across engines and incremental loads (a doc's
    * rank never changes as unrelated docs arrive). Runs on the custom
    * [[graft.plans.TopKPerGroup]] operator: one clustering exchange,
    * bounded k-row buffers per group, no per-group sort — the window
    * row_number form (what the DuckDB oracle uses) would sort every
    * stratum at scale. */
  private val sampleTopkStratified = QueryDef(
    "sample_topk_stratified",
    (s, dir) => {
      import s.implicits._
      val base = Tables.documents(s, dir)
        .select($"doc_id", $"lang", hash60("strat:", $"doc_id").as("hk"))
      graft.plans.TopKPerGroup(base, Seq("lang"),
          Seq(("hk", true), ("doc_id", true)), StratTopK)
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, lang, ${hash60Sql("strat:", "doc_id")} AS hk
        FROM documents),
      r AS (
        SELECT doc_id, lang, hk,
          row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
        FROM t)
      SELECT doc_id, lang, hk
      FROM r
      WHERE rn <= $StratTopK
      ORDER BY doc_id
    """))

  // ----------------------------------------------------------------------
  // decontaminate
  // ----------------------------------------------------------------------

  /** N-gram width for contamination matching (the 8-13 range is the
    * published convention; 8 here since the synthetic docs are short). */
  val DecontamN = 8

  /** Every 20th doc_id stands in for the held-out benchmark set. In
    * production the eval side is a FIXED benchmark suite (size independent
    * of corpus scale — genuinely broadcastable); the modulo split just
    * gives the gate a deterministic eval set inside one table. */
  val DecontamEvalMod = 20L

  /** Test-set decontamination: flag training documents sharing any
    * [[DecontamN]]-gram with the eval split, with the count of distinct
    * shared grams as evidence. The standard training-data hygiene pass.
    *
    * Scale shape: eval grams are distinct-reduced first (the relation is
    * benchmark-sized, not corpus-sized), then one equi-join on the gram
    * key against the training explode — AQE broadcasts the eval side when
    * it fits, and the training side never shuffles more than (doc, gram)
    * pairs. No similarity math on the hot path; membership only. */
  private val decontaminate = QueryDef(
    "decontaminate",
    (s, dir) => {
      import s.implicits._
      def grams(df: DataFrame) = df.select($"doc_id",
        explode(graft.GraftFunctions.columnOf(graft.functions.WordNgrams(
          graft.GraftFunctions.exprOf($"text"), DecontamN))).as("gram"))
      val docs = Tables.documents(s, dir)
      val evalGrams = grams(docs.filter($"doc_id" % DecontamEvalMod === 0))
        .select($"gram").distinct()
      grams(docs.filter($"doc_id" % DecontamEvalMod =!= 0))
        .join(evalGrams, Seq("gram"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy($"doc_id")
    },
    Some {
      val g = (0 until DecontamN).map(j => s"ts[i+$j]").mkString(" || ' ' || ")
      s"""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS ts
        FROM documents),
      grams AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(len(ts) - ${DecontamN - 2}, 1)), i -> $g))) AS gram
        FROM toks),
      ev AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % $DecontamEvalMod = 0)
      SELECT g.doc_id, count(*) AS n_shared
      FROM grams g JOIN ev ON g.gram = ev.gram
      WHERE g.doc_id % $DecontamEvalMod <> 0
      GROUP BY g.doc_id
      ORDER BY g.doc_id
    """
    })

  // ----------------------------------------------------------------------
  // repetition_score
  // ----------------------------------------------------------------------

  /** The repetition score as one column expression (math of
    * `repetition_score`, reused by [[graft.api.Curation]]). Both counts
    * come from the fused one-pass [[graft.functions.NgramStats]] kernel
    * (was: a WordTokens array + a WordNgrams distinct-gram array — two
    * tokenize passes materializing every gram string); values identical
    * (TokenStatsKernelSpec). */
  def repetitionCol(text: Column): Column = {
    val st = graft.GraftFunctions.columnOf(graft.functions.NgramStats(
      graft.GraftFunctions.exprOf(text), 3))
    val nToks = st.getField("n_toks")
    val nDistinct = st.getField("n_distinct")
    // exact-rational 6-dp HALF_UP: floor((2e6·a + q)/(2q))/1e6 over the
    // integer numerator a = (n_toks-2) - n_distinct and denominator
    // q = n_toks-2 — immune to the cross-engine round()-of-double
    // boundary divergence (see lmScores)
    when(nToks <= 2, lit(0.0)).otherwise(
      floor((((nToks - 2) - nDistinct) * 2000000L + (nToks - 2)).cast("double") /
        ((nToks - 2) * 2L).cast("double")) / 1000000.0)
  }

  /** Membership filter of `sample_stratified` as a boolean column.
    * `defaultRate` (per-1000) applies to languages absent from `rates`:
    * 0 = drop unlisted strata (the gate query's semantics), 1000 =
    * keep-all (the lossless library default in
    * [[graft.api.Curation.Config]]). */
  def stratSampleKeep(docId: Column, lang: Column,
      rates: Seq[(String, Long)] = StratRates,
      defaultRate: Long = 0L): Column = {
    val rate = rates.foldRight(lit(defaultRate): Column) { case ((l, r), acc) =>
      when(lang === l, lit(r)).otherwise(acc)
    }
    (hash60("strat:", docId) % 1000L) < rate
  }

  /** Shard + token-count + pack-id columns of `pack_sequences`, appended
    * to any frame with (`idCol`, `textCol`). */
  def packColumns(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", budget: Long = PackBudget,
      shards: Long = PackShards): DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", hash60("pack:", col(idCol)) % shards)
      .withColumn("n_tok",
        graft.functions.TextFunctions.tokenCountWs(col(textCol)).cast("long"))
      .withColumn("cum", sum($"n_tok").over(w))
      .withColumn("pack_id", $"shard" * PackIdBase +
        floor(($"cum" - $"n_tok").cast("double") / budget.toDouble).cast("long"))
      .drop("cum")
  }

  /** Within-document repetition: 1 − (distinct 3-grams / total 3-gram
    * windows) — the duplicate-n-gram-fraction quality signal (high =
    * boilerplate/looping text). Pure per-row arithmetic over the native
    * [[graft.functions.WordNgrams]] kernel (distinct) and the token count
    * (total windows = tokens − n + 1); no shuffle at all. */
  private val repetitionScore = QueryDef(
    "repetition_score",
    (s, dir) => {
      import s.implicits._
      // fused NgramStats kernel — see repetitionCol
      val st = graft.GraftFunctions.columnOf(graft.functions.NgramStats(
        graft.GraftFunctions.exprOf($"text"), 3))
      val nToks = st.getField("n_toks")
      val nDistinct = st.getField("n_distinct")
      Tables.documents(s, dir)
        .select($"doc_id", nToks.as("n_toks"), nDistinct.as("n_distinct"))
        .select($"doc_id", $"n_toks", $"n_distinct",
          // exact-rational 6-dp rounding — see repetitionCol
          when($"n_toks" <= 2, lit(0.0)).otherwise(
            floor(((($"n_toks" - 2) - $"n_distinct") * 2000000L +
                ($"n_toks" - 2)).cast("double") /
              (($"n_toks" - 2) * 2L).cast("double")) / 1000000.0)
            .as("repetition"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS ts
        FROM documents),
      f AS (
        SELECT doc_id,
          CAST(len(ts) AS BIGINT) AS n_toks,
          CAST(len(list_distinct(list_transform(
            range(1, greatest(len(ts) - 1, 1)),
            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS BIGINT) AS n_distinct
        FROM toks)
      SELECT doc_id, n_toks, n_distinct,
        CASE WHEN n_toks <= 2 THEN 0.0
             ELSE floor((((n_toks - 2) - n_distinct) * 2000000 + (n_toks - 2))::DOUBLE
                    / (((n_toks - 2) * 2))::DOUBLE) / 1000000.0
        END AS repetition
      FROM f
      ORDER BY doc_id
    """))

  // ----------------------------------------------------------------------
  // mix_sources
  // ----------------------------------------------------------------------

  /** Target output mixture over the source allowlist, in permille
    * (sources not listed are dropped — a domain allowlist + reweight in
    * one pass). */
  val MixTargets: Seq[(String, Long)] = Seq(
    "src0" -> 500L, "src1" -> 300L, "src2" -> 200L)

  /** Domain-mixture rebalancing: downsample each allowlisted source so
    * the OUTPUT matches a declared target mixture — the domain-reweighting
    * pass every pretraining pipeline runs between curation and packing
    * (a corpus is never mixed the way the crawl happened to arrive).
    * Downsampling-only: the feasible output total is
    * `Nout = min_s(n_s·1000 div t_s)` (the binding source keeps
    * everything); per-source keep counts `k_s = t_s·Nout div 1000` become
    * hash-bucket rates `r_s = k_s·1000 div n_s`. ALL integer division,
    * mirrored with `//` in the oracle — no float rounding to diverge on.
    * Membership is the same salted-hash determinism as
    * `sample_stratified`, so a doc's verdict never changes across runs or
    * engines.
    *
    * Scale shape: one tiny per-source count aggregate (20 rows here,
    * thousands at 100 TB), a scalar min, and a broadcast rate join onto
    * the scan — the corpus itself is touched once, shuffle-free. */
  /** The `mix_sources` stage as a reusable filter: `docs` (any schema
    * with doc_id + `source`) restricted to the allowlisted sources and
    * downsampled to the target mixture, all columns preserved. One lazy
    * DAG — the per-source counts, the min-capacity scalar, and the rate
    * join are subtrees of the returned plan. */
  def mixSourceFilter(docs: DataFrame,
      targets: Seq[(String, Long)] = MixTargets): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.functions.expr
    val listed = docs.filter($"source".isin(targets.map(_._1): _*))
    // Every TARGET source contributes a count row (ns = 0 when absent from
    // the corpus): downsampling-only cannot invent rows, so a missing
    // target makes the declared mixture infeasible and the output is EMPTY
    // (nout = min includes 0) — never a silently redistributed mixture.
    val targetDf = targets.toDF("source", "ts")
    val observed = listed.groupBy($"source").agg(count(lit(1)).as("ns"))
    val counts = targetDf.join(observed, Seq("source"), "left")
      .select($"source", coalesce($"ns", lit(0L)).as("ns"), $"ts")
    val nout = counts.agg(expr("min(ns * 1000 div ts)").as("nout"))
    val rates = counts.crossJoin(broadcast(nout))
      .select($"source", when($"ns" === 0L, lit(0L))
        .otherwise(expr("((ts * nout div 1000) * 1000) div ns")).as("rate"))
    listed
      .join(broadcast(rates), Seq("source"))
      .filter((hash60("mix:", $"doc_id") % 1000L) < $"rate")
      .drop("rate")
  }

  private val mixSources = QueryDef(
    "mix_sources",
    (s, dir) => {
      import s.implicits._
      mixSourceFilter(Tables.documents(s, dir))
        .select($"doc_id", $"source",
          (hash60("mix:", $"doc_id") % 1000L).as("bucket"))
        .orderBy($"doc_id")
    },
    Some {
      val inList = MixTargets.map(t => s"'${t._1}'").mkString(", ")
      val cases = MixTargets
        .map { case (l, t) => s"WHEN source = '$l' THEN $t" }.mkString(" ")
      s"""
      WITH listed AS (
        SELECT doc_id, source FROM documents WHERE source IN ($inList)),
      counts AS (
        SELECT source, count(*) AS ns, CASE $cases ELSE 0 END AS ts
        FROM listed GROUP BY source),
      nout AS (SELECT min(ns * 1000 // ts) AS nout FROM counts),
      rates AS (
        SELECT source, ((ts * nout // 1000) * 1000) // ns AS rate
        FROM counts, nout)
      SELECT doc_id, source,
        ${hash60Sql("mix:", "doc_id")} % 1000 AS bucket
      FROM listed JOIN rates USING (source)
      WHERE ${hash60Sql("mix:", "doc_id")} % 1000 < rate
      ORDER BY doc_id
    """
    })

  // ----------------------------------------------------------------------
  // weighted_sample
  // ----------------------------------------------------------------------

  /** Quality-weighted sampling: keep each document with probability equal
    * to its [0,1] quality score — the importance-resampling pass (keep
    * good text with high probability, bad text with low, instead of a
    * hard threshold) — made deterministic by comparing the score against
    * a salted hash bucket instead of an RNG draw: `keep ⟺
    * hash(doc) mod 10⁶ < floor(quality·10⁶)`. The score is already
    * rounded at 6 dp, so the floor'd micro-bucket threshold is the same
    * IEEE double on both engines (floor pinned explicitly — Spark's
    * BIGINT cast truncates where DuckDB's rounds). Scan-parallel:
    * quality arithmetic + hash + compare on the scan, no shuffle. */
  /** The `weighted_sample` membership predicate (P(keep) = the [0,1]
    * quality score, decided by salted-hash micro-bucket) — reusable by
    * [[graft.api.Curation]]'s quality-weighted stage. */
  def qualityWeightedKeep(docId: Column, text: Column): Column =
    (hash60("wq:", docId) % 1000000L) <
      floor(graft.functions.TextFunctions.qualityScore(text) * 1000000.0)

  private val weightedSample = QueryDef(
    "weighted_sample",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(qualityWeightedKeep($"doc_id", $"text"))
        .select($"doc_id",
          graft.functions.TextFunctions.qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH f AS (
        SELECT doc_id,
          len(text)::DOUBLE AS n_chars,
          greatest(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            t -> len(t) > 0))::DOUBLE, 1.0) AS n_toks,
          len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
            t -> list_contains([${graft.functions.TextFunctions.Stopwords.map("'" + _ + "'").mkString(", ")}], t)))::DOUBLE AS n_stop,
          len(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE AS n_punct
        FROM documents),
      q AS (
        SELECT doc_id,
          round(least(n_chars / 500.0, 1.0) * 0.4
            + least(n_stop / n_toks * 3.0, 1.0) * 0.4
            + (1.0 - least(n_punct / greatest(n_chars, 1.0) * 5.0, 1.0)) * 0.2,
            6) AS quality
        FROM f)
      SELECT doc_id, quality
      FROM q
      WHERE ${hash60Sql("wq:", "doc_id")} % 1000000 < floor(quality * 1000000.0)
      ORDER BY doc_id
    """))
}
