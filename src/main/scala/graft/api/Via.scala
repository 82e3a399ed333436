package graft.api

import graft.control.{Evals, Rules, SchemaEngine, SchemaRegistry}
import graft.search.ClusterSearch
import graft.streaming.{AnalysisJob, IngestPipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The engine's user-facing surface: one Scala method per REST verb of the
  * reference (`/root/reference/app/api/v1/router.py:6-10`). A user of the
  * reference can run every query they run today through this object; no
  * HTTP server is required for parity (SURVEY §7.1 `api/`).
  *
  * Construction wires the store paths once; everything else is stateless
  * DataFrame plans over them.
  *
  * @param warehouse root directory: `tier1/`, `tier2/`, `rules`, `schemas`,
  *                  `evals/`, `checkpoints/`, `graphidx/` live under it
  * @param graphServeThreshold Tier-2 corpus size (graph-index node count)
  *                  above which `clusters`/`triage` serve through the
  *                  graph ANN leg instead of the exact scan — mirroring
  *                  the reference's always-HNSW Tier-2 while keeping the
  *                  exact path where scanning is cheaper than probing.
  *                  -1 (the default) routes EACH VERB at its own measured
  *                  crossover ([[Via.ClustersServeThreshold]] /
  *                  [[Via.TriageServeThreshold]] — triage's exact scan
  *                  stays competitive far longer because its query vector
  *                  is one cheap filtered average while clusters pays a
  *                  full-text match per row; SCALE.md crossover table); an
  *                  explicit value overrides BOTH verbs (the r12-and-
  *                  earlier behavior, used by benches to force one path).
  * @param clustersServeThreshold per-verb override for `clusters` (-1 =
  *                  inherit `graphServeThreshold` resolution)
  * @param triageServeThreshold per-verb override for `triage` (-1 =
  *                  inherit `graphServeThreshold` resolution)
  */
final class Via(spark: SparkSession, warehouse: String,
    graphServeThreshold: Long = -1L,
    clustersServeThreshold: Long = -1L,
    triageServeThreshold: Long = -1L) {

  private def resolveThreshold(perVerb: Long, verbDefault: Long): Long =
    if (perVerb >= 0) perVerb
    else if (graphServeThreshold >= 0) graphServeThreshold
    else verbDefault
  /** Resolved routing gates (node count at/above which the verb serves
    * through the graph index). */
  private[graft] val clustersGate: Long =
    resolveThreshold(clustersServeThreshold, Via.ClustersServeThreshold)
  private[graft] val triageGate: Long =
    resolveThreshold(triageServeThreshold, Via.TriageServeThreshold)

  val tier1Path = s"$warehouse/tier1"
  val tier2Path = s"$warehouse/tier2"
  val graphIndexPath = s"$warehouse/graphidx"
  val rules = new Rules(spark, s"$warehouse/rules")
  val schemas = new SchemaRegistry(spark, s"$warehouse/schemas")
  val evals = new Evals(s"$warehouse/evals")

  private def tier1: DataFrame = spark.read.parquet(tier1Path)
  private def tier2: DataFrame =
    pinnedTier2.getOrElse(spark.read.parquet(tier2Path))

  // --- serving snapshot (VERDICT r10 #4) -------------------------------
  // The searcher/commit-point model: a serving deployment pins a Tier-2
  // snapshot in executor memory so every clusters/triage call reads the
  // in-memory relation instead of re-listing and re-scanning parquet,
  // and refreshes the pin when the store advances (after promotion
  // batches / maintenance). Unpinned behavior is unchanged: each call
  // reads the store fresh.
  @volatile private var pinnedTier2: Option[DataFrame] = None
  // layout of the CURRENT pin, so refreshes re-pin with the same layout:
  // a deployment that opted into the hash-clustered layout must not have
  // it silently reverted by a maintenance sweep's repin (ADVICE r12)
  @volatile private var pinnedLayoutHash: Boolean = false

  /** Pin the current Tier-2 store as the serving snapshot (caches it in
    * executor memory; the first call pays the materialization).
    *
    * The snapshot is a FILE-LIST plan, not a root read (r13): Spark's
    * CacheManager substitutes a cached plan into any same-session query
    * containing an equal fragment, so a root-read pin would both hijack
    * every other reader of the store AND break its own refresh (the
    * repin's identical plan no-ops against the displaced entry, which
    * the swap then unpersists). Engine reads that must see the live
    * store still go through [[liveTier2Read]] as belt-and-braces
    * against any OTHER cached plan a session user may hold.
    * Synchronized with [[unpinServing]] so the displaced snapshot is
    * always the one unpersisted: two unsynchronized concurrent calls
    * could both read the same `old`, both unpersist it, and leave one of
    * the two freshly cached snapshots persisted but unreferenced —
    * leaking executor cache memory until session end (ADVICE r11). The
    * cache materialization runs outside the lock; only the
    * swap-and-unpersist is serialized. */
  def pinServing(): Unit = pinServing(clusterByHash = false)

  /** [[pinServing]] with the cache LAYOUT exposed. The in-memory
    * columnar cache keeps per-batch column stats and prunes batches
    * against filters (`spark.sql.inMemoryColumnarStorage
    * .partitionPruning`), so the snapshot's row order decides which
    * serving filters get cheap batch skipping — layout must follow the
    * DOMINANT lookup key, exactly like on-disk stores. The default
    * (raw scan order ≈ dt/time order) serves the time-windowed verbs;
    * `clusterByHash = true` range-clusters by `rhythm_hash` instead,
    * trading that away for hash-IN skipping (triage example-vector
    * lookups). Measured SAME-PROCESS on the 600k ServeBench store at 8
    * mixed callers: time order 22.2 QPS vs hash order 5.6 — the mixed
    * workload is ts-window-dominated, so hash clustering is opt-in for
    * hash-lookup-heavy deployments only. */
  def pinServing(clusterByHash: Boolean): Unit = {
    // the snapshot is built from the EXPLICIT file list, not a root
    // read, for two reasons (r13): (a) a REPIN's root read is
    // plan-equal to the displaced pin, so `.cache()` no-ops against the
    // old entry and the subsequent unpersist evicts it — leaving the
    // "refreshed" pin uncached (default layout) or, under the hash
    // layout, re-caching content CacheManager substituted from the
    // STALE snapshot; (b) a file-list plan is never substituted into
    // other readers' root reads, so one Via's pin no longer silently
    // hijacks every other same-session reader of the store. The frozen
    // file list IS the snapshot lineage the pin model wants.
    val raw = liveTier2Read()
    val rawFiles = raw.inputFiles
    val df = (if (clusterByHash && raw.columns.contains("rhythm_hash"))
        raw.repartitionByRange(
            org.apache.spark.sql.functions.col("rhythm_hash"))
          .sortWithinPartitions("rhythm_hash")
      else raw)
      .cache()
    df.count()
    val displaced = pinLock.synchronized {
      val old = pinnedTier2
      pinnedTier2 = Some(df)
      pinnedFiles = rawFiles
      pinnedLayoutHash = clusterByHash
      pinGen.incrementAndGet() // after the snapshot swap: see pinGen doc
      old
    }
    exampleVecMemo.clear() // new snapshot, new example vectors
    displaced.foreach(_.unpersist())
  }

  /** The pin's frozen lineage (captured at pin time): maintainIndexes
    * checks these still exist to catch a tier2 rewrite whose sweep died
    * before the repin. */
  @volatile private var pinnedFiles: Array[String] = Array.empty

  /** Re-pin the snapshot over the store's current content, KEEPING the
    * current pin's layout choice. */
  def refreshServing(): Unit = pinServing(pinnedLayoutHash)

  /** Layout of the current pin (false = scan order, true = hash-
    * clustered) — exposed for specs pinning the repin-keeps-layout
    * contract. */
  private[graft] def servingLayoutHash: Boolean = pinnedLayoutHash

  /** Drop the pin: serving calls read the store per call again. */
  def unpinServing(): Unit = {
    val displaced = pinLock.synchronized {
      val old = pinnedTier2
      pinnedTier2 = None
      pinGen.incrementAndGet()
      old
    }
    exampleVecMemo.clear()
    displaced.foreach(_.unpersist())
  }
  private val pinLock = new Object

  /** Triage example-vector memo, valid EXACTLY while a pin is held: the
    * vector is a pure function of the pinned snapshot + the example
    * hashes, and the pin is the freeze contract (every pin/unpin/refresh
    * clears it). Unpinned serving recomputes per call — the live store
    * may move between calls. Saves the two small store-scan jobs
    * (~55 ms at 150k rows) on every repeat-triage call, the common UI
    * shape (a triage session iterates on the same example set).
    *
    * Keys carry [[pinGen]]: clear() alone cannot close the race where a
    * triage call observes the old pin, the pin transitions (swap +
    * clear), and ONLY THEN the call's computeIfAbsent inserts a vector
    * computed against the displaced snapshot — that entry would serve
    * for the whole life of the new pin (ADVICE r16). With the
    * generation in the key, an entry inserted by a straggler is keyed
    * to the superseded generation and no later lookup can hit it; the
    * clear() remains for memory hygiene only. */
  private val exampleVecMemo = new java.util.concurrent.ConcurrentHashMap[
    (Long, Seq[String], Seq[String]), Option[Seq[Double]]]()

  /** Pin-generation counter, bumped under [[pinLock]] AFTER each
    * snapshot swap (pin/refresh/unpin). A reader that observes
    * generation g and then reads [[pinnedTier2]] sees the snapshot of
    * generation ≥ g, so a memo entry's vector can never be OLDER than
    * the generation it is keyed under — the stale direction is
    * impossible, and the newer direction only wastes one recompute
    * (the entry is keyed to a gen nobody reads anymore). */
  private val pinGen = new java.util.concurrent.atomic.AtomicLong(0)

  /** Tier-2 read GUARANTEED to see the live store regardless of what
    * the session has cached. Spark's CacheManager substitutes a cached
    * plan into ANY later query containing an equal fragment, and the
    * ledgered streaming appends / compaction renames never invalidate
    * such an entry (only Spark's own writers do) — measured r13: a root
    * read under a root-read cache returned pre-append rows until
    * unpersist (found by FreshBench racing promotion against a pinned
    * server). The pin itself is a file-list plan now, but a session
    * USER can still hold a root-read cache, so live-critical reads
    * (drift detection, re-sync sources, the pin's own snapshot) always
    * read the explicit CURRENT file list — a plan no root-read cache
    * entry matches. Listing is maintenance-cadence cost. */
  private def liveTier2Read(): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tier2Path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return spark.read.parquet(tier2Path)
    def files(p: Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (s.isDirectory) files(s.getPath)
        else Seq(s.getPath.toString)
      }
    val fl = files(root)
    if (fl.isEmpty) spark.read.parquet(tier2Path)
    else spark.read.option("basePath", tier2Path).parquet(fl: _*)
  }

  // --- POST /ingest/stream (S1) ---------------------------------------
  /** Start streaming ingest from a JSONL drop directory. */
  def startIngest(inputDir: String): StreamingQuery =
    IngestPipeline.start(spark, inputDir, tier1Path,
      s"$warehouse/checkpoints/ingest")

  /** Batch form: ingest a DataFrame of raw OTel JSON strings now. */
  def ingestBatch(rawJsonLines: DataFrame): Unit =
    IngestPipeline.ingestBatch(rawJsonLines)
      .write.mode("append").partitionBy("dt").parquet(tier1Path)

  // --- GET /stream/tail (S3) ------------------------------------------
  /** Last-n live rows via TIME-WINDOW probing: if ≥ n matching rows have
    * `ts_sec ≥ maxTs − w`, the global top-n by ts all lie inside that
    * window (every excluded row is older than every included one), so
    * the probe result IS the exact tail. Each probe carries BOTH bounds:
    * the `dt` predicate prunes partitions (`dt` derives from `ts_sec`,
    * so a year-long store lists 1-2 day directories, the r11 form) and
    * the `ts_sec` bound additionally skips parquet ROW GROUPS via
    * min/max stats inside the surviving files — a compacted single-file
    * day no longer decodes its whole row set to answer "newest 100"
    * (the r11 ServeBench finding: tail was the slowest verb because it
    * paid a full newest-partition decode per call). The window starts at
    * [[Via.TailProbeWindowSec]] and widens ×8 on shortfall (selective
    * filters / sparse stores), becoming the plain full scan once it
    * covers the oldest partition's day-start — at which point the ts
    * bound excludes nothing and the result is exact by construction.
    * Row-identical to the full-scan form (ViaSpec), in ANY session
    * timezone: the day-start arithmetic runs in the session zone (dt
    * derives from ts_sec in that zone — ADVICE r12), the probe's dt
    * bounds carry ±2 days of cross-timezone slack, and the terminal
    * iteration IS the plain full scan. */
  def tail(n: Int = 100, filter: Option[String] = None): DataFrame = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.{col, max}
    val root = new Path(tier1Path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // only date-parseable leaves anchor the probe: a null-ts partition
    // (__HIVE_DEFAULT_PARTITION__) sorts after every date string and
    // would otherwise be taken as "newest". Its rows sort behind every
    // timestamped row (desc = nulls last), so they can only surface when
    // the store holds fewer than n timestamped rows — the terminal
    // full scan below covers exactly that case.
    val dts =
      (if (fs.exists(root))
        fs.listStatus(root).map(_.getPath.getName)
          .filter(_.startsWith("dt=")).map(_.stripPrefix("dt=")).toSeq
      else Seq.empty)
      .filter(d => scala.util.Try(java.time.LocalDate.parse(d)).isSuccess)
      .sorted.reverse
    val t1 = tier1
    if (dts.isEmpty || !t1.columns.contains("dt") ||
        !t1.columns.contains("ts_sec"))
      return IngestPipeline.tail(t1, n, filter)
    // global max ts lives in the newest partition (dt is monotone in
    // ts). Footer statistics answer it driver-side with zero Spark jobs
    // (TailBench: the agg job alone was ~127 ms of a ~270 ms call);
    // a statless/empty/mid-rewrite footer falls back to the one-column
    // agg over that partition, and an empty partition to the full scan.
    val maxTs: Long = graft.sources.FooterStats.maxLong(spark,
        s"$tier1Path/dt=${dts.head}", "ts_sec").getOrElse {
      val row = t1.filter(col("dt") === dts.head)
        .agg(max(col("ts_sec"))).head()
      if (row.isNullAt(0)) return IngestPipeline.tail(t1, n, filter)
      row.getAs[Number](0).longValue()
    }
    // Day-start of the OLDEST partition in the SESSION timezone: dt =
    // to_date(timestamp_seconds(ts_sec)) evaluates in the session tz
    // (IngestPipeline does not pin UTC), so partition dt=D spans
    // [D 00:00, D+1 00:00) IN THAT ZONE. The previous UTC form declared
    // a short result final in zones east of UTC while `ts_sec >= from`
    // still excluded the oldest partition's pre-UTC-midnight rows
    // (ADVICE r12 medium).
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    val oldestStart =
      java.time.LocalDate.parse(dts.last).atStartOfDay(zone).toEpochSecond
    var w = Via.TailProbeWindowSec
    while (true) {
      val from = maxTs - w
      if (from <= oldestStart)
        // the window covers every dated partition, so probing can no
        // longer narrow the scan: run the plain full scan. This is also
        // the exactness backstop for what partition-name arithmetic
        // cannot see — a store WRITTEN under a different session
        // timezone than the reader's, and undated (null-ts) partitions.
        return IngestPipeline.tail(t1, n, filter)
      // dt bounds carry ±2 days of slack: partition names were derived
      // in the WRITER's session tz, and the widest legal tz divergence
      // (UTC-12 vs UTC+14 = 26 h) shifts a row's date by at most 2 days
      // vs the reader's zone. Constant extra listing, never wrong rows —
      // the `ts_sec` row filter below is the correctness bound.
      val probe = graft.analysis.DtPrune(t1, from, maxTs, slackDays = 2)
        .filter(col("ts_sec") >= from)
      val res = IngestPipeline.tail(probe, n, filter)
      val rows = res.collect()
      if (rows.length >= n)
        return spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), res.schema)
      w *= 8
    }
    sys.error("unreachable")
  }

  // --- store maintenance (no reference verb — the operational task its
  // daily-collection rollover performs implicitly) -----------------------
  /** Compact Tier-1's small appended files (`sources/Layout.compact`) —
    * works on BOTH ingest paths, including under live streaming ingest.
    *
    * [[ingestBatch]] and [[startIngest]]'s `foreachBatch` sink both
    * append plain files INTO existing `dt=` leaves — including CLOSED
    * days, via late event-time rows — which `Layout.compact`'s
    * late-append sweep preserves (a file committed between the listing
    * and the swap is moved into the rewritten leaf, crash-covered by the
    * trash manifest; CompactionSpec's race tests). The open (lexically
    * max) dt partition is still skipped: it is the hot leaf, and
    * compacting a partition mid-churn is wasted rewrite work, not a
    * correctness need.
    *
    * Streaming-ingest interplay: a `b<id>-` file with `id` ABOVE the
    * commit ledger's high-water mark belongs to an in-flight or
    * crashed-attempt micro-batch — the replay protocol deletes such
    * files BY NAME before re-landing them
    * ([[graft.streaming.IngestPipeline.appendBatchIdempotent]]), so
    * compaction must not fold them into a rewrite (the replay would miss
    * them and duplicate rows). They are excluded via `skipFile` and pass
    * through the swap untouched; committed files compact freely because
    * a committed batch is never replayed. */
  def compactTier1(targetBytes: Long = 128L * 1024 * 1024): graft.sources.Layout.CompactionStats =
    compactLedgeredStore(tier1Path, targetBytes, skipOpenLeaf = true)

  /** Compact Tier-2. Safe under the live [[PromotionStream]] appender,
    * which (r13) lands batches through the SAME idempotent
    * `b<batchId>-`-file protocol as Tier-1 ingest — so uncommitted
    * in-flight batch files pass through the swap untouched and mid-swap
    * commits survive via the late-append sweep (CompactionSpec race
    * tests). Unlike tier1 the OPEN day leaf is compacted too: Tier-2 is
    * control-plane volume (a handful of promoted clusters per window),
    * so the hot-leaf rewrite-waste argument doesn't apply and skipping
    * it would leave the maintenance sweep permanently non-quiescent. */
  def compactTier2(targetBytes: Long = 128L * 1024 * 1024): graft.sources.Layout.CompactionStats =
    compactLedgeredStore(tier2Path, targetBytes, skipOpenLeaf = false)

  private def compactLedgeredStore(storePath: String, targetBytes: Long,
      skipOpenLeaf: Boolean): graft.sources.Layout.CompactionStats = {
    import org.apache.hadoop.fs.Path
    val root = new Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val openDt =
      if (skipOpenLeaf)
        fs.listStatus(root).map(_.getPath.getName)
          .filter(_.startsWith("dt=")).sorted.lastOption
      else None
    val committedMax = IngestPipeline.committedMax(fs, root)
    val UncommittedBatchFile = "b(\\d+)-.*".r
    graft.sources.Layout.compact(spark, storePath, targetBytes,
      skipLeaf = dir => openDt.contains(dir.getName),
      skipFile = f => f.getName match {
        case UncommittedBatchFile(id) => id.toLong > committedMax
        case _ => false
      })
  }

  // --- POST /analysis/tier1/rhythm_anomalies (T2/T3/A1-A3/J1-J3/T5) ---
  /** Batch-promoted clusters follow into an EXISTING graph index (the
    * same freshness contract the streaming path keeps per micro-batch —
    * ADVICE r11); a Via that never built one is untouched. */
  def analyzeOnce(nowSec: Long, windowSec: Long = 60): DataFrame =
    AnalysisJob.runOnce(spark, tier1Path, tier2Path, rules, nowSec, windowSec,
      graphIndexPath = Some(graphIndexPath))

  /** Background 60 s loop (the reference's worker). */
  def startAnalysis(intervalSec: Long = 60, windowSec: Long = 60): StreamingQuery =
    AnalysisJob.start(spark, tier1Path, tier2Path, rules, intervalSec,
      windowSec, graphIndexPath = Some(graphIndexPath))

  /** Fully streaming detection: Tier-1 is itself a streaming source
    * (parquet file stream over the partitioned store), windows close via
    * watermark, and anomalies append to `anomalies/` continuously — no
    * polling loop at all. This is the keyed-state scale path
    * ([[graft.streaming.StatefulDetector]]); the reference can only poll. */
  def startStatefulDetection(
      windowSec: Long = 60,
      watermarkDelay: String = "2 minutes",
      thresholds: graft.streaming.StatefulDetector.Thresholds =
        graft.streaming.StatefulDetector.Thresholds(),
      triggerMs: Long = 10000,
      stateTtlMs: Option[Long] =
        Some(graft.streaming.StatefulDetector.DefaultStateTtlMs)): StreamingQuery = {
    graft.streaming.StatefulDetector.ensureStateVersion(spark,
      s"$warehouse/checkpoints/stateful")
    val schema = spark.read.parquet(tier1Path).schema
    val logs = spark.readStream.schema(schema).parquet(tier1Path)
      .select("rhythm_hash", "ts_sec")
    graft.streaming.StatefulDetector
      .detect(logs, windowSec, watermarkDelay, thresholds, stateTtlMs)
      .writeStream
      .format("parquet")
      .option("path", s"$warehouse/anomalies")
      .option("checkpointLocation", s"$warehouse/checkpoints/stateful")
      .outputMode("append")
      // a real trigger interval: the state TTL's processing-time timeouts
      // request a batch per trigger — with the default 0 ms trigger that
      // degenerates into a busy loop of empty batches
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
      .start()
  }

  /** Anomalies emitted by [[startStatefulDetection]]. */
  def anomalies(): DataFrame = spark.read.parquet(s"$warehouse/anomalies")

  /** Fully streaming detection AND promotion: watermarked keyed-state
    * anomalies are promoted to Tier-2 per closed window via the exact
    * batch `Promoter` semantics (T5 scale path — batch parity proven by
    * PromotionStreamSpec; rules enforcement included). */
  def startStreamingPromotion(
      windowSec: Long = 60,
      watermarkDelay: String = "2 minutes",
      thresholds: graft.streaming.StatefulDetector.Thresholds =
        graft.streaming.StatefulDetector.Thresholds(),
      annIndexPath: Option[String] = None,
      graphIndex: Boolean = false): StreamingQuery =
    graft.streaming.PromotionStream.start(spark, tier1Path, tier2Path,
      s"$warehouse/checkpoints/promotion", Some(rules), windowSec,
      watermarkDelay, thresholds, annIndexPath = annIndexPath,
      graphIndexPath = if (graphIndex) Some(graphIndexPath) else None)

  /** Fold a streaming-maintained ANN index's per-batch levels into its
    * bulk level ([[graft.search.AnnIndex.fold]]) — the periodic
    * counterweight for the one-leaf-per-micro-batch appends
    * [[startStreamingPromotion]] produces when `annIndexPath` is wired.
    * Fold only past the stream's committed checkpoint (the fold doc's
    * replay caveat); on the promotion stream that is every batch but the
    * in-flight one. */
  def foldAnnIndex(path: String): graft.search.AnnIndex.FoldStats =
    graft.search.AnnIndex.fold(spark, path)

  // --- maintenance policy (VERDICT r10 #6) -----------------------------
  /** One operational verb over every persisted store: inspect each
    * store's fragmentation signal against its threshold and run the
    * right counterweight — `Layout.compact` for the appended stores
    * (tier1/tier2 and the file-sharded indexes), `AnnIndex.fold` for the
    * batch-leveled sign-bucket index, `GraphIndex.rebuild` for the
    * buffered graph (also the bootstrap build when a stream has buffered
    * into an index that was never built). Probes are unchanged by every
    * counterweight (each index's own maintenance spec proves it); this
    * verb only decides WHEN. Returns what it did and why, one row per
    * store inspected.
    *
    * Caveats carried from the verbs themselves: do not fold/rebuild
    * while a crashed stream may still replay a snapshotted batch (run
    * after the stream's checkpoint passes them — true for any batch but
    * the in-flight one), and compaction skips uncommitted streaming
    * files by design (see [[compactTier1]]). */
  def maintainIndexes(
      annIndexPath: Option[String] = None,
      dedupIndexPath: Option[String] = None,
      textIndexPath: Option[String] = None,
      ivfIndexPath: Option[String] = None,
      smallFileThreshold: Long = Via.MaintainSmallFiles,
      annBatchLevels: Int = Via.MaintainBatchLevels,
      graphBufferRatio: Double = Via.MaintainBufferRatio,
      maxSegments: Int = Via.MaintainMaxSegments,
      targetBytes: Long = 128L * 1024 * 1024): Seq[Via.Maintenance] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: Path): Long =
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).map { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) 0L
        else if (s.isDirectory) dataFiles(s.getPath) else 1L
      }.sum
    // test seam (MaintainCrashSpec): `maintainCrashAfter = Some(target)`
    // kills the sweep right after that store's action completes —
    // simulating a driver death mid-sweep with store A maintained and
    // stores B.. untouched (VERDICT r13 item 6)
    val acts = new scala.collection.mutable.ArrayBuffer[Via.Maintenance] {
      override def addOne(m: Via.Maintenance): this.type = {
        super.addOne(m)
        if (maintainCrashAfter.contains(m.target) && m.action != "none")
          throw new IllegalStateException(
            s"simulated crash after ${m.target}:${m.action}")
        this
      }
    }
    def compactIfFragmented(target: String, storePath: String,
        run: () => graft.sources.Layout.CompactionStats): Unit = {
      val n = dataFiles(new Path(storePath))
      if (n > smallFileThreshold) {
        val s = run()
        acts += Via.Maintenance(target, "compact",
          s"$n files > $smallFileThreshold: ${s.filesBefore} -> ${s.filesAfter}")
      } else acts += Via.Maintenance(target, "none", s"$n files")
    }
    if (fs.exists(new Path(tier1Path)))
      compactIfFragmented("tier1", tier1Path, () => compactTier1(targetBytes))
    if (fs.exists(new Path(tier2Path)))
      compactIfFragmented("tier2", tier2Path, () => compactTier2(targetBytes))
    // graph index: (1) DRIFT — the store carries keys the index has
    // never seen (a batch-promotion path that wrote Tier-2 without the
    // graph append, a crash between the two writes — ADVICE r11 medium):
    // re-sync from the store, the authoritative source. Detected by
    // comparing distinct key counts, which is exact under the engine's
    // append-only writes (keys are content-derived and never rewritten,
    // so `store > index` can only mean missing rows). The index-ahead
    // direction is NOT treated as drift: buffered rows are upstream-
    // written to Tier-2 first, so index ⊆ store holds by construction
    // and a transient surplus only ever means a concurrent append mid-
    // sweep. (2) BUFFER GROWTH — fold when the exact-scored buffer
    // outgrows its share of the graph (or bootstrap a streamed-only
    // store).
    if (fs.exists(new Path(graphIndexPath))) {
      val buf = graft.search.GraphIndex.bufferRows(spark, graphIndexPath)
      // maintenance reads the LIVE store, never the pinned serving
      // snapshot: a stale pin would undercount store keys (missing
      // drift) and, worse, a triggered re-sync would rebuild the index
      // from the snapshot and drop rows appended since the pin. A plain
      // root read is NOT live enough: see [[liveTier2Read]].
      val liveTier2 =
        if (fs.exists(new Path(tier2Path))) Some(liveTier2Read())
        else None
      val storeKeys = liveTier2.fold(0L)(
        _.select(graft.search.TierIndex.rowKey).distinct().count())
      val idxKeys =
        graft.search.GraphIndex.indexedKeyCount(spark, graphIndexPath)
      graft.search.GraphIndex.nodeCount(spark, graphIndexPath) match {
        case _ if storeKeys > idxKeys =>
          graft.search.GraphIndex.rebuildFrom(spark,
            graft.search.TierIndex.nodes(liveTier2.get), graphIndexPath)
          acts += Via.Maintenance("graphidx", "sync",
            s"store has $storeKeys keys vs $idxKeys indexed: " +
              "re-synced from Tier-2")
        case None if buf > 0 =>
          graft.search.GraphIndex.rebuild(spark, graphIndexPath)
          acts += Via.Maintenance("graphidx", "rebuild",
            s"bootstrap from $buf buffered rows")
        case Some(n) if buf > graphBufferRatio * math.max(n, 1L) =>
          // incremental segment fold while the segment count allows it —
          // O(buffer) encode instead of O(graph) (VERDICT r13 item 3);
          // past the cap, pay the full rebuild once to rebalance
          val segs = graft.search.GraphIndex.segmentCount(spark, graphIndexPath)
          if (segs >= maxSegments) {
            graft.search.GraphIndex.rebuild(spark, graphIndexPath)
            acts += Via.Maintenance("graphidx", "rebuild",
              s"$buf buffered vs $n graph nodes; $segs segments >= " +
                s"$maxSegments: full rebalance")
          } else {
            graft.search.GraphIndex.foldIncremental(spark, graphIndexPath)
            acts += Via.Maintenance("graphidx", "fold",
              s"$buf buffered vs $n graph nodes: incremental segment fold")
          }
        case g =>
          acts += Via.Maintenance("graphidx", "none",
            s"$buf buffered vs ${g.getOrElse(0L)} graph nodes")
      }
    }
    annIndexPath.foreach { p =>
      val levels =
        if (!fs.exists(new Path(s"$p/index"))) 0
        else fs.listStatus(new Path(s"$p/index")).count(s =>
          s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      if (levels > annBatchLevels) {
        val s = graft.search.AnnIndex.fold(spark, p)
        acts += Via.Maintenance("annidx", "fold",
          s"$levels batch levels: ${s.filesBefore} -> ${s.filesAfter} files")
      } else acts += Via.Maintenance("annidx", "none", s"$levels batch levels")
    }
    dedupIndexPath.foreach(p => compactIfFragmented("dedupidx", p,
      () => graft.search.DedupIndex.compact(spark, p, targetBytes)))
    textIndexPath.foreach(p => compactIfFragmented("textidx", p,
      () => graft.search.TextIndex.compact(spark, p, targetBytes)))
    ivfIndexPath.foreach(p => compactIfFragmented("ivfidx", p,
      () => graft.search.IvfIndex.compact(spark, p, targetBytes)))
    // a pinned serving snapshot's lineage is the parquet file list frozen
    // at pin time: once a maintenance action REWRITES TIER-2 (the
    // compaction swap deletes the listed files), an evicted cache block
    // would recompute against deleted files and fail the serving call.
    // Only a tier2 rewrite creates that hazard — tier1 compaction and
    // index folds/syncs never touch the pinned store's files, so they do
    // not pay a re-materialization (ADVICE r12). The repin keeps the
    // pin's layout choice (refreshServing records it).
    // ALSO repin when any of the pin's frozen input files no longer
    // exists: a sweep that died between its tier2 rewrite and this repin
    // (VERDICT r13 item 6) reports tier2 "none" on the NEXT sweep — the
    // action-based condition alone would leave the stale-lineage pin in
    // place forever. One fs.exists per pinned file, maintenance-only.
    def pinLineageBroken(): Boolean =
      pinnedTier2.isDefined &&
        pinnedFiles.exists(f => !fs.exists(new Path(f)))
    if (pinnedTier2.isDefined &&
        (acts.exists(a => a.target == "tier2" && a.action != "none") ||
          pinLineageBroken())) {
      refreshServing()
      acts += Via.Maintenance("serving", "repin",
        "tier2 rewritten under a pinned snapshot: refreshed the pin")
    }
    acts.toSeq
  }

  /** Test seam: simulate a driver crash right after the named store's
    * maintenance action inside [[maintainIndexes]]. */
  private[graft] var maintainCrashAfter: Option[String] = None

  // --- POST /analysis/tier2/clusters (V1/V6/A5/A6/J3/J4) --------------
  /** Text-filtered calls route through the Tier-2 graph ANN index when
    * one exists and covers at least [[graphServeThreshold]] nodes (the
    * reference serves these through Qdrant's HNSW; exact scan below the
    * crossover is OUR improvement on it). Identical filtering/scoring
    * expressions either way; an under-filled indexed result falls back
    * to the exact scan (ClusterSearch Scaladoc). */
  def clusters(
      nowSec: Long,
      startTs: Option[Long] = None,
      endTs: Option[Long] = None,
      textFilter: Option[String] = None): DataFrame =
    textFilter match {
      case Some(f) if graphServes(clustersGate) =>
        ClusterSearch.clustersIndexed(tier2, graphIndexPath, Some(rules),
          nowSec, startTs, endTs, textFilter = f)
      case _ =>
        ClusterSearch.clusters(tier2, Some(rules), nowSec, startTs, endTs,
          textFilter)
    }

  // --- POST /analysis/tier2/triage (V3/A7) ----------------------------
  def triage(positive: Seq[String], negative: Seq[String]): DataFrame =
    if (graphServes(triageGate)) {
      // pinned serving memoizes the example vector (pure function of the
      // frozen snapshot; memo cleared on every pin transition)
      // generation read FIRST: the snapshot the compute reads is then
      // always ≥ the keyed generation (see pinGen doc — ADVICE r16)
      val gen = pinGen.get()
      val qv =
        if (pinnedTier2.isDefined)
          Some(exampleVecMemo.computeIfAbsent(
            (gen, positive.sorted, negative.sorted),
            _ => ClusterSearch.exampleVectorFast(tier2, positive, negative)))
        else None
      ClusterSearch.triageIndexedImpl(tier2, graphIndexPath, positive,
        negative, ClusterSearch.TriageLimit, precomputedQv = qv)._1
    } else ClusterSearch.triage(tier2, positive, negative)

  /** The ANN-serving gate: graph index present and at/above the verb's
    * threshold. */
  private def graphServes(threshold: Long): Boolean =
    graft.search.GraphIndex.nodeCount(spark, graphIndexPath)
      .exists(_ >= threshold)
  /** Routing decisions exposed for specs (gate semantics, not parity —
    * parity is TierServeSpec's job). */
  private[graft] def clustersServesViaGraph: Boolean = graphServes(clustersGate)
  private[graft] def triageServesViaGraph: Boolean = graphServes(triageGate)

  /** Bulk-(re)build the Tier-2 serving graph index from the current
    * store — the initial build; [[startStreamingPromotion]] keeps it
    * fresh per batch and [[maintainIndexes]] folds its buffer. */
  def buildGraphIndex(numParts: Int = graft.search.GraphIndex.NumParts): Unit =
    graft.search.TierIndex.build(tier2, graphIndexPath, numParts)

  // --- POST /control/suppress | /control/patch (C4, T4) ---------------
  def suppress(rhythmHash: String, ttlSec: Long, nowSec: Long): Unit =
    rules.suppress(rhythmHash, ttlSec, nowSec)

  /** Patch = permanent allow-list + auto-generated regression eval case
    * (`control_service.py:66-87` + `:37-58`). */
  def patch(rhythmHash: String, nowSec: Long): Unit = {
    rules.patch(rhythmHash)
    import spark.implicits._
    val ctx = tier1.filter($"rhythm_hash" === rhythmHash)
      .orderBy($"ts_sec".desc).limit(Via.EvalContextLogs)
      .select("body").as[String].collect().toSeq
    evals.write(rhythmHash, ctx)
  }

  // --- GET /control/rules + DELETEs (C5/C7) ---------------------------
  def activeRules(nowSec: Long): DataFrame = rules.active(nowSec)
  def unpatch(rhythmHash: String): Unit = rules.deactivate(rhythmHash, Rules.AllowList)
  def unsuppress(rhythmHash: String): Unit = rules.deactivate(rhythmHash, Rules.Suppression)

  // --- POST /schemas/detect | /schemas (C1-C3) ------------------------
  def detectSchema(samples: Seq[String]): Option[SchemaEngine.LogSchema] =
    SchemaEngine.detect(samples)
  def saveSchema(name: String, schema: SchemaEngine.LogSchema): Unit =
    schemas.save(name, schema)
  def listSchemas(): Seq[String] = schemas.list()
}

object Via {
  /** Context logs captured per eval case (reference keeps the recent
    * occurrences of the patched hash). */
  val EvalContextLogs = 10

  /** Graph-serving corpus-size gate for `clusters`: the text-filtered
    * exact scan pays a full-text match + embed-cosine per row, so the
    * graph wins early (ScaleBench's measured ~100k crossover for
    * flat-vs-indexed probes at serving beam widths; ServeBench r12:
    * graph already 1.9× faster at 600k). */
  val ClustersServeThreshold = 100000L
  /** Graph-serving gate for `triage`: its exact scan is one cheap
    * filtered-average + cosine rank, so the exact pin stays faster
    * longer — measured exact 102 ms vs graph 152 ms at 150k, crossing
    * before 600k (210 vs 277 ms; ServeBench r12, re-measured at 300k in
    * SCALE.md r13). Routing BOTH verbs at 100k made triage pay up to
    * ~1.5× in the 100k-600k band (VERDICT r12 item 2). */
  val TriageServeThreshold = 300000L
  /** Pre-r13 shared gate, kept for callers that want one explicit
    * threshold for both verbs (benches forcing a path). */
  val GraphServeThreshold = 100000L
  /** Initial `tail` probe window (seconds of event time before the
    * store's newest row). Sized so a reference-rate stream (100 logs/s,
    * BASELINE.md) fills the default n=100 on the first probe with ~64×
    * headroom; widens ×8 per shortfall. */
  val TailProbeWindowSec = 64L
  /** Data-file count above which an appended store gets compacted. */
  val MaintainSmallFiles = 64L
  /** Streaming batch levels tolerated on the sign-bucket index before a
    * fold (each level is one micro-batch's leaf set). */
  val MaintainBatchLevels = 4
  /** Graph buffer rows tolerated as a fraction of graph nodes before a
    * rebuild folds them in (buffer rows are exact-scanned per probe). */
  val MaintainBufferRatio = 0.10
  /** Sub-graph segments tolerated before buffer growth triggers the FULL
    * rebuild (segment rebalance) instead of the incremental segment fold:
    * each segment adds one beam walk per probe, so unbounded segment
    * growth would trade fold cost for serving latency. */
  val MaintainMaxSegments = 16

  /** One maintenance decision: which store, what ran, why. */
  final case class Maintenance(target: String, action: String, detail: String)
}
