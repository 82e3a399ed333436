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
  *                  `evals/`, `checkpoints/` live under it
  */
final class Via(spark: SparkSession, warehouse: String) {

  val tier1Path = s"$warehouse/tier1"
  val tier2Path = s"$warehouse/tier2"
  val rules = new Rules(spark, s"$warehouse/rules")
  val schemas = new SchemaRegistry(spark, s"$warehouse/schemas")
  val evals = new Evals(s"$warehouse/evals")

  private def tier1: DataFrame = spark.read.parquet(tier1Path)
  private def tier2: DataFrame = spark.read.parquet(tier2Path)

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
  def tail(n: Int = 100, filter: Option[String] = None): DataFrame =
    IngestPipeline.tail(tier1, n, filter)

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
  def compactTier1(targetBytes: Long = 128L * 1024 * 1024): graft.sources.Layout.CompactionStats = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tier1Path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val openDt = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("dt=")).sorted.lastOption
    val committedMax = IngestPipeline.committedMax(fs, root)
    val UncommittedBatchFile = "b(\\d+)-.*".r
    graft.sources.Layout.compact(spark, tier1Path, targetBytes,
      skipLeaf = dir => openDt.contains(dir.getName),
      skipFile = f => f.getName match {
        case UncommittedBatchFile(id) => id.toLong > committedMax
        case _ => false
      })
  }

  /** Compact Tier-2. Safe under the live [[PromotionStream]] appender:
    * it only ever CREATES new `(batch_id, dt)` leaves, never appends
    * into an existing one (the listing-snapshot precondition
    * `Layout.compact` documents; CompactionSpec proves it live). */
  def compactTier2(targetBytes: Long = 128L * 1024 * 1024): graft.sources.Layout.CompactionStats =
    graft.sources.Layout.compact(spark, tier2Path, targetBytes)

  // --- POST /analysis/tier1/rhythm_anomalies (T2/T3/A1-A3/J1-J3/T5) ---
  def analyzeOnce(nowSec: Long, windowSec: Long = 60): DataFrame =
    AnalysisJob.runOnce(spark, tier1Path, tier2Path, rules, nowSec, windowSec)

  /** Background 60 s loop (the reference's worker). */
  def startAnalysis(intervalSec: Long = 60, windowSec: Long = 60): StreamingQuery =
    AnalysisJob.start(spark, tier1Path, tier2Path, rules, intervalSec, windowSec)

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
      annIndexPath: Option[String] = None): StreamingQuery =
    graft.streaming.PromotionStream.start(spark, tier1Path, tier2Path,
      s"$warehouse/checkpoints/promotion", Some(rules), windowSec,
      watermarkDelay, thresholds, annIndexPath = annIndexPath)

  /** Fold a streaming-maintained ANN index's per-batch levels into its
    * bulk level ([[graft.search.AnnIndex.fold]]) — the periodic
    * counterweight for the one-leaf-per-micro-batch appends
    * [[startStreamingPromotion]] produces when `annIndexPath` is wired.
    * Fold only past the stream's committed checkpoint (the fold doc's
    * replay caveat); on the promotion stream that is every batch but the
    * in-flight one. */
  def foldAnnIndex(path: String): graft.search.AnnIndex.FoldStats =
    graft.search.AnnIndex.fold(spark, path)

  // --- POST /analysis/tier2/clusters (V1/V6/A5/A6/J3/J4) --------------
  def clusters(
      nowSec: Long,
      startTs: Option[Long] = None,
      endTs: Option[Long] = None,
      textFilter: Option[String] = None): DataFrame =
    ClusterSearch.clusters(tier2, Some(rules), nowSec, startTs, endTs, textFilter)

  // --- POST /analysis/tier2/triage (V3/A7) ----------------------------
  def triage(positive: Seq[String], negative: Seq[String]): DataFrame =
    ClusterSearch.triage(tier2, positive, negative)

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
}
