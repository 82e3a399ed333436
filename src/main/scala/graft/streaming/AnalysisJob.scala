package graft.streaming

import graft.analysis.{DtPrune, Promoter, RhythmAnalyzer}
import graft.control.Rules
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** T2/T3/T7 — the 60-second analysis loop: detect rhythm anomalies over
  * the Tier-1 store, enforce control rules, promote clusters to Tier-2.
  *
  * Reference (`/root/reference/app/worker.py:13-36` →
  * `rhythm_analysis_service.py:66-108` → `promotion_service.py:14-53`):
  * an asyncio task every `ANALYSIS_INTERVAL_SEC=60` analyzes the last 60 s
  * against a 10k-point historical sample; errors are logged and the loop
  * continues.
  *
  * Spark: each trigger is ONE batch plan over the Tier-1 table — exactly
  * what the reference does via two Qdrant scrolls, but with partition
  * pruning on `dt` and Parquet ts min/max instead of payload indexes. The
  * rolling baseline stays a batch top-k per trigger (SURVEY §7.5.5) rather
  * than keyed streaming state: the reference re-reads history every cycle,
  * and a 10k-row TakeOrdered over a pruned day range is cheap at any SF.
  */
object AnalysisJob {

  /** Tier-1 bounded to `[fromSec, toSec]` — `dt` partition pruning plus the
    * matching `ts_sec` row-group bound. Every production read goes through
    * this; an unbounded `spark.read.parquet(tier1)` would re-list ALL
    * history every trigger (see [[graft.analysis.DtPrune]]). */
  def tier1Window(
      spark: SparkSession,
      tier1Path: String,
      fromSec: Long,
      toSec: Long): DataFrame =
    DtPrune(spark.read.parquet(tier1Path), fromSec, toSec)

  /** One analysis cycle (the body of the 60 s loop, also the
    * `POST /analysis/tier1/rhythm_anomalies` semantics). Returns the
    * promoted clusters (possibly empty). */
  def runOnce(
      spark: SparkSession,
      tier1Path: String,
      tier2Path: String,
      rules: Rules,
      nowSec: Long,
      windowSec: Long = 60,
      baselineLookbackSec: Long = RhythmAnalyzer.DefaultBaselineLookbackSec,
      graphIndexPath: Option[String] = None): DataFrame = {
    val windowStart = nowSec - windowSec
    // the detector needs window + look-back horizon; dt-prune to exactly that
    val t1 = tier1Window(spark, tier1Path,
      windowStart - baselineLookbackSec, nowSec)
    val anomalies = rules.enforce(
      RhythmAnalyzer.detect(t1, windowStart, windowSec.toDouble,
        baselineLookbackSec = baselineLookbackSec), nowSec)
    val recentPoints = DtPrune(
      t1.filter(col("ts_sec") >= windowStart), windowStart, nowSec)
    val clusters = Promoter.rollup(anomalies, recentPoints)
    if (!clusters.isEmpty) {
      // an EXISTING serving graph must see batch-promoted rows too — the
      // streaming path appends per micro-batch, and without this the
      // batch path silently drifted the index (ADVICE r11 medium). The
      // rollup is materialized once so the Tier-2 write and the graph
      // append see the SAME rows (min_by ties could otherwise pick
      // different representatives per execution); it is control-plane
      // sized, so the localCheckpoint is bounded. A path whose store was
      // never created stays untouched — no stray index dirs for callers
      // that never built one.
      val followIndex = graphIndexPath.filter { p =>
        val root = new org.apache.hadoop.fs.Path(p)
        root.getFileSystem(spark.sessionState.newHadoopConf()).exists(root)
      }
      val rows = if (followIndex.isDefined) clusters.localCheckpoint()
                 else clusters
      try {
        rows.write.mode("append").partitionBy("dt").parquet(tier2Path)
        followIndex.foreach(p => graft.search.TierIndex.append(rows, p))
      } finally if (followIndex.isDefined) rows.unpersist()
    }
    clusters
  }

  /** Continuous mode: a rate-source heartbeat triggers [[runOnce]] per
    * interval via foreachBatch — the Structured Streaming analogue of the
    * reference's background worker (errors logged, loop continues,
    * `worker.py:29-34`). The clock is derived from wall time here; tests
    * use [[runOnce]] with an injected clock. */
  def start(
      spark: SparkSession,
      tier1Path: String,
      tier2Path: String,
      rules: Rules,
      intervalSec: Long = 60,
      windowSec: Long = 60,
      graphIndexPath: Option[String] = None): StreamingQuery = {
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .trigger(Trigger.ProcessingTime(intervalSec * 1000))
      .foreachBatch { (_: DataFrame, _: Long) =>
        try {
          runOnce(spark, tier1Path, tier2Path, rules,
            System.currentTimeMillis() / 1000, windowSec,
            graphIndexPath = graphIndexPath)
          ()
        } catch {
          case e: Exception =>
            // reference behavior: log and keep the loop alive (worker.py:32-34)
            System.err.println(s"[analysis] cycle failed: ${e.getMessage}")
        }
      }
      .start()
  }
}
