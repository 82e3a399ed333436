package graft.analysis

import graft.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T5/A4 — promotion of detected anomalies to the permanent Tier-2
  * forensic store.
  *
  * Reference (`/root/reference/app/services/promotion_service.py:14-53`):
  * anomalies are clustered per rhythm hash → `start_ts=min(ts)`,
  * `end_ts=max(ts)`, `count`, representative body/service/severity from
  * the earliest point (`:29-44`), first 5 raw logs kept as samples
  * (`:45`), then dense+sparse embedded and upserted into the daily
  * collection of `start_ts`'s day (`qdrant_service.py:112-135`).
  *
  * Spark: one groupBy (single shuffle of pre-aggregated partials — min_by
  * and the slice(sort_array(collect_list)) sample cap are all partial-
  * aggregable), embedding is a codegen'd expression, and "daily
  * collection" ≡ `dt` partition of one parquet/Delta table.
  *
  * Sparse weights use the CORPUS average document length, computed over
  * the window's Tier-1 points in one broadcast scalar aggregate —
  * reference fidelity (Qdrant computes BM25 stats server-side over the
  * real corpus, `qdrant_service.py:23,80`); the fixed `Bm25Sparse.AvgDl`
  * is only the empty-corpus fallback.
  */
object Promoter {

  val SampleLogs = 5

  /** @param anomalies columns: rhythm_hash, anomaly_type, n, baseline_mean
    * @param points    Tier-1 rows for the analysis window (rhythm_hash,
    *                  ts_sec, service, severity, body)
    */
  def rollup(anomalies: DataFrame, points: DataFrame): DataFrame =
    rollupWindows(
      anomalies.withColumn("window_start", lit(0L)),
      points.withColumn("window_start", lit(0L)))

  /** Multi-window [[rollup]]: both inputs carry a `window_start` column
    * and every window rolls up in ONE pass — one points⋈anomalies join on
    * (rhythm_hash, window_start), one grouped aggregate, one per-window
    * corpus-stats aggregate — instead of a plan per window. This is the
    * catch-up shape: a promotion trigger that drains N closed windows
    * (restart backlog, bursty replay) previously built N full Tier-1
    * scans ([[graft.streaming.PromotionStream]] r9 bench: 120 windows →
    * ~200 s/batch); this form is window-count-independent.
    * [[rollup]] ≡ this with a constant window, so the math has exactly
    * one implementation (PromotionStreamSpec's parity holds for both). */
  def rollupWindows(anomalies: DataFrame, points: DataFrame): DataFrame = {
    val joined = points.join(anomalies, Seq("rhythm_hash", "window_start"))
    val spark = points.sparkSession
    GraftFunctions.register(spark)
    // corpus-stats pass: avgdl over each window's Tier-1 corpus (same
    // tokenization Bm25Sparse uses), rounded to 6 dp for cross-run
    // stability — one broadcast per-window row joined onto the (tiny)
    // rollup; windows-per-trigger is control-plane-sized
    val stats = points.groupBy(col("window_start")).agg(
      coalesce(
        round(avg(size(graft.functions.TextFunctions.wordTokens(col("body")))), 6),
        lit(graft.functions.Bm25Sparse.AvgDl)).as("adl"))
    joined
      .groupBy(col("window_start"), col("rhythm_hash"), col("anomaly_type"),
        col("baseline_mean"))
      .agg(
        min(col("ts_sec")).as("start_ts"),
        max(col("ts_sec")).as("end_ts"),
        count(lit(1)).as("count"),
        min_by(col("service"), col("ts_sec")).as("service"),
        min_by(col("severity"), col("ts_sec")).as("severity"),
        min_by(col("body"), col("ts_sec")).as("body"),
        slice(sort_array(collect_list(struct(col("ts_sec"), col("body")))),
          1, SampleLogs).as("sample_logs"))
      .join(broadcast(stats), Seq("window_start"))
      .select(
        lit("event_cluster").as("entity_type"),
        col("rhythm_hash"), col("anomaly_type"),
        concat(lit("count="), col("count"),
          when(col("baseline_mean").isNotNull,
            concat(lit(" baseline="), col("baseline_mean"))).otherwise(lit("")))
          .as("anomaly_context"),
        col("start_ts"), col("end_ts"), col("count"),
        col("service"), col("severity"), col("body"), col("sample_logs"),
        GraftFunctions.embedText(col("body")).as("dense"),
        GraftFunctions.columnOf(graft.functions.Bm25SparseDl(
          GraftFunctions.exprOf(col("body")),
          GraftFunctions.exprOf(col("adl")))).as("sparse"),
        DtPrune.dtOf(col("start_ts")).as("dt"))
      .withColumn("sparse_idx", col("sparse.idx"))
      .withColumn("sparse_val", col("sparse.val"))
      .drop("sparse")
  }

  /** Append promoted clusters to the Tier-2 store (day-partitioned). */
  def promote(anomalies: DataFrame, points: DataFrame, tier2Path: String): Unit =
    rollup(anomalies, points)
      .write.mode("append").partitionBy("dt").parquet(tier2Path)
}
