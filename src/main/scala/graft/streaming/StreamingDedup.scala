package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-flight exact deduplication for streaming corpus ingest — the
  * streaming analogue of the batch `dedup_exact` operator: fingerprint the
  * normalized content, keep the FIRST arrival, drop re-arrivals.
  *
  * Built on `dropDuplicatesWithinWatermark`, so the dedup state is
  * watermark-bounded: a fingerprint is remembered only within the event-
  * time delay and evicted afterwards — the property that makes streaming
  * dedup viable at 100 TB/day (unbounded `dropDuplicates` state would grow
  * with the corpus forever; re-arrivals later than the horizon are a batch
  * compaction's job, declared). State is keyed by the 128-bit fingerprint,
  * not the text, so per-key state is constant-size.
  */
object StreamingDedup {

  /** Drop in-flight duplicates of `textCol` (exact content matches after
    * lowercase/alnum normalization — same fingerprint as `dedup_exact`).
    * `tsCol` must be a TimestampType event-time column; `delay` is the
    * dedup horizon AND the lateness bound. */
  def dedupByContent(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")
}
