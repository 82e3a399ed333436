package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition pruning for the day-partitioned Tier-1/Tier-2 stores.
  *
  * Every production read of a `dt`-partitioned table must carry a `dt`
  * predicate derived from its time window — a bare `ts_sec` filter only
  * skips parquet row groups (min/max), while file listing and footer reads
  * still scale with TOTAL table history. On a 100 TB store scanned every
  * 60 s that listing is the dominant cost; the `dt` bound turns it into a
  * constant-size operation (reference analogue: Qdrant's index-ordered
  * scroll gives cheap recent-history access, `qdrant_service.py:147-157`).
  */
object DtPrune {

  /** THE canonical `dt` derivation — the one definition of the partition
    * column. Ingest ([[graft.streaming.IngestPipeline.derive]]), promotion
    * ([[graft.analysis.Promoter.rollup]]) and every test fixture must
    * derive `dt` through this; [[apply]]'s pruning is only sound under it.
    * A hand-written `dt` that disagrees with its row's `ts_sec` makes the
    * partition invisible to every windowed read. */
  def dtOf(tsSec: Column): Column = to_date(timestamp_seconds(tsSec))

  /** Bound `df` to days overlapping `[fromSec, toSec]`. No-op when the
    * frame has no `dt` column (un-partitioned test fixtures). Because
    * `dt = to_date(timestamp_seconds(ts_sec))` at ingest
    * (IngestPipeline.derive) and `to_date` is monotone in `ts_sec` for a
    * fixed session timezone, this predicate is IMPLIED by any
    * `ts_sec ∈ [fromSec, toSec]` filter — adding it never changes results,
    * it only enables partition pruning.
    *
    * `slackDays` widens both dt bounds by that many days for callers that
    * must stay exact when the STORE was written under a different session
    * timezone than the reader's (partition names carry the writer's zone;
    * the widest legal divergence, UTC-12 vs UTC+14 = 26 h, moves a row's
    * date by at most 2 days). Constant extra listing, still O(window)
    * partitions. */
  def apply(df: DataFrame, fromSec: Long, toSec: Long,
      slackDays: Int = 0): DataFrame =
    if (df.columns.contains("dt")) {
      val lo = dtOf(lit(fromSec)); val hi = dtOf(lit(toSec))
      if (slackDays == 0) df.filter(col("dt").between(lo, hi))
      else df.filter(col("dt").between(
        date_sub(lo, slackDays), date_add(hi, slackDays)))
    } else df
}
