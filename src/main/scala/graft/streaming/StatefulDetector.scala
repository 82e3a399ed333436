package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native rhythm detection: per-hash keyed state instead of
  * re-scanning the Tier-1 table each trigger — the M7 scale variant of
  * [[graft.analysis.RhythmAnalyzer]] (SURVEY §7.5.5 deliberately ships the
  * batch form first; this is the 100 TB path where the historical sample
  * re-read would be too expensive).
  *
  * Semantics (same thresholds as the batch detector, reference
  * `rhythm_analysis_service.py:66-108`): per rhythm hash, keep an
  * exponential per-window baseline rate; when a window closes, classify —
  * novelty if the hash has no baseline and count >= 2, frequency if
  * `count > mean + 2.5*max(1.5, sqrt(mean))` and count >= 3 — then fold
  * the window into the baseline. Late data is bounded by the watermark
  * (T6: the reference has none; we declare watermark-bounded lateness).
  */
object StatefulDetector {

  case class WindowCount(rhythmHash: String, windowStart: Long, n: Long)

  /** Per-hash baseline as EXACT integers (closed windows, summed counts);
    * the mean is derived by one IEEE division. An iterative running double
    * mean here was a cross-engine landmine: after thousands of folds its
    * ulp drift vs the oracle's sum/count lands on a 4-dp rounding boundary
    * (~1/10^4 rows; found by the r9 sf1 sweep) — integer state makes the
    * summation order-independent and the boundary decision identical on
    * both engines.
    *
    * STATE SCHEMA v2 (r9): field 2 changed Double→Long. A stream restarted
    * from a pre-r9 checkpoint fails FAST at start with a migration message
    * ([[ensureStateVersion]]); restart with a fresh checkpoint (baselines
    * re-learn; an evicted-then-relearned baseline is already this
    * detector's documented TTL behavior). */
  case class HashState(windows: Long, sum: Long) {
    def mean: Double =
      if (windows == 0) 0.0 else sum.toDouble / windows.toDouble
  }
  case class Anomaly(rhythm_hash: String, window_start: Long,
      anomaly_type: String, n: Long, baseline_mean: Option[Double])

  val NoveltyMinCount = 2
  val FreqMinCount = 3
  val FreqSigma = 2.5
  val StdFloor = 1.5

  /** Threshold bundle (defaults = the reference's production constants;
    * callers may tighten for low-rate streams). */
  case class Thresholds(
      noveltyMinCount: Long = NoveltyMinCount,
      freqMinCount: Long = FreqMinCount,
      freqSigma: Double = FreqSigma,
      stdFloor: Double = StdFloor)

  /** Classify one closed window against state and update it.
    * Exposed for unit testing; pure apart from `state`.
    *
    * `ttlMs` — idle-state eviction: every update re-arms a processing-time
    * timeout; a rhythm hash with no traffic for the TTL gets its state
    * REMOVED (without this, one HashState per distinct hash lives forever —
    * unbounded on a 100 TB stream where template storms mint new hashes).
    * An evicted hash that reappears re-enters as novelty, which is exactly
    * the reference's behavior for a hash absent from the 10k-point
    * historical sample (rhythm_analysis_service.py:66-108). */
  def classify(th: Thresholds, ttlMs: Option[Long] = None)(
      key: String,
      counts: Iterator[WindowCount],
      state: GroupState[HashState]): Iterator[Anomaly] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val sorted = counts.toSeq.sortBy(_.windowStart)
    var st = state.getOption.getOrElse(HashState(0L, 0L))
    val out = Seq.newBuilder[Anomaly]
    sorted.foreach { wc =>
      if (st.windows == 0) {
        if (wc.n >= th.noveltyMinCount)
          out += Anomaly(key, wc.windowStart, "novelty", wc.n, None)
      } else {
        val mean = st.mean
        val std = math.max(th.stdFloor, math.sqrt(mean))
        if (wc.n > mean + th.freqSigma * std && wc.n >= th.freqMinCount)
          out += Anomaly(key, wc.windowStart, "frequency", wc.n,
            // exact-rational HALF_UP at 4 dp (sum/windows as BigDecimal,
            // not round-of-double) — the oracle's integer-floor form
            // computes the identical value; see HashState
            Some(new java.math.BigDecimal(st.sum)
              .divide(new java.math.BigDecimal(st.windows), 4,
                java.math.RoundingMode.HALF_UP).doubleValue()))
      }
      // fold the window into the baseline (exact integer accumulation)
      st = HashState(st.windows + 1, st.sum + wc.n)
    }
    state.update(st)
    ttlMs.foreach(state.setTimeoutDuration)
    out.result().iterator
  }

  /** Wire the stateful detector over a canonical log stream
    * (rhythm_hash, ts_sec): tumbling windows + watermark + keyed state.
    * Returns the anomaly stream (append mode). */
  /** Default idle-state TTL: an hour of silence evicts a hash's baseline
    * (it re-detects as novelty on return). Pass `stateTtl = None` to keep
    * state forever (test/batch comparisons). */
  val DefaultStateTtlMs: Long = 60 * 60 * 1000L

  /** State-schema version of [[HashState]] (v2 = exact-integer fields,
    * r9). Recorded as `_graft_state_version` in the checkpoint dir by the
    * streams that own keyed state ([[PromotionStream.start]],
    * `Via.startStatefulDetection`) and checked BEFORE the query starts. */
  val StateVersion = 2

  /** Fail FAST on a checkpoint whose keyed state this build cannot read
    * (VERDICT r9 item 6) — at start, with a migration message, instead of
    * a cryptic state-store schema error mid-batch:
    *   - tag == [[StateVersion]] → ok
    *   - tag != → name both versions, tell the operator to restart fresh
    *   - no tag but the checkpoint HAS prior runs (`offsets/` exists) →
    *     a pre-versioning (v1, running-Double baseline) checkpoint
    *   - no tag, no prior runs → fresh checkpoint: stamp it */
  def ensureStateVersion(spark: org.apache.spark.sql.SparkSession,
      checkpoint: String): Unit = {
    import org.apache.hadoop.fs.Path
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = new Path(checkpoint)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tag = new Path(dir, "_graft_state_version")
    val remedy = "Restart with a FRESH checkpoint directory; baselines " +
      "re-learn from traffic (the same observable behavior as a TTL " +
      "eviction, see HashState's Scaladoc)."
    val found: Option[Int] =
      if (!fs.exists(tag)) None
      else {
        val in = fs.open(tag)
        try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
          UTF_8).trim.toInt)
        finally in.close()
      }
    found match {
      case Some(v) if v == StateVersion => ()
      case Some(v) => throw new IllegalStateException(
        s"checkpoint $checkpoint holds HashState schema v$v but this " +
          s"build reads/writes v$StateVersion. $remedy")
      case None if fs.exists(new Path(dir, "offsets")) =>
        throw new IllegalStateException(
          s"checkpoint $checkpoint predates state-schema versioning " +
            "(HashState v1: running-Double baseline). This build's " +
            s"exact-integer HashState v$StateVersion cannot read it. $remedy")
      case None =>
        fs.mkdirs(dir)
        val out = fs.create(tag, true)
        try out.write(StateVersion.toString.getBytes(UTF_8))
        finally out.close()
    }
  }

  def detect(
      logs: DataFrame,
      windowSec: Long = 60,
      watermarkDelay: String = "2 minutes",
      thresholds: Thresholds = Thresholds(),
      stateTtlMs: Option[Long] = Some(DefaultStateTtlMs)): Dataset[Anomaly] = {
    val spark = logs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    logs
      // timestamp_seconds = direct epoch conversion; the
      // to_timestamp(from_unixtime(...)) form round-trips every row
      // through a formatted STRING (tz formatter parse per row)
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("rhythm_hash"), window(col("ts"), s"$windowSec seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("rhythm_hash"),
        unix_timestamp(col("window.start")).as("window_start"), col("n"))
      .as[(String, Long, Long)]
      .map { case (h, w, n) => WindowCount(h, w, n) }
      .groupByKey(_.rhythmHash)
      .flatMapGroupsWithState(
        OutputMode.Append(), timeoutConf)(classify(thresholds, stateTtlMs))
  }
}
