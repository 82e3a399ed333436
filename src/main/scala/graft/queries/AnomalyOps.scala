package graft.queries

import graft.Tables
import graft.analysis.RhythmAnalyzer
import org.apache.spark.sql.functions._

/** The VIA rhythm-anomaly detector (SURVEY §2.8 #5: A2+J1+J2, the flagship
  * pipeline) run batch-style over the `events` table with
  * `rhythm_hash := event_type + ":" + props.k` and declared-deterministic
  * semantics (fixed window cutoff, ts+event_id tie-breaks).
  *
  * Reference: app/services/rhythm_analysis_service.py:32-108.
  *
  * Scale shape: two partial-aggregated groupBys + one TakeOrdered 10k
  * sample + a broadcast-able inner/anti join on the (small) per-hash stats —
  * the 100 TB-scale cost is one scan plus shuffles of per-hash counts only.
  */
object AnomalyOps {

  def queries: Seq[QueryDef] = Seq(anomalyDetect)

  // 2024-01-28 00:00:00 UTC — recent window start; window = 3 days.
  val WindowStart = 1706400000L
  val WindowSec = 259200.0
  val HistSample = 10000
  // mirrors RhythmAnalyzer.DefaultBaselineLookbackSec — the oracle must
  // sample the SAME baseline window as the Spark plan on ANY data, not just
  // fixtures whose history happens to sit inside the bound
  val BaselineFloor: Long = WindowStart - RhythmAnalyzer.DefaultBaselineLookbackSec
  val NoveltyMinCount = 2
  val FreqMinCount = 3
  val FreqSigma = 2.5
  val StdFloor = 1.5

  private val anomalyDetect = QueryDef(
    "anomaly_detect",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).select(
        // native JSON kernel, byte-identical to get_json_object
        // (JsonGetKernelSpec); the DuckDB oracle stays the cross-engine check
        concat($"event_type", lit(":"),
          graft.functions.TextFunctions.jsonGet($"props", "k"))
          .as("rhythm_hash"),
        $"ts_sec",
        $"event_id")
      RhythmAnalyzer.detect(ev,
        windowStart = WindowStart, windowSec = WindowSec,
        histSample = HistSample, noveltyMinCount = NoveltyMinCount,
        freqMinCount = FreqMinCount, freqSigma = FreqSigma,
        stdFloor = StdFloor, tieBreakCol = Some("event_id"))
        .orderBy($"anomaly_type", $"rhythm_hash")
    },
    Some(s"""
      WITH ev AS (
        SELECT event_type || ':' || json_extract_string(props, '$$.k')
            AS rhythm_hash,
          CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_id
        FROM events),
      recent AS (
        SELECT rhythm_hash, count(*) AS n FROM ev
        WHERE ts_sec >= $WindowStart GROUP BY 1),
      base_sample AS (
        SELECT * FROM ev
        WHERE ts_sec < $WindowStart AND ts_sec >= $BaselineFloor
        ORDER BY ts_sec DESC, event_id DESC LIMIT $HistSample),
      span AS (SELECT greatest(CAST(max(ts_sec) - min(ts_sec) AS DOUBLE), 1.0)
          AS dur, count(*) AS base_n FROM base_sample),
      stats AS (
        SELECT rhythm_hash,
          count(*) * ($WindowSec / (SELECT dur FROM span)) AS mean
        FROM base_sample
        WHERE (SELECT base_n FROM span) >= 2
        GROUP BY 1),
      stats2 AS (
        SELECT rhythm_hash, mean, greatest($StdFloor, sqrt(mean)) AS std
        FROM stats)
      SELECT rhythm_hash, 'novelty' AS anomaly_type, n,
        CAST(NULL AS DOUBLE) AS baseline_mean
      FROM recent
      WHERE rhythm_hash NOT IN (SELECT rhythm_hash FROM stats2)
        AND n >= $NoveltyMinCount
      UNION ALL
      SELECT r.rhythm_hash, 'frequency' AS anomaly_type, r.n,
        round(s.mean, 4) AS baseline_mean
      FROM recent r JOIN stats2 s USING (rhythm_hash)
      WHERE r.n > s.mean + $FreqSigma * s.std AND r.n >= $FreqMinCount
      ORDER BY anomaly_type, rhythm_hash
    """))
}
