package graft.search

import graft.GraftFunctions
import graft.control.Rules
import graft.functions.TextFunctions.matchText
import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier-2 query surface: grouped cluster search and triage recommend.
  *
  * Reference (`/root/reference/app/services/forensic_analysis_service.py`):
  *  - clusters (`:17-74`): optional ts-range + full-text filter; query
  *    vector = embedded filter text, or zero vector when absent (`:25-29`);
  *    `search_groups(group_by=rhythm_hash, group_size=1, limit=100)` per
  *    daily collection (`:45-53`), federated merge-sort (`:55-62`),
  *    suppression/patch anti-filter (`:63-65`).
  *  - triage (`:75-96`): Qdrant `recommend` with positive/negative example
  *    ids, `avg(pos) + (avg(pos) - avg(neg))` query vector, top-50.
  *
  * Spark: federation ≡ `dt` partition pruning (the ts-range predicate on a
  * day-partitioned table IS the daily-collection enumeration); grouped
  * search ≡ window top-1-per-hash then top-k — one Catalyst plan, two
  * shuffles. Zero-vector searches score 0.0 with recency tie-break
  * (declared semantics, SURVEY §7.5.3).
  */
object ClusterSearch {

  val GroupLimit = 100
  val TriageLimit = 50

  /** A5/A6/V1/V6/P7/P8/J3/J4 — grouped cluster search over Tier-2. */
  def clusters(
      tier2: DataFrame,
      rules: Option[Rules],
      nowSec: Long,
      startTs: Option[Long] = None,
      endTs: Option[Long] = None,
      textFilter: Option[String] = None,
      limit: Int = GroupLimit): DataFrame = {
    GraftFunctions.register(tier2.sparkSession)
    val ranged = tier2
      .filter(startTs.map(col("start_ts") >= _).getOrElse(lit(true)))
      .filter(endTs.map(col("start_ts") <= _).getOrElse(lit(true)))
    val filtered = textFilter.fold(ranged)(f => ranged.filter(matchText(col("body"), f)))
    val scored = textFilter match {
      case Some(f) =>
        filtered.withColumn("score",
          round(cosine(col("dense"), GraftFunctions.embedText(lit(f))), 6))
      case None => filtered.withColumn("score", lit(0.0))
    }
    val ruled = rules.fold(scored)(_.enforce(scored, nowSec))
    // best hit per rhythm-hash group via the custom bounded-buffer
    // operator (graft.plans.TopKPerGroup) — no per-partition sort, one
    // clustering exchange; ≡ Window row_number()=1 with this ordering
    graft.plans.TopKPerGroup(ruled, Seq("rhythm_hash"),
      Seq(("score", false), ("start_ts", false), ("dt", true)), 1)
      .orderBy(col("score").desc, col("start_ts").desc, col("rhythm_hash"))
      .limit(limit)
      .select("rhythm_hash", "anomaly_type", "anomaly_context", "service",
        "severity", "body", "count", "start_ts", "end_ts", "score")
  }

  /** V3/A7 — triage: recommend by positive/negative cluster examples. */
  def triage(
      tier2: DataFrame,
      positiveHashes: Seq[String],
      negativeHashes: Seq[String],
      limit: Int = TriageLimit): DataFrame = {
    import tier2.sparkSession.implicits._
    val dim = graft.functions.EmbedText.Dim
    import graft.functions.VectorFunctions.avgVector
    // both example averages fold in ONE tier2 scan (avg ignores the
    // NULLs the `when` leaves on the other side) — a serving call pays
    // two jobs (broadcast + main scan), not three; ServeBench showed the
    // per-job floor, not the math, dominates triage latency
    val q =
      if (negativeHashes.isEmpty)
        tier2.filter($"rhythm_hash".isin(positiveHashes: _*))
          .agg(avgVector($"dense", dim).as("qv"))
      else tier2
        .filter($"rhythm_hash".isin(positiveHashes ++ negativeHashes: _*))
        .agg(
          avgVector(when($"rhythm_hash".isin(positiveHashes: _*), $"dense"),
            dim).as("pv"),
          avgVector(when($"rhythm_hash".isin(negativeHashes: _*), $"dense"),
            dim).as("nv"))
        .select(zip_with($"pv", $"nv", (p, n) => p * 2.0 - n).as("qv"))
    tier2
      .filter(!$"rhythm_hash".isin((positiveHashes ++ negativeHashes): _*))
      .crossJoin(broadcast(q))
      .withColumn("score", round(cosine($"dense", $"qv"), 6))
      .orderBy($"score".desc, $"rhythm_hash")
      .limit(limit)
      .select("rhythm_hash", "anomaly_type", "service", "severity", "body",
        "count", "start_ts", "score")
  }
}
