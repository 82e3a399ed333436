package graft.search

import graft.SparkSpec
import graft.analysis.Promoter
import org.apache.spark.sql.DataFrame

/** Declared-semantics unit spec for the Tier-2 query surface (SURVEY
  * §7.5.3-4: the reference's zero-vector search and group_size=1 ties are
  * nondeterministic; the engine pins them). */
class ClusterSearchSpec extends SparkSpec {

  private def tier2(): DataFrame = {
    import spark.implicits._
    val anomalies = Seq(
      ("ha", "novelty", 4L, None: Option[Double]),
      ("hb", "frequency", 9L, Some(2.0)),
      ("hc", "novelty", 2L, None: Option[Double]))
      .toDF("rhythm_hash", "anomaly_type", "n", "baseline_mean")
    val points = Seq(
      ("ha", 1000L, "db", "ERROR", "deadlock detected on orders"),
      ("ha", 1400L, "db", "ERROR", "deadlock detected on orders"),
      ("hb", 1200L, "auth", "WARN", "rate limited user login"),
      ("hc", 1600L, "web", "INFO", "session replay started"))
      .toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
    Promoter.rollup(anomalies, points)
  }

  test("no text filter: declared zero scores, recency-then-hash order") {
    val out = ClusterSearch.clusters(tier2(), None, nowSec = 2000).collect()
    assert(out.forall(_.getAs[Double]("score") == 0.0))
    val hashes = out.map(_.getAs[String]("rhythm_hash")).toSeq
    assert(hashes == Seq("hc", "hb", "ha"), s"start_ts desc tie-break: $hashes")
  }

  test("text filter: MatchText prunes and the embedded query ranks") {
    val out = ClusterSearch.clusters(tier2(), None, nowSec = 2000,
      textFilter = Some("deadlock orders")).collect()
    assert(out.map(_.getAs[String]("rhythm_hash")).toSeq == Seq("ha"),
      "all query tokens must match")
    assert(out.head.getAs[Double]("score") > 0.5)
  }

  test("ts range federation prunes by start_ts") {
    val out = ClusterSearch.clusters(tier2(), None, nowSec = 2000,
      startTs = Some(1100L), endTs = Some(1500L)).collect()
    assert(out.map(_.getAs[String]("rhythm_hash")).toSeq == Seq("hb"))
  }

  test("triage excludes examples and ranks by recommend vector") {
    val out = ClusterSearch.triage(tier2(), Seq("ha"), Seq("hc")).collect()
    val hashes = out.map(_.getAs[String]("rhythm_hash")).toSeq
    assert(!hashes.contains("ha") && !hashes.contains("hc"))
    assert(hashes == Seq("hb"))
  }
}
