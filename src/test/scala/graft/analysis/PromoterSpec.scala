package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PromoterSpec extends SparkSpec {

  test("rollup: earliest-row representative, 5-sample cap, vectors present") {
    import spark.implicits._
    val anomalies = Seq(("h1", "frequency", 9L, Some(2.5)), ("h2", "novelty", 3L, None))
      .toDF("rhythm_hash", "anomaly_type", "n", "baseline_mean")
    val points = (0 until 9).map(i =>
      ("h1", 1000L + i, "svc", "WARN", s"body $i")) ++
      (0 until 3).map(i => ("h2", 2000L + i, "db", "ERROR", s"boom $i"))
    val pts = points.toDF("rhythm_hash", "ts_sec", "service", "severity", "body")

    val out = Promoter.rollup(anomalies, pts).collect()
      .map(r => r.getAs[String]("rhythm_hash") -> r).toMap
    assert(out.size == 2)

    val h1 = out("h1")
    assert(h1.getAs[Long]("start_ts") == 1000L && h1.getAs[Long]("end_ts") == 1008L)
    assert(h1.getAs[Long]("count") == 9L)
    assert(h1.getAs[String]("body") == "body 0", "representative = earliest")
    assert(h1.getSeq[Any](h1.fieldIndex("sample_logs")).size == Promoter.SampleLogs)
    assert(h1.getAs[String]("anomaly_context").contains("baseline=2.5"))
    assert(h1.getSeq[Float](h1.fieldIndex("dense")).length == graft.functions.EmbedText.Dim)
    assert(h1.getSeq[Int](h1.fieldIndex("sparse_idx")).nonEmpty)
    // corpus-avgdl proof: every fixture body is exactly 2 tokens, so
    // avgdl == dl and the BM25 TF weight collapses to exactly 1.0 for
    // tf=1 — the fixed AvgDl=256 fallback would give ~1.683 instead
    assert(h1.getSeq[Float](h1.fieldIndex("sparse_val"))
      .forall(v => math.abs(v - 1.0f) < 1e-6f),
      "sparse weights must use the window-corpus avgdl, not the fixed fallback")
    assert(h1.getAs[String]("entity_type") == "event_cluster")

    val h2 = out("h2")
    assert(h2.getSeq[Any](h2.fieldIndex("sample_logs")).size == 3, "fewer than cap kept as-is")
    assert(!h2.getAs[String]("anomaly_context").contains("baseline"))
    // dt partition column derives from start_ts's day
    assert(h2.getAs[java.sql.Date]("dt").toString == "1970-01-01")
  }
}
