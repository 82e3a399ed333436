package graft.api

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.StatefulDetector

/** Fully streaming path: ingest appends to Tier-1, which is ITSELF a
  * streaming source for the stateful detector — log line in, anomaly row
  * out, no polling anywhere. */
class StreamingPipelineSpec extends SparkSpec {

  private val base = 1700000000L

  private def otel(service: String, ts: Long, body: String) =
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"$service"}}]},""" +
      s""""scopeLogs":[{"logRecords":[{"timeUnixNano":"${ts}000000000","severityText":"ERROR",""" +
      s""""body":{"stringValue":"$body"}}]}]}]}"""

  test("ingest stream -> tier1 -> stateful detection stream -> anomalies") {
    import spark.implicits._
    val via = new Via(spark, Files.createTempDirectory("pipe").toString)

    // batch 1: a novel burst in window [base, base+60)
    via.ingestBatch((0 until 4).map(i =>
      otel("pay", base + 10 + i, "card declined for order x")).toDF("value"))

    // stateTtlMs = None: processAllAvailable is unreliable under
    // ProcessingTimeTimeout (TTL is unit-tested in StatefulDetectorTtlSpec)
    val q = via.startStatefulDetection(
      windowSec = 60, watermarkDelay = "30 seconds", stateTtlMs = None)
    try {
      q.processAllAvailable()
      // batch 2: much later traffic — advances the watermark past the
      // first window so its state closes and the anomaly is emitted
      via.ingestBatch(Seq(
        otel("pay", base + 600, "heartbeat a"),
        otel("pay", base + 1200, "heartbeat b")).toDF("value"))
      q.processAllAvailable()

      val out = via.anomalies().collect()
      assert(out.nonEmpty, "stateful stream emitted the closed window")
      val novel = out.filter(_.getAs[String]("anomaly_type") == "novelty")
      assert(novel.exists(_.getAs[Long]("n") == 4L),
        s"burst of 4 flagged: ${out.toSeq}")
      assert(novel.forall(_.getAs[Long]("window_start") % 60 == 0))
    } finally q.stop()
  }

  test("thresholds thread through the facade") {
    import spark.implicits._
    val via = new Via(spark, Files.createTempDirectory("pipe2").toString)
    via.ingestBatch(Seq(otel("db", base + 5, "single event")).toDF("value"))
    val q = via.startStatefulDetection(windowSec = 60,
      watermarkDelay = "10 seconds",
      thresholds = StatefulDetector.Thresholds(noveltyMinCount = 1),
      stateTtlMs = None)
    try {
      q.processAllAvailable()
      via.ingestBatch(Seq(otel("db", base + 300, "later")).toDF("value"))
      q.processAllAvailable()
      assert(via.anomalies().collect()
        .exists(r => r.getAs[String]("anomaly_type") == "novelty" &&
          r.getAs[Long]("n") == 1L))
    } finally q.stop()
  }
}
