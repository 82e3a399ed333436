package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Proves StatefulDetector.detect runs as a REAL stream (window aggregate
  * chained into flatMapGroupsWithState), not just in batch mode. */
class StatefulStreamingSmokeSpec extends SparkSpec {

  test("windowed stateful detection over a MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val logs = input.toDF().toDF("rhythm_hash", "ts_sec")

    // stateTtlMs = None: processAllAvailable is unreliable under
    // ProcessingTimeTimeout's continuous timeout-check batches (see
    // PromotionStreamSpec); TTL is unit-tested in StatefulDetectorTtlSpec
    val q = StatefulDetector.detect(logs, watermarkDelay = "10 seconds",
      stateTtlMs = None)
      .writeStream.format("memory").queryName("anomalies")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = 1700000000L
      // batch 1: a novel hash with 3 hits in one window
      input.addData(("novel", base + 1), ("novel", base + 5), ("novel", base + 9))
      q.processAllAvailable()
      // batch 2: advance the watermark far enough to close the first window
      input.addData(("novel", base + 600))
      q.processAllAvailable()
      input.addData(("novel", base + 1200))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM anomalies").collect()
      assert(rows.exists(r => r.getAs[String]("rhythm_hash") == "novel" &&
        r.getAs[String]("anomaly_type") == "novelty" && r.getAs[Long]("n") == 3),
        s"got: ${rows.toSeq}")

      // T6 — late data beyond the watermark is DROPPED (declared,
      // watermark-bounded semantics; the reference has no lateness bound):
      // a straggler for the long-closed first window must not re-open it
      // or emit a second anomaly for that window.
      val before = spark.sql("SELECT count(*) FROM anomalies").collect()(0).getLong(0)
      input.addData(("late-hash", base + 2), ("late-hash", base + 3))
      input.addData(("novel", base + 1800)) // keeps the watermark advancing
      q.processAllAvailable()
      val lateRows = spark.sql(
        "SELECT * FROM anomalies WHERE rhythm_hash = 'late-hash'").collect()
      assert(lateRows.isEmpty,
        s"late rows behind the watermark must be dropped: ${lateRows.toSeq}")
      assert(spark.sql("SELECT count(*) FROM anomalies").collect()(0).getLong(0)
        >= before)
    } finally q.stop()
  }
}
