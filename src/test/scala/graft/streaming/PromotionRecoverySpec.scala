package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Checkpoint recovery for the Tier-2 promotion stream: the query is
  * STOPPED between micro-batches and restarted from its checkpoint dir,
  * and a sink-level batch replay is forced directly — Tier-2 must end up
  * with exactly the batch-reference rows: no loss (the restart resumes
  * detector state + source offsets), no duplication (the batch_id-keyed
  * dynamic-overwrite sink is replay-idempotent). */
class PromotionRecoverySpec extends SparkSpec {

  private val th = StatefulDetector.Thresholds(
    noveltyMinCount = 2, freqMinCount = 2, freqSigma = 1.0, stdFloor = 0.5)

  test("stop mid-stream, restart from checkpoint: exactly the batch-reference rows") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-promo-rec").toString
    val base = 1700000000L
    def writeT1(rows: Seq[(String, Long)]): Unit =
      rows.zipWithIndex.map { case ((h, ts), i) =>
        (h, ts, "auth", "INFO", s"evt $i at $ts")
      }.toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
        .write.mode("append").parquet(s"$tmp/tier1")

    // phase 1: a novelty window for h1, plus a sentinel that closes it
    // WITHOUT advancing the watermark past phase 2's events (base+75 - 10s
    // delay = watermark base+65: window [base, base+60) closes, and the
    // phase-2 burst at base+120 is still on-time after the restart)
    writeT1(Seq.tabulate(3)(i => ("h1", base + i)))
    writeT1(Seq(("close1", base + 75)))
    val q1 = PromotionStream.start(spark, s"$tmp/tier1", s"$tmp/tier2",
      s"$tmp/ckpt", rules = None, windowSec = 60,
      watermarkDelay = "10 seconds", thresholds = th,
      triggerMs = 100, stateTtlMs = None)
    try q1.processAllAvailable() finally q1.stop()

    // phase 2 arrives while NO query is running: a frequency burst for h1
    // (needs the baseline carried in the RECOVERED detector state) and the
    // closing sentinel
    writeT1(Seq.tabulate(8)(i => ("h1", base + 120 + i)))
    writeT1(Seq(("close2", base + 4000)))
    val q2 = PromotionStream.start(spark, s"$tmp/tier1", s"$tmp/tier2",
      s"$tmp/ckpt", rules = None, windowSec = 60,
      watermarkDelay = "10 seconds", thresholds = th,
      triggerMs = 100, stateTtlMs = None)
    try q2.processAllAvailable() finally q2.stop()

    // batch reference over ALL events, promoted via the append path
    val allEvents = spark.read.parquet(s"$tmp/tier1")
      .select("rhythm_hash", "ts_sec")
    val batchAnoms = StatefulDetector.detect(allEvents, 60, thresholds = th).toDF()
    PromotionStream.promoteBatch(spark, batchAnoms,
      s"$tmp/tier1", s"$tmp/t2_ref", None, 60)

    def rows(path: String): Seq[String] =
      spark.read.parquet(path)
        .select("rhythm_hash", "anomaly_type", "anomaly_context", "start_ts",
          "end_ts", "count", "service", "severity", "body")
        .collect().map(_.toString).toSeq.sorted
    val got = rows(s"$tmp/tier2")
    val want = rows(s"$tmp/t2_ref")
    assert(want.exists(_.contains("novelty")) && want.exists(_.contains("frequency")),
      s"reference must cover both anomaly branches, got $want")
    assert(got == want, s"recovery broke exactly-once:\n got=$got\nwant=$want")
  }

  test("a replayed foreachBatch batch does not duplicate Tier-2 rows") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-promo-replay").toString
    val base = 1700000000L
    Seq.tabulate(3)(i => ("h1", base + i)).zipWithIndex
      .map { case ((h, ts), i) => (h, ts, "auth", "INFO", s"evt $i") }
      .toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
      .write.parquet(s"$tmp/tier1")
    val anoms = StatefulDetector.detect(
      spark.read.parquet(s"$tmp/tier1").select("rhythm_hash", "ts_sec"),
      60, thresholds = th).toDF()

    PromotionStream.promoteBatchIdempotent(
      spark, anoms, 7L, s"$tmp/tier1", s"$tmp/tier2", None, 60)
    val once = spark.read.parquet(s"$tmp/tier2")
      .collect().map(_.toString).toSeq.sorted
    assert(once.nonEmpty)
    // the crash-replay: same batchId, same input, run again
    PromotionStream.promoteBatchIdempotent(
      spark, anoms, 7L, s"$tmp/tier1", s"$tmp/tier2", None, 60)
    val twice = spark.read.parquet(s"$tmp/tier2")
      .collect().map(_.toString).toSeq.sorted
    assert(twice == once, s"replay duplicated rows:\n once=$once\n twice=$twice")
    // a DIFFERENT batchId writes its own partitions without touching batch 7
    PromotionStream.promoteBatchIdempotent(
      spark, anoms, 8L, s"$tmp/tier1", s"$tmp/tier2", None, 60)
    val both = spark.read.parquet(s"$tmp/tier2")
    assert(both.filter(col("batch_id") === 7L).count() == once.size.toLong)
    assert(both.filter(col("batch_id") === 8L).count() == once.size.toLong)
  }
}
