package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** T5 fully-streaming: watermarked detection → per-window promotion must
  * produce EXACTLY the rows the batch path produces for the same events
  * (the parity contract of PromotionStream.promoteBatch). */
class PromotionStreamSpec extends SparkSpec {

  test("streaming promotion == batch promotion for the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-promo").toString
    val base = 1700000000L
    val th = StatefulDetector.Thresholds(
      noveltyMinCount = 2, freqMinCount = 2, freqSigma = 1.0, stdFloor = 0.5)
    val windowSec = 60L

    // window base+0: novelty (n=3); window base+120: frequency burst (n=8)
    val events: Seq[(String, Long)] =
      Seq.tabulate(3)(i => ("h1", base + i)) ++
        Seq.tabulate(8)(i => ("h1", base + 120 + i))

    // Tier-1 fixture the promotion joins its points from
    events.zipWithIndex.map { case ((h, ts), i) =>
      (h, ts, "auth", "INFO", s"login event $i")
    }.toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
      .write.parquet(s"$tmp/tier1")

    // --- batch reference: detector in batch mode, same promotion fn ---
    val batchAnoms = StatefulDetector.detect(
      events.toDF("rhythm_hash", "ts_sec"), windowSec, thresholds = th).toDF()
    PromotionStream.promoteBatch(spark, batchAnoms,
      s"$tmp/tier1", s"$tmp/t2_batch", None, windowSec)

    // --- streaming: MemoryStream + watermark closes the windows ---
    val input = MemoryStream[(String, Long)]
    // stateTtlMs = None: with ProcessingTimeTimeout the engine schedules
    // timeout-check batches continuously under the default 0ms trigger and
    // processAllAvailable never settles — TTL behavior is unit-tested in
    // StatefulDetectorTtlSpec; production (PromotionStream.start) runs a
    // real trigger interval, where timeout batches fire once per trigger
    val q = StatefulDetector.detect(
      input.toDF().toDF("rhythm_hash", "ts_sec"), windowSec,
      watermarkDelay = "10 seconds", thresholds = th, stateTtlMs = None).toDF()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        PromotionStream.promoteBatch(b.sparkSession, b,
          s"$tmp/tier1", s"$tmp/t2_stream", None, windowSec)
      }
      .start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // watermark sentinel: closes both windows; its own count of 1 is
      // below noveltyMinCount so it flags in NEITHER path
      input.addData(("sentinel", base + 4000))
      q.processAllAvailable()
    } finally q.stop()

    def rows(path: String): Seq[String] =
      spark.read.parquet(path)
        .drop("dense", "sparse_idx", "sparse_val") // deterministic, but bulky
        .collect().map(_.toString).toSeq.sorted
    val batchRows = rows(s"$tmp/t2_batch")
    val streamRows = rows(s"$tmp/t2_stream")
    assert(batchRows.nonEmpty, "batch reference must promote something")
    assert(batchRows.exists(_.contains("novelty")))
    assert(batchRows.exists(_.contains("frequency")))
    assert(streamRows == batchRows,
      s"parity broken:\nbatch=$batchRows\nstream=$streamRows")
  }

  test("start refuses a legacy (batch_id, dt)-partitioned tier2 store") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-promo-legacy").toString
    Seq(("h1", 1700000000L)).toDF("rhythm_hash", "ts_sec")
      .withColumn("dt", graft.analysis.DtPrune.dtOf(
        org.apache.spark.sql.functions.col("ts_sec")))
      .write.partitionBy("dt").parquet(s"$tmp/tier1")
    // the pre-r13 streaming layout: a top-level batch_id= leaf
    Files.createDirectories(java.nio.file.Paths.get(
      s"$tmp/tier2/batch_id=0/dt=2023-11-14"))
    val e = intercept[IllegalArgumentException] {
      PromotionStream.start(spark, s"$tmp/tier1", s"$tmp/tier2",
        s"$tmp/ckpt", stateTtlMs = None)
    }
    assert(e.getMessage.contains("legacy"), e.getMessage)
  }

  test("PromotionStream.start wires tier1 file stream -> tier2 end to end") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-promo-e2e").toString
    val base = 1700000000L
    val th = StatefulDetector.Thresholds(
      noveltyMinCount = 2, freqMinCount = 2, freqSigma = 1.0, stdFloor = 0.5)
    def writeT1(rows: Seq[(String, Long)]): Unit =
      rows.zipWithIndex.map { case ((h, ts), i) =>
        (h, ts, "auth", "INFO", s"evt $i")
      }.toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
        .write.mode("append").parquet(s"$tmp/tier1")

    writeT1(Seq.tabulate(3)(i => ("hx", base + i)))
    val q = PromotionStream.start(spark, s"$tmp/tier1", s"$tmp/tier2",
      s"$tmp/ckpt", rules = None, windowSec = 60,
      watermarkDelay = "10 seconds", thresholds = th,
      triggerMs = 100, stateTtlMs = None)
    try {
      q.processAllAvailable()
      writeT1(Seq(("hx", base + 4000))) // watermark sentinel closes the window
      q.processAllAvailable()
    } finally q.stop()
    val t2 = spark.read.parquet(s"$tmp/tier2")
    val got = t2.select("rhythm_hash", "anomaly_type", "count").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got.contains(("hx", "novelty", 3L)), s"got: $got")
    // the streaming write also carries corpus-avgdl sparse weights: every
    // windowed body is 2 tokens → avgdl == dl → tf=1 weight is exactly 1.0
    val sv = t2.select("sparse_val").head().getSeq[Float](0)
    assert(sv.nonEmpty && sv.forall(v => math.abs(v - 1.0f) < 1e-6f),
      s"corpus-avgdl weights expected in the streaming Tier-2 write, got $sv")
  }

  test("catch-up idempotent promotion (many windows, one scan) == per-window loop") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-promo-catchup").toString
    // aligned to the 60 s tumbling grid: promoteBatchIdempotent's one-scan
    // join keys points by epoch-aligned window, the contract the detector's
    // window() guarantees upstream
    val base = 1700000040L
    val windowSec = 60L

    // Tier-1: two hashes across 5 consecutive windows, distinct bodies so
    // per-window avgdl and min_by representatives differ between windows
    val t1rows = for {
      w <- 0 until 5
      h <- Seq("ha", "hb")
      i <- 0 until (w + 2)
    } yield (h, base + w * 60 + i, "auth", if (h == "ha") "INFO" else "WARN",
      s"body $h window $w item $i with ${"x " * (w + 1)}tokens")
    t1rows.toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
      .write.parquet(s"$tmp/tier1")

    // a catch-up micro-batch: both hashes anomalous in every window
    val anoms = (for {
      w <- 0 until 5
      h <- Seq("ha", "hb")
    } yield (h, base + w * 60L, if (w == 0) "novelty" else "frequency",
      (w + 2).toLong, if (w == 0) None else Some(1.5 + w)))
      .toDF("rhythm_hash", "window_start", "anomaly_type", "n", "baseline_mean")

    // suppression whose TTL expires MID-BATCH: hb is suppressed for the
    // windows closing at/before base+180 and must re-appear after — the
    // per-row clock enforceAt has to reproduce the per-window enforce
    val rules = new graft.control.Rules(spark, s"$tmp/rules")
    rules.suppress("hb", ttlSec = 181, nowSec = base) // expires_at = base+181

    // reference: the pre-r9 per-window loop, verbatim
    val t1 = spark.read.parquet(s"$tmp/tier1")
    val windows = anoms.select("window_start").distinct()
      .collect().map(_.getLong(0)).sorted
    val reference = windows.toSeq.map { w =>
      val nowSec = w + windowSec
      val a0 = anoms.filter($"window_start" === w)
        .select("rhythm_hash", "anomaly_type", "n", "baseline_mean")
      val aW = rules.enforce(a0, nowSec)
      val pts = graft.analysis.DtPrune(
        t1.filter($"ts_sec" >= w && $"ts_sec" < nowSec), w, nowSec)
      graft.analysis.Promoter.rollup(aW, pts)
    }.reduce(_ unionByName _)

    PromotionStream.promoteBatchIdempotent(spark, anoms, batchId = 7L,
      s"$tmp/tier1", s"$tmp/tier2", Some(rules), windowSec)

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val d = df.drop("batch_id")
      // parquet read-back reorders partition columns to the end
      d.select(d.columns.sorted.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toString).toSeq.sorted
    }
    val got = canon(spark.read.parquet(s"$tmp/tier2"))
    val want = canon(reference)
    // hb's suppression (expires base+181) covers the windows CLOSING at
    // base+60/120/180 -> 3 of hb's 5 windows drop: 5 (ha) + 2 (hb) = 7
    assert(want.size == 7, s"expected 2 hashes x 5 windows - 3 suppressed: $want")
    assert(got == want, s"catch-up parity broken:\ngot=$got\nwant=$want")
  }
}
