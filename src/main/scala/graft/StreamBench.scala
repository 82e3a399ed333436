package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.control.Rules
import graft.streaming.{IngestPipeline, PromotionStream}

/** Measured throughput for the streaming path (T1-T7) — the batch bench
  * covers queries; this covers the two long-running streams a deployment
  * actually operates:
  *
  *  1. `ingest`  — OTel JSONL files → parse → P1-P3 derivations →
  *     day-partitioned Tier-1 parquet ([[IngestPipeline.start]]);
  *  2. `detect`  — Tier-1 file stream → watermarked windowed counts →
  *     keyed-state classification → idempotent Tier-2 promotion
  *     ([[PromotionStream.start]]).
  *
  * Events are generated distributed (no driver loop): ~200 distinct
  * rhythm shapes across 8 services, timestamps spread over 2 h so windows
  * and baselines are real. `processAllAvailable` drains everything, so
  * the number is sustained THROUGHPUT (rows/s of pipeline capacity);
  * per-event latency is trigger-bound and not measured here.
  *
  * Usage: `sbt "runMain graft.StreamBench [nEvents] [nFiles]"`.
  * One JSON line per leg to stdout and `target/streambench/results.jsonl`.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nFiles = if (args.length > 1) args(1).toInt else 32
    val root = "target/streambench"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(root))
    val resultsPath = Paths.get(s"$root/results.jsonl")
    val work = Files.createTempDirectory("streambench").toString
    val inDir = s"$work/in"
    Files.createDirectories(Paths.get(inDir))

    // --- distributed OTel JSONL generation: 8 services x ~25 templates,
    // 2 h of event time, deterministic hash arithmetic
    val base = 1700000000L
    spark.range(n).selectExpr(
      s"""format_string(
        '{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc%d"}}]},"scopeLogs":[{"logRecords":[{"timeUnixNano":"%d000000000","severityText":"%s","body":{"stringValue":"op %d completed in %d ms for user %d"}}]}]}]}',
        pmod(hash(id), 8),
        $base + pmod(hash(id, 1), 7200),
        element_at(array('INFO','INFO','INFO','WARN','ERROR'), int(pmod(hash(id, 2), 5)) + 1),
        pmod(hash(id, 3), 25),
        pmod(hash(id, 4), 500),
        pmod(hash(id, 5), 10000)) AS value""")
      .repartition(nFiles)
      .write.mode("overwrite").text(inDir)

    def record(leg: String, rows: Long, sec: Double, extra: String = ""): Unit = {
      val line = f"""{"leg":"$leg","rows":$rows,"sec":$sec%.2f,""" +
        f""""rows_per_sec":${rows / sec}%.0f$extra}"""
      println(s"[streambench] $line")
      Files.writeString(resultsPath, line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

    // --- leg 1: ingest throughput
    val tier1 = s"$work/tier1"
    val t0 = System.nanoTime()
    val q1 = IngestPipeline.start(spark, inDir, tier1, s"$work/ckpt1",
      triggerMs = 200, maxFilesPerTrigger = 8)
    q1.processAllAvailable(); q1.stop()
    val ingestSec = (System.nanoTime() - t0) / 1e9
    val t1Rows = spark.read.parquet(tier1).count()
    record("ingest", t1Rows, ingestSec)

    // --- leg 2: detect + promote throughput over the Tier-1 stream
    val tier2 = s"$work/tier2"
    val rules = new Rules(spark, s"$work/rules")
    val t2 = System.nanoTime()
    // stateTtlMs = None: with ProcessingTimeTimeout armed, the engine
    // schedules timeout-check batches indefinitely and
    // `processAllAvailable` never settles (same reason the recovery specs
    // run with NoTimeout) — a drain-and-stop benchmark needs the
    // data-driven trigger only; TTL eviction is load-independent
    val q2 = PromotionStream.start(spark, tier1, tier2, s"$work/ckpt2",
      rules = Some(rules), triggerMs = 200, stateTtlMs = None,
      thresholds = graft.streaming.StatefulDetector.Thresholds(
        noveltyMinCount = 1, freqMinCount = 2, freqSigma = 1.0, stdFloor = 0.5))
    q2.processAllAvailable(); q2.stop()
    val detectSec = (System.nanoTime() - t2) / 1e9
    val anomalies =
      try spark.read.parquet(tier2).count() catch { case _: Exception => 0L }
    record("detect_promote", t1Rows, detectSec,
      f""","anomalies":$anomalies""")

    spark.stop()
  }
}
