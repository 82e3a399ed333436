package graft

import java.nio.file.Files

import graft.analysis.RhythmAnalyzer
import graft.control.{Evals, Rules, SchemaEngine}
import graft.search.ClusterSearch
import graft.streaming.{AnalysisJob, IngestPipeline}

/** End-to-end flow mirroring the reference's integration test
  * (`/root/reference/tests/test_api_flow.py:14-83`) with no services:
  * seeded OTel fixture → streaming ingest → rhythm analysis (must find the
  * injected novelty + frequency anomalies) → promotion → cluster search →
  * suppress → re-detect (gone) → eval case replay. */
class E2EFlowSpec extends SparkSpec {

  private def otelLine(service: String, level: String, tsSec: Long, body: String): String = {
    val esc = body.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"$service"}}]},""" +
      s""""scopeLogs":[{"logRecords":[{"timeUnixNano":"${tsSec}000000000","severityText":"$level",""" +
      s""""body":{"stringValue":"$esc"}}]}]}]}"""
  }

  private val now = 1700000000L // fixed clock: 2023-11-14T22:13:20Z
  private val windowStart = now - 60

  /** Fixture: steady baseline template over 10 min of history + two
    * injected anomalies inside the recent 60 s window. */
  private def fixtureLines(): Seq[String] = {
    val steady = (0 until 600 by 5).map(i =>
      otelLine("checkout", "INFO", now - 660 + i,
        s"request ${1000 + i} completed in ${i % 90} ms"))
    val steadyRecent = (0 until 60 by 5).map(i =>
      otelLine("checkout", "INFO", windowStart + i,
        s"request ${5000 + i} completed in ${i % 90} ms"))
    val novel = (0 until 3).map(i =>
      otelLine("payments", "ERROR", windowStart + 10 + i,
        s"card declined for order ${700 + i}"))
    val burst = (0 until 40).map(i =>
      otelLine("auth", "WARN", windowStart + 20 + (i % 30),
        s"rate limited user ${i % 7} from 10.0.0.${i % 9}"))
    val burstHistory = (0 until 4).map(i =>
      otelLine("auth", "WARN", now - 500 + i * 100,
        s"rate limited user ${90 + i} from 10.0.1.${i}"))
    steady ++ steadyRecent ++ novel ++ burst ++ burstHistory
  }

  test("ingest -> detect -> promote -> search -> suppress -> eval replay") {
    import spark.implicits._
    val work = Files.createTempDirectory("e2e").toString
    val inDir = s"$work/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    val tier1 = s"$work/tier1"; val tier2 = s"$work/tier2"

    // --- ingest via Structured Streaming (file source, one JSONL file)
    Files.writeString(java.nio.file.Paths.get(s"$inDir/batch1.jsonl"),
      fixtureLines().mkString("\n"))
    val q = IngestPipeline.start(spark, inDir, tier1, s"$work/ckpt")
    q.processAllAvailable(); q.stop()

    val t1 = spark.read.parquet(tier1)
    assert(t1.count() == fixtureLines().size, "all records ingested")
    assert(t1.columns.toSet.contains("rhythm_hash") && t1.columns.contains("simhash"))
    // raw record retained (reference's full_log_json payload field)
    assert(t1.columns.contains("full_log_json"))
    assert(t1.select("full_log_json").as[String].collect()
      .forall(_.contains("resourceLogs")))
    // template masking: integers/IPs gone from templates
    assert(!t1.select("template").as[String].collect().exists(_.matches(".*\\b\\d+\\b.*")))

    // --- rhythm analysis over the recent 60 s window
    val rules = new Rules(spark, s"$work/rules")
    val detected = AnalysisJob.runOnce(spark, tier1, tier2, rules, now)
    val byType = detected.select("anomaly_type", "rhythm_hash").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(byType.exists(_._1 == "novelty"), s"novelty found: $byType")
    assert(byType.exists(_._1 == "frequency"), s"frequency burst found: $byType")
    assert(!byType.map(_._1).contains("checkout"), "steady template not flagged")

    // --- tier-2 promoted clusters are queryable
    val t2 = spark.read.parquet(tier2)
    val found = ClusterSearch.clusters(t2, Some(rules), now,
      textFilter = Some("card declined"))
    val hits = found.collect()
    assert(hits.nonEmpty, "text-filtered cluster search finds the novel anomaly")
    assert(hits.head.getAs[String]("anomaly_type") == "novelty")
    assert(hits.head.getAs[Double]("score") > 0.5, "embedded filter text scores high")

    // unfiltered search returns both clusters with declared zero-vector semantics
    val all = ClusterSearch.clusters(t2, Some(rules), now)
    assert(all.count() >= 2)
    assert(all.select("score").as[Double].collect().forall(_ == 0.0))

    // --- control loop: suppress the frequency hash, re-detect -> gone
    val freqHash = byType.find(_._1 == "frequency").get._2
    rules.suppress(freqHash, ttlSec = 3600, nowSec = now)
    val after = AnalysisJob.runOnce(spark, tier1, tier2, rules, now)
    assert(!after.select("rhythm_hash").as[String].collect().contains(freqHash),
      "suppressed hash no longer flagged")
    // TTL expiry: after expiry the rule stops matching
    assert(rules.active(now + 7200).count() == 0)

    // --- patch + eval-case generation + replay (the runner the reference lacks)
    val novelHash = byType.find(_._1 == "novelty").get._2
    rules.patch(novelHash)
    val evals = new Evals(s"$work/evals")
    val ctx = t1.filter($"rhythm_hash" === novelHash)
      .select("body").as[String].collect().toSeq
    evals.write(novelHash, ctx)
    val cases = evals.readAll()
    assert(cases.nonEmpty)
    cases.foreach { c =>
      val flagged = AnalysisJob.runOnce(spark, tier1, tier2, rules, now)
        .select("rhythm_hash").as[String].collect()
      assert(flagged.contains(c.rhythmHash) == c.expectedAnomaly,
        s"eval case ${c.rhythmHash}: expected anomaly=${c.expectedAnomaly}")
    }

    // --- tail (S3)
    val tail = IngestPipeline.tail(t1, n = 10, substring = Some("DECLINED"))
    assert(tail.count() == 3, "case-insensitive substring tail")
  }

  test("schema detection: OTel and BGL (C1/C2)") {
    import spark.implicits._
    val otel = SchemaEngine.detect(Seq(otelLine("s", "INFO", now, "hello")))
    assert(otel.exists(_.format == "otel-json"))
    assert(otel.get.fields.map(_.name) == Seq("timestamp", "level", "service", "message"))

    val bgl = "- 1117838570 2005.06.03 R02-M1-N0-C:J12-U11 2005-06-03-15.42.50.363779 " +
      "R02-M1-N0-C:J12-U11 RAS KERNEL INFO instruction cache parity error corrected"
    val det = SchemaEngine.detect(Seq(bgl))
    assert(det.exists(_.format == "bgl"))
    val parsed = SchemaEngine.parseBgl(Seq(bgl).toDF("value")).collect().head
    assert(parsed.getLong(0) == 1117838570L)
    assert(parsed.getString(1) == "INFO")
    assert(parsed.getString(3) == "instruction cache parity error corrected")

    val reg = new graft.control.SchemaRegistry(spark,
      Files.createTempDirectory("schreg").toString + "/schemas")
    reg.save("bgl-src", det.get)
    reg.save("bgl-src", det.get) // idempotent upsert
    assert(reg.list() == Seq("bgl-src"))
    assert(reg.get("bgl-src").exists(_._1 == "bgl"))
  }
}
