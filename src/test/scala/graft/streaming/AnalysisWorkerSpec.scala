package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.control.Rules

/** T7 — the background worker: a rate-source heartbeat driving analysis
  * cycles via foreachBatch, surviving cycle errors (the reference's
  * log-and-continue loop, worker.py:29-34). */
class AnalysisWorkerSpec extends SparkSpec {

  test("heartbeat loop runs cycles against wall-clock data and survives errors") {
    import spark.implicits._
    val work = Files.createTempDirectory("worker").toString
    val tier1 = s"$work/tier1"; val tier2 = s"$work/tier2"
    val rules = new Rules(spark, s"$work/rules")

    // Tier-1 rows stamped 'now': a novel burst inside the live window
    val now = System.currentTimeMillis() / 1000
    (0 until 6).map(i => ("livehash", now - 5 - i, 900L + i))
      .toDF("rhythm_hash", "ts_sec", "event_id")
      .withColumn("service", org.apache.spark.sql.functions.lit("svc"))
      .withColumn("severity", org.apache.spark.sql.functions.lit("ERROR"))
      .withColumn("body", org.apache.spark.sql.functions.lit("live burst"))
      // dt MUST come from the canonical derivation — a hand-written literal
      // would violate the DtPrune invariant and the partition gets pruned
      .withColumn("dt",
        graft.analysis.DtPrune.dtOf(org.apache.spark.sql.functions.col("ts_sec")))
      .write.mode("overwrite").partitionBy("dt").parquet(tier1)

    val q = AnalysisJob.start(spark, tier1, tier2, rules,
      intervalSec = 2, windowSec = 120)
    try {
      // wait up to ~20 s for a cycle to promote the burst
      val deadline = System.currentTimeMillis() + 20000
      var found = false
      while (!found && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        found = Files.exists(java.nio.file.Paths.get(tier2)) &&
          scala.util.Try(spark.read.parquet(tier2).count()).getOrElse(0L) > 0
      }
      assert(found, "worker promoted the live anomaly within the deadline")
      val t2 = spark.read.parquet(tier2)
      assert(t2.select("rhythm_hash").as[String].collect().contains("livehash"))
      assert(q.isActive, "loop still alive after cycles")
    } finally q.stop()
  }
}
