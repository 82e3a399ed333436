package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analysis.RhythmAnalyzer
import graft.streaming.AnalysisJob

/** Same-session A/B for the zone-map-anchored analysis window (VERDICT
  * r12 item 7): one compacted day of Tier-1 whose files are
  * time-clustered (the natural layout of append-ordered ingest), a 60 s
  * window at the day's end, and the detect cycle measured over
  * [[AnalysisJob.anchoredTier1]] vs the full dt-pruned
  * [[AnalysisJob.tier1Window]]. Outputs are asserted identical before
  * timing — the speedup is never measured against a wrong answer.
  *
  * Usage: `sbt "runMain graft.AnchorBench [nEvents] [nFiles]"` — one
  * JSON line.
  */
object AnchorBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nFiles = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("anchorbench").toString
    val tier1 = s"$work/tier1"
    val base = 1700000000L
    val daySec = 86000L // one dt partition
    // a day of pre-derived Tier-1 rows (generation cost, not ingest, is
    // not what this bench measures), written time-clustered: range
    // partitioning on ts gives each file a tight footer range — the
    // layout micro-batch appends produce naturally
    spark.range(n).selectExpr(
        "concat('svc', pmod(hash(id), 8)) as service",
        "element_at(array('INFO','INFO','INFO','WARN','ERROR'), int(pmod(hash(id, 2), 5)) + 1) as severity",
        s"cast($base + (id * $daySec) / $n as bigint) as ts_sec",
        "concat('op ', pmod(hash(id, 3), 25), ' completed in ', pmod(hash(id, 4), 500), ' ms for user ', pmod(hash(id, 5), 10000)) as body",
        "id as event_id")
      .withColumn("template", graft.functions.TextFunctions.template(col("body")))
      .withColumn("rhythm_hash", graft.functions.TextFunctions.rhythmHash(
        col("template"), col("service"), col("severity")))
      .withColumn("dt", graft.analysis.DtPrune.dtOf(col("ts_sec")))
      .repartitionByRange(nFiles, col("ts_sec"))
      .write.mode("overwrite").partitionBy("dt").parquet(tier1)
    val nowSec = base + daySec
    val windowStart = nowSec - 60
    val lookback = RhythmAnalyzer.DefaultBaselineLookbackSec

    def detectOver(rel: org.apache.spark.sql.DataFrame): Array[String] =
      RhythmAnalyzer.detect(rel, windowStart, 60.0,
        tieBreakCol = Some("event_id")).collect().map(_.toString)

    def anchored() = AnalysisJob.anchoredTier1(spark, tier1, windowStart,
      nowSec, lookback)
    def fullWin() = AnalysisJob.tier1Window(spark, tier1,
      windowStart - lookback, nowSec)

    // parity first
    val a = detectOver(anchored()).sorted.toSeq
    val b = detectOver(fullWin()).sorted.toSeq
    require(a == b, s"anchored detect diverged: ${a.size} vs ${b.size} rows")
    val anchoredFiles = anchored().inputFiles.length
    val totalFiles = fullWin().inputFiles.length

    def p50(xs: Seq[Long]): Double = xs.sorted.apply(xs.size / 2) / 1000.0
    def measure(call: () => Unit): Double = {
      (1 to 2).foreach(_ => call())
      p50((1 to 9).map { _ =>
        val t0 = System.nanoTime(); call(); (System.nanoTime() - t0) / 1000
      })
    }
    // each rep pays the FULL per-trigger cost: relation construction
    // (listing + schema), then detect — what a 60 s trigger actually does
    val anchoredMs = measure(() => { detectOver(anchored()); () })
    val fullMs = measure(() => { detectOver(fullWin()); () })
    // the probe alone (listing + memoized footer stats + driver-side
    // schema — zero Spark jobs)
    val anchorOnlyMs = measure(() => { anchored(); () })
    // per-trigger WORK, the 100 TB metric local wall-clock can't show
    // (fewer scan files also means fewer tasks, so on an idle local[32]
    // the decode win is parallelism-compensated — SCALE.md)
    def bytesOf(files: Seq[String]): Long = files.map(f =>
      java.nio.file.Files.size(java.nio.file.Paths.get(
        f.stripPrefix("file:")))).sum
    val keptBytes = bytesOf(anchored().inputFiles.toSeq)
    val totalBytes = bytesOf(fullWin().inputFiles.toSeq)
    println(
      f"""{"bench":"anchor","rows":$n,"files_total":$totalFiles,""" +
      f""""files_anchored":$anchoredFiles,""" +
      f""""bytes_total":$totalBytes,"bytes_anchored":$keptBytes,""" +
      f""""anchored_p50_ms":$anchoredMs%.1f,"full_p50_ms":$fullMs%.1f,""" +
      f""""anchor_probe_ms":$anchorOnlyMs%.1f}""")
    spark.stop()
  }
}
