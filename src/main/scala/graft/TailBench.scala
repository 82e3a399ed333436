package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.api.Via

/** Same-session A/B for the `tail` verb (r12): the time-window probe
  * (`Via.tail` — dt pruning + a `ts_sec` bound that lets parquet skip
  * row groups) against the full newest-partition decode it replaced
  * (`IngestPipeline.tail` over the whole store — exactly what the
  * pre-r12 code did for any single-day store, ServeBench's shape).
  * Results are asserted identical before timings are reported, so the
  * speedup is never measured against a wrong answer.
  *
  * Usage: `sbt "runMain graft.TailBench [nEvents]"` — one JSON line.
  */
object TailBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = Files.createTempDirectory("tailbench").toString
    val via = new Via(spark, work)
    val base = 1700000000L
    // ServeBench's generator: one day of OTel events, hash-spread ts
    val raw = spark.range(n).selectExpr(
      s"""format_string(
        '{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc%d"}}]},"scopeLogs":[{"logRecords":[{"timeUnixNano":"%d000000000","severityText":"%s","body":{"stringValue":"op %d completed in %d ms for user %d"}}]}]}]}',
        pmod(hash(id), 8),
        $base + pmod(hash(id, 1), 7200),
        element_at(array('INFO','INFO','INFO','WARN','ERROR'), int(pmod(hash(id, 2), 5)) + 1),
        pmod(hash(id, 3), 25),
        pmod(hash(id, 4), 500),
        pmod(hash(id, 5), 10000)) AS value""")
    via.ingestBatch(raw)
    via.compactTier1()
    def full(k: Int, f: Option[String]) = graft.streaming.IngestPipeline
      .tail(spark.read.parquet(via.tier1Path), k, f)
    // result parity first (sets of ts_sec: tie ORDER may differ between
    // plans; the verb's contract is "the n newest", compared as values)
    for (f <- Seq(None, Some("completed"))) {
      val a = via.tail(100, f).select("ts_sec").collect()
        .map(_.getLong(0)).sorted.toSeq
      val b = full(100, f).select("ts_sec").collect()
        .map(_.getLong(0)).sorted.toSeq
      require(a == b, s"tail parity broken for filter=$f")
    }
    def p50(xs: Seq[Long]): Double = xs.sorted.apply(xs.size / 2) / 1000.0
    def measure(call: () => Unit): Double = {
      (1 to 3).foreach(_ => call())
      p50((1 to 15).map { _ =>
        val t0 = System.nanoTime(); call(); (System.nanoTime() - t0) / 1000
      })
    }
    // the agg-anchored probe (the r12 intermediate form): same window
    // scan, but the anchor comes from a Spark max-agg job instead of
    // footer stats — isolates what the footer read saves
    import org.apache.spark.sql.functions.{col, max => fmax}
    val t1 = spark.read.parquet(via.tier1Path)
    def aggProbe(f: Option[String]): Unit = {
      val maxTs = t1.agg(fmax(col("ts_sec"))).head().getLong(0)
      graft.streaming.IngestPipeline.tail(
        graft.analysis.DtPrune(t1, maxTs - 64, maxTs)
          .filter(col("ts_sec") >= maxTs - 64), 100, f).collect()
      ()
    }
    val probePlain = measure(() => via.tail(100, None).collect())
    val probeFilt = measure(() => via.tail(100, Some("completed")).collect())
    val aggPlain = measure(() => aggProbe(None))
    val aggFilt = measure(() => aggProbe(Some("completed")))
    val fullPlain = measure(() => full(100, None).collect())
    val fullFilt = measure(() => full(100, Some("completed")).collect())
    println(
      f"""{"bench":"tail","rows":$n,"probe_p50_ms":$probePlain%.1f,""" +
      f""""probe_filtered_p50_ms":$probeFilt%.1f,""" +
      f""""aggprobe_p50_ms":$aggPlain%.1f,""" +
      f""""aggprobe_filtered_p50_ms":$aggFilt%.1f,""" +
      f""""fullscan_p50_ms":$fullPlain%.1f,""" +
      f""""fullscan_filtered_p50_ms":$fullFilt%.1f}""")
    spark.stop()
  }
}
