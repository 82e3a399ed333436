package graft

import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession

import graft.api.Via

/** End-to-end streaming FRESHNESS under load (VERDICT r12 item 1) — the
  * reference's core implicit claim: the forensic index is queryable AS
  * anomalies happen (`/root/reference/app/worker.py:13-36`, a 60 s
  * cadence from ingest to queryable Tier-2). Every mechanism exists
  * (exactly-once promotion, per-batch graph appends, drift re-sync);
  * this bench measures the CLAIM while everything races everything:
  *
  *  - a generator thread writes OTel JSONL at a target rate (default
  *    100k events/s) with a uniquely-tokened NOVEL BURST every few
  *    seconds;
  *  - the live ingest stream (files → Tier-1 parquet) and the
  *    fully-streaming promotion pipeline (Tier-1 stream → watermarked
  *    keyed-state detection → Tier-2 + graph-index append) both run;
  *  - a maintenance thread fires `Via.maintainIndexes` periodically
  *    (tier1/tier2 compaction, graph fold/drift-sync) — the rebuild
  *    racing the serving path;
  *  - serving threads hammer the graph-served `clusters` verb
  *    throughout, latencies tagged by whether maintenance was in
  *    flight.
  *
  * Per burst it reports file-landed → Tier-2-visible and → graph-
  * candidate-visible wall latency. The structural floor is windowSec +
  * watermark + trigger cadence (the detector can only promote CLOSED
  * windows — same as the reference's 60 s cycle); the bench uses a
  * compressed 10 s window so a run fits in ~2 min, and the mechanism
  * overhead ON TOP of the floor is the number that transfers to the
  * 60 s production window.
  *
  * Usage: `sbt "runMain graft.FreshBench [eventsPerSec] [durationSec]"`
  * — one JSON line per burst + summaries, also appended to
  * `target/freshbench/results.jsonl`.
  */
object FreshBench {

  private val BurstEverySec = 8
  private val PollMs = 250L

  def main(args: Array[String]): Unit = {
    val rate = args.headOption.map(_.toInt).getOrElse(100000)
    val durationSec = if (args.length > 1) args(1).toInt else 100
    // detection window: 10 s compresses a run into ~2 min; 60 s measures
    // the reference's production cadence directly (run length must cover
    // duration + window + watermark + a polling margin)
    val WindowSec = if (args.length > 2) args(2).toLong else 10L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = Paths.get("target/freshbench")
    Files.createDirectories(outDir)
    val resultsPath = outDir.resolve("results.jsonl")
    def emit(line: String): Unit = {
      println(s"[freshbench] $line")
      Files.writeString(resultsPath, line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

    val work = Files.createTempDirectory("freshbench").toString
    println(s"[freshbench] work dir: $work")
    val inDir = s"$work/in"; Files.createDirectories(Paths.get(inDir))
    val tmpDir = s"$work/gen"; Files.createDirectories(Paths.get(tmpDir))
    val via = new Via(spark, work, graphServeThreshold = 1L)

    // ---- seed: a populated Tier-2 + built graph (the steady-state a
    // production deployment serves from; streaming appends land on top)
    import org.apache.spark.sql.functions.col
    graft.GraftFunctions.register(spark)
    spark.range(50000).selectExpr(
        "concat('seed', id) as rhythm_hash",
        "'novelty' as anomaly_type",
        "concat('count=', 2 + id % 7) as anomaly_context",
        "concat('svc', id % 8) as service",
        "'INFO' as severity",
        "concat('seed op ', id % 300, ' state ', id % 11, ' for user ', id) as body",
        "cast(2 + id % 7 as bigint) as count",
        "1700000000 + id as start_ts",
        "1700000005 + id as end_ts")
      .withColumn("dense", graft.GraftFunctions.embedText(col("body")))
      .withColumn("dt", graft.analysis.DtPrune.dtOf(col("start_ts")))
      .write.mode("overwrite").partitionBy("dt").parquet(via.tier2Path)
    via.buildGraphIndex(numParts = 8)
    via.pinServing()

    // ---- streams
    val ingestQ = graft.streaming.IngestPipeline.start(spark, inDir,
      via.tier1Path, s"$work/ckpt-ingest", triggerMs = 500,
      maxFilesPerTrigger = 32)
    // tier1 must exist (with schema) before the promotion stream starts:
    // land one tiny batch synchronously
    import spark.implicits._
    via.ingestBatch(Seq(otel(System.currentTimeMillis() / 1000,
      "svc0", "INFO", "bootstrap row")).toDF("value"))
    val promoQ = graft.streaming.PromotionStream.start(spark, via.tier1Path,
      via.tier2Path, s"$work/ckpt-promo", rules = Some(via.rules),
      windowSec = WindowSec, watermarkDelay = "2 seconds",
      thresholds = graft.streaming.StatefulDetector.Thresholds(
        noveltyMinCount = 2, freqMinCount = 999999, freqSigma = 99.0,
        stdFloor = 99.0),
      triggerMs = 500, stateTtlMs = None,
      graphIndexPath = Some(via.graphIndexPath))

    // ---- load + measurement
    val stop = new AtomicBoolean(false)
    val generated = new AtomicLong(0)
    final case class Burst(id: Int, token: String, body: String,
        landedAtMs: Long)
    val bursts = new java.util.concurrent.ConcurrentLinkedQueue[Burst]()
    val genStart = System.nanoTime()

    val genThread = new Thread(() => {
      var fileNo = 0
      var burstNo = 0
      val sb = new java.lang.StringBuilder(rate * 230 + (1 << 16))
      while (!stop.get()) {
        val secStart = System.nanoTime()
        val ts = System.currentTimeMillis() / 1000
        sb.setLength(0)
        var i = 0
        while (i < rate) {
          sb.append(otel(ts, s"svc${i % 8}", "INFO",
            s"op ${i % 200} completed in ${i % 500} ms for user ${i % 10000}"))
          sb.append('\n')
          i += 1
        }
        val burst = if (fileNo % BurstEverySec == 1) {
          burstNo += 1
          // token must be DIGIT-FREE: the template kernel masks number
          // runs, so numeric suffixes would collapse every burst into
          // one rhythm hash and only the first would ever be novel
          val token = "burst" + burstNo.toString.map(c => ('a' + (c - '0')).toChar)
          val body = s"novel failure $token in subsystem q"
          (0 until 6).foreach(_ => { sb.append(otel(ts, "svcB", "ERROR", body)); sb.append('\n') })
          Some((token, body))
        } else None
        val tmp = Paths.get(tmpDir, s"gen-$fileNo.jsonl")
        Files.writeString(tmp, sb.toString)
        Files.move(tmp, Paths.get(inDir, s"gen-$fileNo.jsonl"),
          StandardCopyOption.ATOMIC_MOVE)
        generated.addAndGet(rate.toLong)
        burst.foreach { case (token, body) =>
          bursts.add(Burst(burstNo, token, body, System.currentTimeMillis()))
        }
        fileNo += 1
        // pace to 1 file/second; fall behind honestly if generation is
        // slower than the target rate
        val elapsed = (System.nanoTime() - secStart) / 1000000
        if (elapsed < 1000) Thread.sleep(1000 - elapsed)
      }
    }, "freshbench-gen")
    genThread.setDaemon(true)

    // maintenance racing the streams (rebuilds, folds, compactions)
    val maintInFlight = new AtomicBoolean(false)
    val maintLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val maintThread = new Thread(() => {
      while (!stop.get()) {
        Thread.sleep(25000)
        if (!stop.get()) {
          maintInFlight.set(true)
          val t0 = System.nanoTime()
          try {
            val acts = via.maintainIndexes()
            val ms = (System.nanoTime() - t0) / 1000000
            maintLog.add(acts.filter(_.action != "none")
              .map(a => s"${a.target}:${a.action}").mkString(",") +
              s" (${ms}ms)")
          } catch { case e: Exception => maintLog.add(s"FAILED: ${e.getMessage}") }
          finally maintInFlight.set(false)
        }
      }
    }, "freshbench-maint")
    maintThread.setDaemon(true)

    // serving callers: graph-served clusters throughout the run
    final case class Call(micros: Long, duringMaint: Boolean)
    val calls = new java.util.concurrent.ConcurrentLinkedQueue[Call]()
    val serveThreads = (0 until 2).map { t =>
      val th = new Thread(() => {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"serve-$t")
        while (!stop.get()) {
          val m = maintInFlight.get()
          val t0 = System.nanoTime()
          try {
            via.clusters(System.currentTimeMillis() / 1000,
              textFilter = Some("seed op state")).collect()
            calls.add(Call((System.nanoTime() - t0) / 1000, m))
          } catch { case e: Exception =>
            emit(s"""{"leg":"serve_error","err":"${e.getClass.getSimpleName}"}""")
            Thread.sleep(500)
          }
        }
      }, s"freshbench-serve-$t")
      th.setDaemon(true); th
    }

    // freshness poller: first-visibility times per burst
    final case class Obs(id: Int, tier2Ms: Long, graphMs: Long,
        landedAtMs: Long)
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Obs]()
    val pollThread = new Thread(() => {
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", "poller")
      val pending = scala.collection.mutable.Map.empty[Int, (Burst, Option[Long], Option[Long])]
      var drained = false
      while (!drained && (!stop.get() || !pending.isEmpty || !bursts.isEmpty)) {
        var b = bursts.poll()
        while (b != null) { pending(b.id) = (b, None, None); b = bursts.poll() }
        val nowMs = System.currentTimeMillis()
        pending.toSeq.sortBy(_._1).foreach { case (id, (burst, t2, g)) =>
          val t2v = t2.orElse {
            // explicit-file read: with the serving pin held, a plain
            // root read would be CacheManager-substituted with the
            // SNAPSHOT and never see ledger-appended promotions (the
            // r13 liveTier2Read finding — this bench found it)
            val vis =
              try {
                val root = new java.io.File(via.tier2Path)
                val files = Option(root.listFiles()).getOrElse(Array.empty)
                  .filter(d => d.isDirectory && d.getName.startsWith("dt="))
                  .flatMap(d => d.listFiles().filter(f =>
                    f.isFile && !f.getName.startsWith(".") &&
                      !f.getName.startsWith("_")))
                  .map(_.toString)
                files.nonEmpty && spark.read
                  .option("basePath", via.tier2Path).parquet(files: _*)
                  .filter(col("body").contains(burst.token)).limit(1)
                  .count() > 0
              } catch { case _: Exception => false }
            if (vis) Some(nowMs - burst.landedAtMs) else None
          }
          val gv = g.orElse {
            val qv = graft.functions.EmbedText.embedString(burst.body)
              .map(_.toDouble).toSeq
            val vis =
              try graft.search.GraphIndex
                .servingHits(spark, via.graphIndexPath, qv, 32)
                .exists(h => h.payload != null && h.payload.contains(burst.token))
              catch { case _: Exception => false }
            if (vis) Some(nowMs - burst.landedAtMs) else None
          }
          if (t2v.isDefined && gv.isDefined) {
            observed.add(Obs(id, t2v.get, gv.get, burst.landedAtMs))
            pending.remove(id)
          } else if (nowMs - burst.landedAtMs > WindowSec * 3000 + 60000) {
            observed.add(Obs(id, t2v.getOrElse(-1L), gv.getOrElse(-1L),
              burst.landedAtMs))
            pending.remove(id)
          } else pending(id) = (burst, t2v, gv)
        }
        // no `return`: a non-local return from a Thread lambda throws
        // NonLocalReturnControl across threads and dies uncaught
        if (stop.get() && pending.isEmpty) drained = true
        else Thread.sleep(PollMs)
      }
    }, "freshbench-poll")
    pollThread.setDaemon(true)

    genThread.start(); maintThread.start(); pollThread.start()
    serveThreads.foreach(_.start())
    Thread.sleep(durationSec * 1000L)
    stop.set(true)
    genThread.join(5000)
    val genWallSec = (System.nanoTime() - genStart) / 1e9
    // let in-flight windows close and the poller drain (watermark needs
    // newer data: feed trailing heartbeat files past window + watermark)
    (0 until (2 * WindowSec + 10).toInt).foreach { i =>
      val ts = System.currentTimeMillis() / 1000
      val tmp = Paths.get(tmpDir, s"tail-$i.jsonl")
      Files.writeString(tmp,
        (0 until 100).map(j => otel(ts, s"svc${j % 8}", "INFO",
          s"op ${j % 200} completed in 1 ms for user $j")).mkString("\n"))
      Files.move(tmp, Paths.get(inDir, s"tail-$i.jsonl"),
        StandardCopyOption.ATOMIC_MOVE)
      Thread.sleep(1000)
    }
    pollThread.join(WindowSec * 3000 + 90000)
    ingestQ.stop(); promoQ.stop()

    // ---- report
    import scala.jdk.CollectionConverters._
    val obs = observed.asScala.toSeq.sortBy(_.id)
    // structural floor per burst (VERDICT r13 item 5): a tumbling-window
    // detector can only promote a CLOSED window, so a burst landing at
    // phase phi inside its window cannot be Tier-2-visible before
    // (WindowSec - phi) + watermark — measured latency above that floor
    // is the MECHANISM overhead (trigger cadence, detect, rollup, write,
    // poll quantization). Uniform burst phases put the p95 of the floor
    // itself at ~0.95*WindowSec + watermark: the floor, not the
    // machinery, owns the tail.
    def floorMs(landedAtMs: Long): Long = {
      val sec = landedAtMs / 1000.0
      val close = math.ceil(sec / WindowSec) * WindowSec
      ((close - sec) * 1000).toLong + 2000 // + watermarkDelay (2 s)
    }
    obs.foreach { o =>
      val fl = floorMs(o.landedAtMs)
      emit(s"""{"leg":"freshness","burst":${o.id},"tier2_ms":${o.tier2Ms},""" +
        s""""graph_ms":${o.graphMs},"floor_ms":$fl,""" +
        s""""overhead_ms":${if (o.tier2Ms >= 0) o.tier2Ms - fl else -1}}""")
    }
    def pct(xs: Seq[Long], p: Double): Long =
      if (xs.isEmpty) -1 else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))
    val t2ok = obs.map(_.tier2Ms).filter(_ >= 0)
    val gok = obs.map(_.graphMs).filter(_ >= 0)
    val t1Rows = try spark.read.parquet(via.tier1Path).count()
                 catch { case _: Exception => 0L }
    emit(f"""{"leg":"freshness_summary","bursts":${obs.size},""" +
      f""""timed_out":${obs.count(o => o.tier2Ms < 0 || o.graphMs < 0)},""" +
      f""""tier2_p50_ms":${pct(t2ok, 0.5)},"tier2_p95_ms":${pct(t2ok, 0.95)},""" +
      f""""graph_p50_ms":${pct(gok, 0.5)},"graph_p95_ms":${pct(gok, 0.95)},""" +
      f""""floor_p50_ms":${pct(obs.map(o => floorMs(o.landedAtMs)), 0.5)},""" +
      f""""floor_p95_ms":${pct(obs.map(o => floorMs(o.landedAtMs)), 0.95)},""" +
      f""""overhead_p50_ms":${pct(obs.filter(_.tier2Ms >= 0).map(o => o.tier2Ms - floorMs(o.landedAtMs)), 0.5)},""" +
      f""""overhead_p95_ms":${pct(obs.filter(_.tier2Ms >= 0).map(o => o.tier2Ms - floorMs(o.landedAtMs)), 0.95)},""" +
      f""""window_sec":$WindowSec,"target_rate":$rate,""" +
      f""""generated_rows":${generated.get()},"ingested_rows":$t1Rows,""" +
      f""""achieved_gen_rate":${(generated.get() / genWallSec).toLong},""" +
      f""""ingested_rate":${(t1Rows / genWallSec).toLong}}""")
    val cs = calls.asScala.toSeq
    Seq(false, true).foreach { m =>
      val xs = cs.filter(_.duringMaint == m).map(_.micros)
      emit(f"""{"leg":"serve_during_ingest","maintenance_inflight":$m,""" +
        f""""calls":${xs.size},"p50_ms":${pct(xs, 0.5) / 1000.0}%.1f,""" +
        f""""p95_ms":${pct(xs, 0.95) / 1000.0}%.1f}""")
    }
    maintLog.asScala.foreach(m => emit(s"""{"leg":"maintenance","acts":"$m"}"""))
    if (sys.env.get("SPARK_GRAFT_FRESH_DEBUG").contains("1")) {
      val t2 = spark.read.parquet(via.tier2Path)
      emit(s"""{"leg":"debug","tier2_rows":${t2.count()},""" +
        s""""tier2_burst_rows":${t2.filter(col("body").contains("burst")).count()},""" +
        s""""cols":"${t2.columns.mkString(",")}"}""")
      t2.filter(col("body").contains("burst")).select("rhythm_hash", "body")
        .limit(5).collect().foreach(r => emit(s"""{"leg":"debug_row","body":"${r.getString(1)}"}"""))
      val bodies = t2.filter(!col("rhythm_hash").startsWith("seed"))
        .select("body").limit(8).collect()
      bodies.foreach(r => emit(s"""{"leg":"debug_any","body":"${r.getString(0).take(80)}"}"""))
    }
    spark.stop()
  }

  private def otel(ts: Long, service: String, severity: String,
      body: String): String =
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"$service"}}]},""" +
      s""""scopeLogs":[{"logRecords":[{"timeUnixNano":"${ts}000000000","severityText":"$severity",""" +
      s""""body":{"stringValue":"$body"}}]}]}]}"""
}
