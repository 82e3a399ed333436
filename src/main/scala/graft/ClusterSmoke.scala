package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Two-executor cluster smoke (VERDICT r14 item 6): everything to date
  * ran `local[n]` — one JVM, where executor-side code shares the
  * driver's filesystem view, classloader, and memory, and local-mode
  * assumptions (the r14 writer-claim race was exactly one: LocalFileSystem
  * O_EXCL semantics) can hide. This main runs the representative
  * surface on `local-cluster[2,8,4096]` — two SEPARATE worker JVMs with
  * their own executors — and fails loudly on any divergence:
  *
  *  - a proof the work really spans ≥2 executor processes (distinct
  *    executor JVM names over a 32-partition job);
  *  - the persisted-index families built AND probed distributed, with
  *    the indexed/inline twin queries compared row-for-row
  *    (`ann_rerank_indexed`/`ann_rerank`, `text_match_indexed`/
  *    `text_match`) and the remaining families run to non-empty results
  *    (`ann_ivf`, `ann_graph`, `dedup_incremental`);
  *  - AnnIndex streaming maintenance (appendBatch → probe → fold →
  *    probe): fold must not change probe results;
  *  - the multi-writer claim protocol: a second writer identity is
  *    refused before mutating the store (MultiWriterSpec's scenario,
  *    now with executors on separate JVMs);
  *  - live TCP socket ingest: the socket SOURCE runs on an executor
  *    JVM, so the wire, the parse/derive pipeline, and the ledgered
  *    sink all cross process boundaries;
  *  - PromotionStream checkpoint recovery: stop between micro-batches,
  *    restart, end state equals the batch reference (exactly-once).
  *
  * Usage: `tools/cluster_smoke.sh [sfDir]` (sets SPARK_HOME and keeps
  * worker dirs inside the repo); one JSON line per leg, exit 1 if any
  * leg fails. ClusterSmokeSpec runs it under `sbt test`.
  */
object ClusterSmoke {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,8,4096]")
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-cluster-smoke")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // workers launch executors from SPARK_HOME's jars; the engine's own
      // classes must be shipped explicitly (there is no app jar here)
      .config("spark.executor.extraClassPath", classes)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    var failed = 0
    def leg(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try {
        f
        println(f"""{"leg":"$name","pass":1,"sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"""{"leg":"$name","pass":0,"err":${Bench.jsonEscape(
            String.valueOf(e.getMessage).take(300))}}""")
      }
    }

    leg("two_executors") {
      val jvms = spark.sparkContext.range(0, 64, 1, numSlices = 32)
        .map(_ => java.lang.management.ManagementFactory.getRuntimeMXBean.getName)
        .distinct().collect().sorted
      require(jvms.length >= 2, s"expected >=2 executor JVMs, got ${jvms.toSeq}")
    }

    // indexed/inline twins: build + probe distributed, rows identical
    Seq("ann_rerank_indexed" -> "ann_rerank",
        "text_match_indexed" -> "text_match").foreach { case (idx, inline) =>
      leg(s"twin_$idx") {
        val a = SparkEntry.queries(idx)(spark, sfDir)
          .collect().map(_.toString).sorted.toSeq
        val b = SparkEntry.queries(inline)(spark, sfDir)
          .collect().map(_.toString).sorted.toSeq
        require(a.nonEmpty, s"$idx returned nothing")
        require(a == b, s"$idx diverged from $inline on the cluster")
      }
    }

    // remaining index families + the JSON-kernel group-by: distributed
    // execution completes with sane row counts (values are oracle-gated
    // in Verify; the cluster question is execution, not arithmetic)
    Seq("ann_ivf", "ann_graph", "dedup_incremental", "grouped_search")
      .foreach { name =>
        leg(name) {
          require(SparkEntry.queries(name)(spark, sfDir).collect().nonEmpty,
            s"$name returned nothing")
        }
      }

    leg("ann_fold_maintenance") {
      val path = java.nio.file.Files.createTempDirectory("csmoke-ann").toString
      val emb = Tables.embeddings(spark, sfDir)
      search.AnnIndex.build(emb, path)
      (0 until 3).foreach { b =>
        val shard = spark.range(1000000L + b * 100, 1000000L + (b + 1) * 100)
          .select($"id".as("vec_id"),
            org.apache.spark.sql.functions.expr(
              "transform(sequence(0, 63), i -> cast((pmod(hash(id * 64 + i), 2001) - 1000) / 1000.0 as float))")
              .as("embedding"),
            org.apache.spark.sql.functions.pmod(
              org.apache.spark.sql.functions.hash($"id"),
              org.apache.spark.sql.functions.lit(100)).cast("int").as("label"))
        search.AnnIndex.appendBatch(shard, path, b.toLong)
      }
      val before = search.AnnIndex.probe(spark, path)
        .collect().map(_.toString).sorted.toSeq
      search.AnnIndex.fold(spark, path)
      val after = search.AnnIndex.probe(spark, path)
        .collect().map(_.toString).sorted.toSeq
      require(before.nonEmpty && before == after,
        "fold changed probe results on the cluster")
    }

    leg("multi_writer_refusal") {
      val tier1 = java.nio.file.Files.createTempDirectory("csmoke-mw").toString + "/t1"
      def batch(rows: Seq[(Long, String)]) = rows.toDF("ts_sec", "body")
        .withColumn("dt", analysis.DtPrune.dtOf(col("ts_sec")))
      streaming.IngestPipeline.appendBatchIdempotent(
        batch(Seq(1700000000L -> "a0")), tier1, 0, writerId = Some("ingest:/ckpt/A"))
      val refused =
        try {
          streaming.IngestPipeline.appendBatchIdempotent(
            batch(Seq(1700000001L -> "b0")), tier1, 0,
            writerId = Some("ingest:/ckpt/B"))
          false
        } catch {
          case _: streaming.IngestPipeline.ConcurrentWriterException => true
        }
      require(refused, "second writer identity was NOT refused")
      require(spark.read.parquet(tier1).count() == 1L,
        "refusal mutated the store")
    }

    leg("socket_ingest") {
      // live TCP ingest with the source running on a separate executor
      // JVM: the wire, the parse/derive pipeline, and the ledgered sink
      // all cross process boundaries here
      val work = java.nio.file.Files.createTempDirectory("csmoke-sock").toString
      val lines = (0 until 300).map(i =>
        s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc"}}]},""" +
          s""""scopeLogs":[{"logRecords":[{"timeUnixNano":"${1700000000L + i}000000000","severityText":"INFO",""" +
          s""""body":{"stringValue":"request $i done"}}]}]}]}""")
      val server = new java.net.ServerSocket(0, 8,
        java.net.InetAddress.getByName("127.0.0.1"))
      val feeder = new Thread(() => {
        try {
          val s = server.accept()
          val w = new java.io.PrintWriter(s.getOutputStream)
          lines.foreach(w.println)
          w.flush()
          Thread.sleep(60000)
          s.close()
        } catch { case _: Throwable => () }
      })
      feeder.setDaemon(true)
      feeder.start()
      val q = streaming.IngestPipeline.startSocket(spark, "127.0.0.1",
        server.getLocalPort, s"$work/tier1", s"$work/ckpt", triggerMs = 100)
      try {
        val deadline = System.nanoTime() + 120L * 1000000000L
        var n = 0L
        while (n < lines.size && System.nanoTime() < deadline) {
          q.processAllAvailable()
          n = scala.util.Try(
            spark.read.parquet(s"$work/tier1").count()).getOrElse(0L)
          if (n < lines.size) Thread.sleep(200)
        }
        require(n == lines.size.toLong,
          s"socket ingest landed $n of ${lines.size} rows on the cluster")
      } finally { q.stop(); server.close() }
    }

    leg("promotion_recovery") {
      val tmp = java.nio.file.Files.createTempDirectory("csmoke-promo").toString
      val base = 1700000000L
      val th = streaming.StatefulDetector.Thresholds(
        noveltyMinCount = 2, freqMinCount = 2, freqSigma = 1.0, stdFloor = 0.5)
      def writeT1(rows: Seq[(String, Long)]): Unit =
        rows.zipWithIndex.map { case ((h, ts), i) =>
          (h, ts, "auth", "INFO", s"evt $i at $ts")
        }.toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
          .write.mode("append").parquet(s"$tmp/tier1")
      writeT1(Seq.tabulate(3)(i => ("h1", base + i)))
      writeT1(Seq(("close1", base + 75)))
      val q1 = streaming.PromotionStream.start(spark, s"$tmp/tier1",
        s"$tmp/tier2", s"$tmp/ckpt", rules = None, windowSec = 60,
        watermarkDelay = "10 seconds", thresholds = th,
        triggerMs = 100, stateTtlMs = None)
      try q1.processAllAvailable() finally q1.stop()
      writeT1(Seq.tabulate(8)(i => ("h1", base + 120 + i)))
      writeT1(Seq(("close2", base + 4000)))
      val q2 = streaming.PromotionStream.start(spark, s"$tmp/tier1",
        s"$tmp/tier2", s"$tmp/ckpt", rules = None, windowSec = 60,
        watermarkDelay = "10 seconds", thresholds = th,
        triggerMs = 100, stateTtlMs = None)
      try q2.processAllAvailable() finally q2.stop()
      val allEvents = spark.read.parquet(s"$tmp/tier1")
        .select("rhythm_hash", "ts_sec")
      val ref = streaming.StatefulDetector.detect(allEvents, 60, thresholds = th).toDF()
      streaming.PromotionStream.promoteBatch(spark, ref,
        s"$tmp/tier1", s"$tmp/t2_ref", None, 60)
      def rows(p: String) = spark.read.parquet(p)
        .select("rhythm_hash", "anomaly_type", "count")
        .collect().map(_.toString).sorted.toSeq
      val got = rows(s"$tmp/tier2")
      val want = rows(s"$tmp/t2_ref")
      require(want.nonEmpty && got == want,
        s"recovery diverged on the cluster: got=$got want=$want")
    }

    spark.stop()
    if (failed > 0) {
      System.err.println(s"[cluster-smoke] $failed leg(s) FAILED")
      sys.exit(1)
    }
    println("""{"cluster_smoke":"ok"}""")
  }
}
