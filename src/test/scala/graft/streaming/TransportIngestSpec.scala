package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.api.HttpIngestGateway
import graft.control.Rules

/** S1 over REAL transports (VERDICT r14 item 7): the "HTTP batch ≡
  * file-stream micro-batch" equivalence had only ever been exercised by
  * writing spool files directly. Here the same fixture flows (a) through
  * a live TCP socket into [[IngestPipeline.startSocket]] and (b) through
  * HTTP POSTs against [[HttpIngestGateway]] into the spooled
  * [[IngestPipeline.start]] — each at >100 events/s, each landing
  * exactly-once in Tier-1, each driving detection to the same verdicts
  * as the in-process E2E flow. */
class TransportIngestSpec extends SparkSpec {

  private val now = 1700000000L
  private val windowStart = now - 60

  private def otelLine(service: String, level: String, tsSec: Long, body: String): String =
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"$service"}}]},""" +
      s""""scopeLogs":[{"logRecords":[{"timeUnixNano":"${tsSec}000000000","severityText":"$level",""" +
      s""""body":{"stringValue":"$body"}}]}]}]}"""

  /** Steady template history + one novel burst in the live window —
    * enough signal for the novelty detector, and enough volume (3k
    * events) that the measured rate reflects throughput rather than the
    * one-time stream-startup seconds the elapsed window includes. */
  private def fixtureLines(): Seq[String] = {
    val steady = (0 until 3000).map(i =>
      otelLine("checkout", "INFO", now - 3660 + i,
        s"request ${1000 + i} completed in ${i % 90} ms"))
    val novel = (0 until 5).map(i =>
      otelLine("payments", "ERROR", windowStart + 10 + i,
        s"card declined for order ${700 + i}"))
    steady ++ novel
  }

  private def assertIngestedAndDetected(tier1: String, work: String,
      n: Int, elapsedSec: Double): Unit = {
    import spark.implicits._
    val t1 = spark.read.parquet(tier1)
    assert(t1.count() == n.toLong, "every event landed exactly once")
    assert(t1.select("full_log_json").as[String].collect()
      .forall(_.contains("resourceLogs")), "raw record retained")
    val rate = n / elapsedSec
    assert(rate >= 100.0, f"sustained ingest rate $rate%.0f ev/s < 100")
    // the round trip: detection over the transported store finds the burst
    val rules = new Rules(spark, s"$work/rules")
    val detected = AnalysisJob.runOnce(spark, tier1, s"$work/tier2", rules, now)
      .select("anomaly_type").as[String].collect()
    assert(detected.contains("novelty"),
      s"novelty detected through the transport: ${detected.toSeq}")
  }

  test("socket transport: TCP lines -> startSocket -> tier1 -> detection") {
    val work = Files.createTempDirectory("sockingest").toString
    val lines = fixtureLines()
    val server = new java.net.ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    @volatile var writeErr: Throwable = null
    val feeder = new Thread(() => {
      try {
        val s = server.accept()
        val w = new java.io.PrintWriter(new java.io.OutputStreamWriter(
          s.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
        lines.foreach(w.println)
        w.flush()
        // keep the connection open until the query is done reading — a
        // close mid-stream would fail the source before the last batch
        Thread.sleep(30000)
        s.close()
      } catch { case t: Throwable => writeErr = t }
    })
    feeder.setDaemon(true)
    feeder.start()
    val t0 = System.nanoTime()
    val q = IngestPipeline.startSocket(spark, "127.0.0.1",
      server.getLocalPort, s"$work/tier1", s"$work/ckpt", triggerMs = 100)
    try {
      // wait until every line has been committed (processAllAvailable
      // returns when the source has no unprocessed data AT THAT MOMENT,
      // which can be before the feeder has written everything)
      val deadline = System.nanoTime() + 60L * 1000000000L
      var done = false
      while (!done && System.nanoTime() < deadline) {
        q.processAllAvailable()
        done = scala.util.Try(
          spark.read.parquet(s"$work/tier1").count()).getOrElse(0L) >= lines.size
        if (!done) Thread.sleep(100)
      }
    } finally q.stop()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(writeErr == null, s"feeder failed: $writeErr")
    assertIngestedAndDetected(s"$work/tier1", work, lines.size, elapsed)
    server.close()
  }

  test("http transport: POST batches -> gateway spool -> start -> detection") {
    val work = Files.createTempDirectory("httpingest").toString
    val lines = fixtureLines()
    val gw = new HttpIngestGateway(s"$work/spool").start()
    val q = IngestPipeline.start(spark, s"$work/spool", s"$work/tier1",
      s"$work/ckpt", triggerMs = 100)
    val t0 = System.nanoTime()
    try {
      // the reference's wire shape: a JSON ARRAY of records per POST
      lines.grouped(101).foreach { batch =>
        val url = java.net.URI.create(
          s"http://127.0.0.1:${gw.boundPort}/api/v1/ingest/stream").toURL
        val conn = url.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.getOutputStream.write(
          batch.mkString("[", ",", "]").getBytes("UTF-8"))
        val resp = new String(conn.getInputStream.readAllBytes(), "UTF-8")
        assert(conn.getResponseCode == 200, resp)
        assert(resp.contains(s""""tier1_ingested":${batch.size}"""), resp)
        conn.disconnect()
      }
      q.processAllAvailable()
    } finally q.stop()
    val elapsed = (System.nanoTime() - t0) / 1e9
    gw.stop()
    assertIngestedAndDetected(s"$work/tier1", work, lines.size, elapsed)
  }

  test("a restarted gateway never reuses a spool name (replay-safe with the file source)") {
    val work = Files.createTempDirectory("gwrestart").toString
    def post(gw: HttpIngestGateway, body: String): Unit = {
      val conn = java.net.URI.create(
        s"http://127.0.0.1:${gw.boundPort}/api/v1/ingest/stream").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write(body.getBytes("UTF-8"))
      assert(conn.getResponseCode == 200)
      conn.disconnect()
    }
    val gw1 = new HttpIngestGateway(s"$work/spool").start()
    post(gw1, """[{"a":1}]""")
    gw1.stop()
    // restart: a fresh instance re-counting from 1 must NOT overwrite the
    // processed spool file (the stream's file source dedups by path and
    // would silently drop the new batch)
    val gw2 = new HttpIngestGateway(s"$work/spool").start()
    post(gw2, """[{"a":2}]""")
    gw2.stop()
    val files = new java.io.File(s"$work/spool").listFiles()
      .map(_.getName).filter(_.endsWith(".jsonl"))
    assert(files.length == 2, s"expected 2 distinct spool files: ${files.toSeq}")
  }

  test("gateway splits the reference's array wire shape exactly; rejects truncation") {
    val recs = Seq(
      """{"a":1,"s":"x,]}","n":{"b":[1,2]}}""",
      """{"a":2,"s":"\"quoted\""}""")
    val got = HttpIngestGateway.splitForTest(s"[${recs.mkString(",")}]")
    assert(got == Right(recs))
    assert(HttpIngestGateway.splitForTest("""[{"a":1},{"b":2""").isLeft,
      "truncated array must be rejected")
    assert(HttpIngestGateway.splitForTest("""[{"a":1}}""").isLeft,
      "mismatched closers must be rejected")
    assert(HttpIngestGateway.splitForTest("{\"a\":1}\n{\"b\":2}")
      .exists(_.size == 2), "JSONL body accepted")
    assert(HttpIngestGateway.splitForTest("").exists(_.isEmpty))
  }

  test("gateway rejects garbled arrays whole instead of part-spooling behind a 200") {
    def bad(body: String, why: String): Unit =
      assert(HttpIngestGateway.splitForTest(body).isLeft, why)
    bad("[1,2,3]", "scalar number elements are not records")
    bad("""["s"]""", "scalar string elements are not records")
    bad("""[{"a":1} junk {"b":2}]""",
      "garbage between records must be refused, not skipped")
    bad("""[{"a":1} {"b":2}]""", "missing comma between records")
    bad("""[{"a":1},,{"b":2}]""", "double comma")
    bad("""[,{"a":1}]""", "leading comma")
    bad("""[{"a":1},]""", "trailing comma")
    bad("""[{"a":1}] extra""", "trailing content after the array")
    // still-valid shapes: whitespace everywhere, nested payload untouched
    assert(HttpIngestGateway.splitForTest(
      "[ {\"a\":[1,2],\"s\":\"x y\"} ,\n {\"b\":{}} ]") ==
      Right(Seq("""{"a":[1,2],"s":"x y"}""", """{"b":{}}""")))
    assert(HttpIngestGateway.splitForTest("[]").exists(_.isEmpty))
  }

  test("concurrent POSTers: every acked record is spooled exactly once") {
    val work = Files.createTempDirectory("gwconc").toString
    val gw = new HttpIngestGateway(s"$work/spool").start()
    val nThreads = 8; val postsPerThread = 25
    val acked = new java.util.concurrent.atomic.AtomicLong(0L)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        try {
          (0 until postsPerThread).foreach { p =>
            val recs = (0 until 3).map(r => s"""{"t":$t,"p":$p,"r":$r}""")
            val conn = java.net.URI.create(
              s"http://127.0.0.1:${gw.boundPort}/api/v1/ingest/stream").toURL
              .openConnection().asInstanceOf[java.net.HttpURLConnection]
            conn.setRequestMethod("POST"); conn.setDoOutput(true)
            conn.getOutputStream.write(
              recs.mkString("[", ",", "]").getBytes("UTF-8"))
            if (conn.getResponseCode == 200) acked.addAndGet(recs.size.toLong)
            else failures.add(s"code ${conn.getResponseCode}")
            conn.disconnect()
          }
        } catch { case e: Throwable => failures.add(e.toString) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    gw.stop()
    assert(failures.isEmpty, s"posts failed: $failures")
    val spooled = new java.io.File(s"$work/spool").listFiles()
      .filter(_.getName.endsWith(".jsonl"))
    import scala.jdk.CollectionConverters._
    val lines = spooled.iterator.flatMap(f =>
      java.nio.file.Files.readAllLines(f.toPath).asScala).toSeq
    assert(acked.get() == (nThreads * postsPerThread * 3).toLong)
    assert(lines.size.toLong == acked.get(),
      s"spooled ${lines.size} != acked ${acked.get()}")
    assert(lines.distinct.size == lines.size, "no record spooled twice")
    assert(spooled.length == nThreads * postsPerThread,
      "one spool file per POST")
  }

  test("spool backlog past the cap draws 429, not silent unbounded growth") {
    val work = Files.createTempDirectory("gwbackp").toString
    val gw = new HttpIngestGateway(s"$work/spool", maxBacklogFiles = 3).start()
    def post(): Int = {
      val conn = java.net.URI.create(
        s"http://127.0.0.1:${gw.boundPort}/api/v1/ingest/stream").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write("""[{"a":1}]""".getBytes("UTF-8"))
      val code = conn.getResponseCode
      conn.disconnect(); code
    }
    assert((1 to 3).map(_ => post()).forall(_ == 200))
    assert(post() == 429, "4th spool file exceeds the cap")
    // draining the spool (the consumer's job) reopens the gate
    new java.io.File(s"$work/spool").listFiles()
      .filter(_.getName.endsWith(".jsonl")).take(2).foreach(_.delete())
    assert(post() == 200, "gateway recovers once the backlog drains")
    gw.stop()
  }
}
