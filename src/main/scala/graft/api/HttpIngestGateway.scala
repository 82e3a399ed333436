package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Minimal live-HTTP ingest gateway — the engine-side analogue of the
  * reference's `POST /api/v1/ingest/stream` endpoint
  * (`/root/reference/app/api/v1/endpoints/ingest.py:10-16`, body = a
  * JSON array of log records, response `{"status":"ok",
  * "tier1_ingested":N}`): each received batch becomes ONE spool file,
  * which a running [[graft.streaming.IngestPipeline.start]] consumes as
  * one micro-batch — the S1 "HTTP batch ≡ file-stream micro-batch"
  * equivalence exercised over a real transport (TransportIngestSpec
  * drives POST → ingest → detection end-to-end at >100 events/s).
  *
  * The body may be a JSON array of records (the reference's wire shape,
  * split on top-level commas with a depth/string-aware scanner) or
  * plain JSONL. Files land atomically (temp write + rename) so the
  * stream never reads a half-written spool file. Deliberately JDK-only
  * (`com.sun.net.httpserver`): the contract under test is
  * transport → micro-batch, not an HTTP framework; a production front
  * door would terminate HTTP in any LB/framework and write the same
  * spool files (or feed [[graft.streaming.IngestPipeline.startSocket]]).
  *
  * Concurrency + backpressure: handlers run on a small fixed pool (the
  * JDK server's default executor would serialize every request through
  * the dispatcher thread), and a request that would push the spool
  * directory past `maxBacklogFiles` is refused with 429 — unbounded
  * spooling would hide a stalled/missing consumer behind 200s until the
  * disk filled. The backlog measure is the spool-dir file count, so a
  * production pairing must remove consumed files (the file source's
  * `cleanSource=delete|archive` option, or a retention janitor keyed on
  * the ingest checkpoint); without one, a full spool reads as permanent
  * backpressure — by design, loud rather than lossy.
  */
final class HttpIngestGateway(spoolDir: String, port: Int = 0,
    maxBacklogFiles: Int = 10000, handlerThreads: Int = 8) {

  private val seq = new AtomicLong(0L)
  // spool names must be unique ACROSS gateway restarts: Spark's file
  // source dedups by path, so a restarted gateway re-counting from 1
  // would overwrite already-processed spool files and the stream —
  // which never re-reads a committed path — would silently drop the
  // batch while the client got a 200
  private val boot = java.lang.Long.toUnsignedString(
    java.util.concurrent.ThreadLocalRandom.current().nextLong(), 36)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(
    handlerThreads,
    (r: Runnable) => {
      val t = new Thread(r, "ingest-gateway"); t.setDaemon(true); t
    })
  server.setExecutor(pool)
  Files.createDirectories(Paths.get(spoolDir))

  /** Spool-dir file count (committed spools only — dot-prefixed temp
    * files in flight from concurrent handlers don't count against the
    * cap; they become visible exactly when their rename commits). */
  private def backlog(): Long = {
    val s = Files.list(Paths.get(spoolDir))
    try s.filter(p => !p.getFileName.toString.startsWith(".")).count()
    finally s.close()
  }

  server.createContext("/api/v1/ingest/stream", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        if (ex.getRequestMethod != "POST") { respond(ex, 405, """{"error":"POST only"}""") }
        else {
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          HttpIngestGateway.splitRecords(body) match {
            case Left(err) => respond(ex, 400, s"""{"error":"$err"}""")
            case Right(records) =>
              if (records.isEmpty)
                respond(ex, 200, """{"status":"ok","tier1_ingested":0}""")
              // check-then-write races can overshoot by at most
              // handlerThreads-1 files — an advisory high-water mark, not
              // an exact quota; the point is refusing unbounded growth
              else if (backlog() >= maxBacklogFiles)
                respond(ex, 429,
                  s"""{"error":"spool backlog at capacity ($maxBacklogFiles files); retry later"}""")
              else {
                val name = s"ingest-$boot-${seq.incrementAndGet()}.jsonl"
                val tmp = Paths.get(spoolDir, s".$name.tmp")
                Files.writeString(tmp, records.mkString("\n"))
                Files.move(tmp, Paths.get(spoolDir, name),
                  StandardCopyOption.ATOMIC_MOVE)
                respond(ex, 200,
                  s"""{"status":"ok","tier1_ingested":${records.length}}""")
              }
          }
        }
      } finally ex.close()
  })

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  def start(): HttpIngestGateway = { server.start(); this }
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object HttpIngestGateway {

  /** Test seam for the record splitter (package-private otherwise). */
  def splitForTest(body: String): Either[String, Seq[String]] =
    splitRecords(body)

  /** Split a request body into one JSON record per line: a top-level
    * JSON array is split into its object/array elements with a
    * string/escape-aware scanner (nested objects, arrays, and quoted
    * `,]}` are payload); anything else is treated as JSONL. Returns Left
    * on an unbalanced array, a scalar element (`[1,2]`, `["s"]` — log
    * records are objects), a missing/misplaced/trailing comma, or ANY
    * other non-whitespace content between elements — a truncated or
    * garbled POST must be rejected whole, never partially spooled behind
    * a 200. */
  private[api] def splitRecords(body: String): Either[String, Seq[String]] = {
    val trimmed = body.trim
    if (trimmed.isEmpty) Right(Seq.empty)
    else if (trimmed.head != '[')
      Right(trimmed.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq)
    else {
      val out = Seq.newBuilder[String]
      // closer stack (not a bare depth counter): '[{]}' must be rejected,
      // not accepted — a truncated/corrupt POST is refused, never spooled
      val closers = new java.lang.StringBuilder
      var inStr = false; var esc = false
      var start = -1
      // depth-1 element-boundary state: an element must be followed by a
      // comma or the closing bracket, a comma by an element — anything
      // else between elements means the array is garbled
      var sawElem = false; var pendingComma = false
      var i = 0
      while (i < trimmed.length) {
        val c = trimmed.charAt(i)
        if (esc) esc = false
        else if (inStr) {
          if (c == '\\') esc = true
          else if (c == '"') inStr = false
        } else c match {
          case '"' =>
            if (closers.length == 1)
              return Left("scalar element in the top-level array (records must be objects or arrays)")
            inStr = true
          case '[' | '{' =>
            if (closers.length == 1) {
              if (sawElem) return Left("missing comma between array elements")
              pendingComma = false
            }
            closers.append(if (c == '[') ']' else '}')
            if (closers.length == 2 && start < 0) start = i
          case ']' | '}' =>
            if (closers.length == 0 || closers.charAt(closers.length - 1) != c)
              return Left("mismatched JSON delimiters in array body")
            closers.setLength(closers.length - 1)
            if (closers.length == 1 && start >= 0) {
              out += trimmed.substring(start, i + 1); start = -1; sawElem = true
            }
            if (closers.length == 0) {
              if (pendingComma) return Left("trailing comma in the top-level array")
              if (i != trimmed.length - 1 && trimmed.substring(i + 1).trim.nonEmpty)
                return Left("trailing content after the top-level array")
            }
          case ',' if closers.length == 1 =>
            if (!sawElem) return Left("misplaced comma in the top-level array")
            sawElem = false; pendingComma = true
          case other =>
            if (closers.length == 1 && !Character.isWhitespace(other))
              return Left("non-record content between array elements")
        }
        i += 1
      }
      if (closers.length != 0 || inStr) Left("unbalanced JSON array body")
      else Right(out.result())
    }
  }
}
