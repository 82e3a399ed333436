package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** JSON string escape shared with Verify: backslash, quote, and ALL
    * control chars (<0x20). */
  private[graft] def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Per-query DuckDB baseline via tools/duck_bench.py (python3 + duckdb
    * live driver-side in this environment). Returns name → seconds; empty
    * on any failure — the Spark bench must never die on the baseline. */
  private def duckTimings(sfDir: String, oracle: Map[String, String])
      : (Map[String, Double], Seq[String]) =
    try {
      // SPARK_GRAFT_NO_DUCK=1 skips the in-process baseline entirely —
      // for artifact refreshes that attach an existing per-process map
      // (tools/duck_map.sh + attach_duck_map.py) instead
      if (sys.env.get("SPARK_GRAFT_NO_DUCK").contains("1"))
        return (Map.empty, Seq.empty)
      val script = java.nio.file.Paths.get("tools/duck_bench.py")
      if (!java.nio.file.Files.exists(script)) return (Map.empty, Seq.empty)
      val oraclePath = java.nio.file.Files.createTempFile("oracle", ".json")
      val outPath = java.nio.file.Files.createTempFile("duck", ".json")
      java.nio.file.Files.writeString(oraclePath, oracle
        .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }
        .mkString("{", ",", "}"))
      try {
        val p = new ProcessBuilder(
          "python3", script.toString, sfDir, oraclePath.toString, outPath.toString)
          .redirectErrorStream(true).start()
        // drain on a daemon thread and bound the wait: duck_bench's
        // in-process interrupt watchdog deadlocked mid-run once (sf10,
        // r14-s2 — python blocked with CPU frozen), and an unbounded
        // waitFor would have stalled the WHOLE bench behind the baseline.
        // Budget: 35 s per query (duck_bench's 30 s interrupt clamp plus
        // per-query process slack) + 5 min, floored at 20 min; on expiry
        // the child is killed and the bench reports Spark-only, per this
        // method's "must never die on the baseline" contract.
        val drain = new Thread(() => {
          try p.getInputStream.readAllBytes()
          catch { case _: Throwable => () }
        })
        drain.setDaemon(true)
        drain.start()
        val budgetMin = math.max(20L, oracle.size * 35L / 60L + 5L)
        if (!p.waitFor(budgetMin, java.util.concurrent.TimeUnit.MINUTES)) {
          p.destroyForcibly()
          return (Map.empty, Seq.empty)
        }
        if (p.exitValue() != 0) return (Map.empty, Seq.empty)
        val txt = java.nio.file.Files.readString(outPath)
        val times = """"([^"]+)":\s*([0-9.eE+-]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
        val timeouts = """"_timeouts":\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse("")
          .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
        (times, timeouts)
      } finally {
        // every exit path (timeout kill, nonzero exit, success) cleans up
        java.nio.file.Files.deleteIfExists(oraclePath)
        java.nio.file.Files.deleteIfExists(outPath)
      }
    } catch { case _: Throwable => (Map.empty, Seq.empty) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SessionTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: classloading, whole-stage codegen for the scan/agg/
    // shuffle/regex paths, parquet footer reads — steady-state timing only
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .limit(10000)
        .selectExpr("l_returnflag", "regexp_replace(l_comment, '[0-9]+', '*') AS c",
          "l_quantity")
        .groupBy("l_returnflag").agg(org.apache.spark.sql.functions.sum("l_quantity"))
        .collect()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
        .selectExpr("size(split(lower(text), '[^a-z0-9]+')) AS n").collect()
    } catch { case _: Throwable => }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // dev-only: SPARK_GRAFT_ONLY="a,b" times just the named queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
    val reps = sys.env.get("SPARK_GRAFT_REPS").map(_.toInt).getOrElse(3)
    // untimed-row build phase: the indexed gate queries (ann_graph /
    // ann_rerank_indexed / text_match_indexed) probe a persisted index
    // that indexFor builds lazily on first use per JVM. In production
    // that build is a write-time job paid once per corpus, not per
    // query — so the bench pays it HERE, times it, and reports it as
    // its own `build_s` metric; the per-query rows below are then
    // probe-only at ANY rep count (the r14 sf10 artifact's 1-rep
    // ann_graph row was build-dominated: ~96 s of graph construction
    // inside a 100.8 s row).
    val buildS: Map[String, Double] = Seq[(String, String, () => Unit)](
      ("graph", "ann_graph",
        () => { graft.search.GraphIndex.indexFor(spark, sfDir); () }),
      ("ann", "ann_rerank_indexed",
        () => { graft.search.AnnIndex.indexFor(spark, sfDir); () }),
      ("text", "text_match_indexed",
        () => { graft.search.TextIndex.indexFor(spark, sfDir); () }),
      // write-time corpus stat, not an index: the INT8 quantization bound
      // (VERDICT r16 item 3) — one linear pass, reported like any build
      ("int8stats", "int8_corpus_topk_stats",
        () => { graft.search.Int8Stats.statsFor(spark, sfDir); () })
    ).flatMap { case (idx, q, go) =>
      if (!selected.contains(q)) None
      else {
        val t0 = System.nanoTime()
        // a build failure is the query's failure to report, not the
        // build phase's — the timed row will surface it
        try { go(); Some(idx -> (System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
    }.toMap
    val results = selected.map { case (name, fn) =>
      // noop sink: materializes EVERY output column (a bare count() would
      // let Catalyst prune the projections and under-report pure-projection
      // queries). Best of three runs per query: the first pays one-time
      // JIT/codegen-cache costs, and min-of-3 survives a rep where BOTH of
      // two runs land on a GC/JIT-queue stall (observed twice across round
      // benches with min-of-2: a 3-4x phantom regression that a standalone
      // rerun couldn't reproduce). The explicit GC empties the tenured
      // garbage the previous ~70 queries accumulated so collection pauses
      // don't land inside this query's timing. Failed reps contribute NO
      // time at all — a fast crash must not win the min, and an all-failed
      // query reports null and is excluded from the total.
      System.gc()
      val times = (1 to reps).flatMap { _ =>
        // drop cached relations so run 2 can't reuse run 1's .cache()
        // (CacheManager matches identical logical plans across calls)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            if (!failed.contains(name)) failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      name -> (if (times.nonEmpty) Some(times.min) else None)
    }
    val total = results.values.flatten.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")

    // per-query DuckDB baseline over the SAME oracle SQL at the SAME SF —
    // makes the per-query 2x gate mechanically checkable (VERDICT r7 #2).
    // Skipped silently when python3/duckdb is absent.
    val duckOracle = SparkEntry.oracleSql.filter(kv => results.exists(_._1 == kv._1))
    val (duck, duckTimeouts) = duckTimings(sfDir, duckOracle)
    val duckTotal = duck.values.sum
    val duckTimeoutsJson = duckTimeouts.map("\"" + _ + "\"").mkString("[", ",", "]")

    // golden-backed rows: their "oracle" just read_parquets the committed
    // answer, so spark-vs-duck ratios on them compare compute against a
    // file read — meaningless either way (VERDICT r15 item 4). Tag them
    // and report a COMPARABLE subset (non-golden rows where DuckDB
    // finished) whose ratio is the honest headline; totals stay complete.
    val goldenRows = graft.queries.Golden.backed.map(_._1)
      .filter(n => results.exists(_._1 == n))
    val comparable = results.collect {
      case (n, Some(t)) if !goldenRows.contains(n) && duck.contains(n)
        && !duckTimeouts.contains(n) => (n, t, duck(n))
    }
    val compSpark = comparable.map(_._2).sum
    val compDuck = comparable.map(_._3).sum
    val goldenJson = goldenRows.map("\"" + _ + "\"").mkString("[", ",", "]")
    val comparableJson =
      if (comparable.isEmpty) "null"
      else s"""{"n":${comparable.size},"spark_total":${f"$compSpark%.3f"},""" +
        s""""duck_total":${f"$compDuck%.3f"},""" +
        s""""ratio":${f"${compSpark / math.max(compDuck, 1e-9)}%.3f"}}"""

    def queriesJson(dp: Option[Int]) = results.map { case (k, v) =>
      "\"" + k + "\":" + v.fold("null")(t =>
        dp.fold(t.toString)(d => s"%.${d}f".format(t)))
    }.mkString("{", ",", "}")
    val duckJson = results.map { case (k, _) =>
      "\"" + k + "\":" + duck.get(k).fold("null")(t => f"$t%.3f")
    }.mkString("{", ",", "}")

    val buildJson = buildS.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")

    // full-detail artifact: spark + duck columns per query. Every spark
    // time is the MIN of `reps` back-to-back reps (cache-cleared, GC'd).
    val fileLine =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
        s""""queries":${queriesJson(None)},""" +
        s""""duck":$duckJson,"duck_total":${f"$duckTotal%.3f"},""" +
        s""""build_s":$buildJson,"golden":$goldenJson,""" +
        s""""comparable":$comparableJson,""" +
        s""""duck_timeouts":$duckTimeoutsJson,"sf":"$sfDir","failed":$failedJson}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_RESULT.json"), fileLine + "\n")

    // stdout line: must survive the driver's bounded (2000-char) tail
    // capture — per-query values at 3 dp, degrading to 2 dp (the 80-query
    // map + build_s sits right at the boundary), and only then dropping
    // the per-query map (full detail is in BENCH_RESULT.json either way)
    def compactAt(dp: Int) =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","reps":$reps,"queries":${queriesJson(Some(dp))},""" +
        s""""duck_total":${f"$duckTotal%.3f"},"comparable":$comparableJson,"build_s":$buildJson,"sf":"$sfDir","failed":$failedJson}"""
    val line = Seq(compactAt(3), compactAt(2)).find(_.length <= 1900).getOrElse(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","reps":$reps,"queries":"see BENCH_RESULT.json",""" +
        s""""duck_total":${f"$duckTotal%.3f"},"comparable":$comparableJson,"build_s":$buildJson,"sf":"$sfDir","failed":$failedJson}""")
    // stop Spark first (its shutdown logging would otherwise push the line
    // out of the tail capture), THEN print the bare JSON as the very last
    // stdout line
    spark.stop()
    println(line)
  }
}
