package graft
import org.apache.spark.sql.SparkSession

/** Single dispatcher for the measurement harnesses (VERDICT r15 item 8 —
  * the one-off bench mains accumulated across rounds are folded here or
  * deleted once their findings were recorded in SCALE.md).
  *
  * Usage: `sbt "runMain graft.BenchSuite --leg <name> [args...]"`.
  * Legs:
  *   one <query> [reps]   time ONE gate query (plan via
  *                        SPARK_GRAFT_EXPLAIN=1, output cardinality via
  *                        SPARK_GRAFT_COUNT=1) — attribution tool for a
  *                        per-query regression in the round bench
  *   shuffle <q> [q...]   time queries AND report their total shuffle
  *                        write/read bytes + records from task metrics —
  *                        the artifact-level evidence for shuffle-size
  *                        work (e.g. simhash_dedup's packed pair sort)
  *   scale | stream | serve | bucket | cc | sweepvalidate
  *                        delegate to graft.{ScaleBench, StreamBench,
  *                        ServeBench, BucketBench, CcValidate,
  *                        SweepValidate} (their own args/env contracts)
  *
  * Deleted as dead this round (findings pinned in SCALE.md; no pipeline
  * references): AnchorBench, BufBench, TailBench, GateEfProbe,
  * GraphBuildBench, KernelAbBench, FreshBench, BenchOne (folded into the
  * `one` leg).
  */
object BenchSuite {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SessionTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val a = args.toSeq
    val leg = a match {
      case Seq("--leg", l, _*) => l
      case _ => sys.error("usage: BenchSuite --leg <one|shuffle|scale|stream|serve|bucket|cc|sweepvalidate> [args]")
    }
    val rest = a.drop(2).toArray
    leg match {
      case "one" => one(rest)
      case "shuffle" => shuffle(rest)
      case "scale" => ScaleBench.main(rest)
      case "stream" => StreamBench.main(rest)
      case "serve" => ServeBench.main(rest)
      case "bucket" => BucketBench.main(rest)
      case "cc" => CcValidate.main(rest)
      case "sweepvalidate" => SweepValidate.main(rest)
      case other => sys.error(s"BenchSuite: unknown leg '$other'")
    }
  }

  /** Time one gate query N reps (the former graft.BenchOne). */
  private def one(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: --leg one <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    // SPARK_GRAFT_COUNT=1: also report output cardinality (for scale
    // sweeps where the honest metric is rows/sec of OUTPUT)
    if (sys.env.get("SPARK_GRAFT_COUNT").contains("1"))
      println(s"[$name] output rows: ${fn(spark, sfDir).count()}")
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[$name] rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }

  /** Shuffle-byte accounting per query: a task-metrics listener sums
    * shuffle WRITE bytes/records (what the exchange actually spills to
    * disk + moves) and shuffle READ bytes across the query's jobs. One
    * JSON line per query; events are flushed by polling the counter to
    * quiescence after each action (listener buses deliver async). */
  private def shuffle(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: --leg shuffle <query> [query...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    val wBytes = new java.util.concurrent.atomic.AtomicLong
    val wRecs = new java.util.concurrent.atomic.AtomicLong
    val rBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            wBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            wRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
            rBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          }
        }
      })
    def settle(): Unit = {
      var last = -1L
      var same = 0
      while (same < 3) { // three consecutive 100 ms polls without movement
        Thread.sleep(100)
        val now = wBytes.get() + rBytes.get()
        if (now == last) same += 1 else { same = 0; last = now }
      }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      spark.catalog.clearCache()
      // warm rep so codegen/footers don't ride the measured run
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      settle()
      wBytes.set(0); wRecs.set(0); rBytes.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      settle()
      println(f"""[shuffle] {"query":"$name","sec":$sec%.3f,""" +
        f""""shuffle_write_bytes":${wBytes.get()},""" +
        f""""shuffle_write_records":${wRecs.get()},""" +
        f""""shuffle_read_bytes":${rBytes.get()}}""")
    }
    spark.stop()
  }
}
