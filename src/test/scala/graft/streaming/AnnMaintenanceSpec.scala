package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.search.AnnIndex
import org.apache.spark.sql.functions.col

/** Streaming index maintenance (VERDICT r8 #5): promotion must leave the
  * ANN index in exactly the state a from-scratch rebuild over Tier-2
  * produces — across a kill/restart and under a forced batch replay —
  * so freshly promoted anomalies are probe-visible without a manual
  * rebuild and a crash can never double index rows. */
class AnnMaintenanceSpec extends SparkSpec {

  private val th = StatefulDetector.Thresholds(
    noveltyMinCount = 2, freqMinCount = 2, freqSigma = 1.0, stdFloor = 0.5)
  private val Dim = graft.functions.EmbedText.Dim
  private val Rp = graft.queries.VectorOps.rpRowsFor(Dim)

  /** Probe with the near-dup lookup a triage user runs: q = one stored
    * dense vector (same sign bucket by construction, so the bucketed
    * probe must surface it); projection via the same ascending fold
    * matVec uses. */
  private def probeRows(path: String, q: Seq[Double]): Seq[String] = {
    val qProj = Rp.map(r => r.indices.foldLeft(0.0)((a, i) => a + r(i) * q(i)))
    AnnIndex.probe(spark, path, q = q, qProj = qProj)
      .collect().map(_.toString).toSeq
  }

  private def storedVector(indexPath: String): Seq[Double] =
    spark.read.parquet(indexPath).select("embedding")
      .orderBy(col("vec_id")).head.getSeq[Float](0).map(_.toDouble).toSeq

  test("stop/restart stream: probe(streamed index) == probe(rebuild), no dupes") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ann-maint").toString
    val base = 1700000000L
    def writeT1(rows: Seq[(String, Long)]): Unit =
      rows.zipWithIndex.map { case ((h, ts), i) =>
        (h, ts, "auth", "INFO", s"evt $i at $ts")
      }.toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
        .write.mode("append").parquet(s"$tmp/tier1")

    // phase 1 (novelty window for h1), stream stopped between phases —
    // the PromotionRecoverySpec choreography with the index wired in
    writeT1(Seq.tabulate(3)(i => ("h1", base + i)))
    writeT1(Seq(("close1", base + 75)))
    val q1 = PromotionStream.start(spark, s"$tmp/tier1", s"$tmp/tier2",
      s"$tmp/ckpt", rules = None, windowSec = 60,
      watermarkDelay = "10 seconds", thresholds = th,
      triggerMs = 100, stateTtlMs = None, annIndexPath = Some(s"$tmp/ann"))
    try q1.processAllAvailable() finally q1.stop()

    // phase 2 (frequency burst) arrives while no query runs
    writeT1(Seq.tabulate(8)(i => ("h1", base + 120 + i)))
    writeT1(Seq(("close2", base + 4000)))
    val q2 = PromotionStream.start(spark, s"$tmp/tier1", s"$tmp/tier2",
      s"$tmp/ckpt", rules = None, windowSec = 60,
      watermarkDelay = "10 seconds", thresholds = th,
      triggerMs = 100, stateTtlMs = None, annIndexPath = Some(s"$tmp/ann"))
    try q2.processAllAvailable() finally q2.stop()

    val tier2 = spark.read.parquet(s"$tmp/tier2")
    assert(tier2.count() >= 2, "both anomaly branches must have promoted")

    // no dupes: the index holds exactly one row per promoted Tier-2 row
    val idx = spark.read.parquet(s"$tmp/ann/index")
    assert(idx.count() == tier2.count(),
      s"index rows ${idx.count()} != tier2 rows ${tier2.count()}")

    // rebuild reference: same rows, from-scratch build (bucket layout)
    AnnIndex.build(
      tier2.select(col("rhythm_hash").as("vec_id"),
        col("severity").as("label"), col("dense").as("embedding")),
      s"$tmp/ann_rebuild", rpRows = Rp)
    val q = storedVector(s"$tmp/ann/index")
    val got = probeRows(s"$tmp/ann", q)
    val want = probeRows(s"$tmp/ann_rebuild", q)
    assert(got.nonEmpty, "probe over the streamed index found nothing")
    assert(got == want,
      s"streamed index diverged from rebuild:\n got=$got\n want=$want")
  }

  test("graph index: streamed batches across a restart == rebuild; no stale serve") {
    import spark.implicits._
    import graft.search.{GraphIndex, TierIndex}
    val tmp = Files.createTempDirectory("graft-graph-maint").toString
    val base = 1700000000L
    def writeT1(rows: Seq[(String, Long)]): Unit =
      rows.zipWithIndex.map { case ((h, ts), i) =>
        (h, ts, "auth", "INFO", s"evt $i at $ts for $h")
      }.toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
        .write.mode("append").parquet(s"$tmp/tier1")
    def runStream(): Unit = {
      val q = PromotionStream.start(spark, s"$tmp/tier1", s"$tmp/tier2",
        s"$tmp/ckpt", rules = None, windowSec = 60,
        watermarkDelay = "10 seconds", thresholds = th,
        triggerMs = 100, stateTtlMs = None,
        graphIndexPath = Some(s"$tmp/graph"))
      try q.processAllAvailable() finally q.stop()
    }
    // the AnnMaintenanceSpec choreography, graph leg: two phases with the
    // stream KILLED in between
    writeT1(Seq.tabulate(3)(i => ("h1", base + i)))
    writeT1(Seq(("close1", base + 75)))
    runStream()
    writeT1(Seq.tabulate(8)(i => ("h1", base + 120 + i)))
    writeT1(Seq(("close2", base + 4000)))
    runStream()
    val tier2 = spark.read.parquet(s"$tmp/tier2")
    assert(tier2.count() >= 2, "both anomaly branches must have promoted")
    // restart did not double the idempotent buffer batches: exactly one
    // buffered node per promoted row (the store is buffer-only so far)
    assert(GraphIndex.bufferRows(spark, s"$tmp/graph") == tier2.count())
    // maintenance bootstrap: rebuild materializes the graph from the
    // streamed batches alone, then must equal a from-scratch build
    GraphIndex.rebuild(spark, s"$tmp/graph")
    assert(GraphIndex.bufferRows(spark, s"$tmp/graph") == 0L)
    TierIndex.build(tier2, s"$tmp/graph_rebuild")
    val q1 = tier2.orderBy("start_ts").select("dense")
      .head.getSeq[Float](0).map(_.toDouble).toSeq
    def top(path: String): Seq[(Long, Double)] =
      GraphIndex.probeCached(spark, path, q1, k = 5, ef = GraphIndex.GateEf)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(top(s"$tmp/graph") == top(s"$tmp/graph_rebuild"),
      "streamed-then-rebuilt graph diverged from a from-scratch build")
    // no stale serve through the FULL stack: the resident copy is warm
    // (probed above); a third streamed phase buffers a NEW hash, which
    // must be probe-visible immediately, and stay visible after the
    // rebuild that folds it in (version bump must drop the resident copy)
    writeT1(Seq.tabulate(5)(i => ("h2", base + 4200 + i)))
    writeT1(Seq(("close3", base + 8000)))
    runStream()
    val h2dense = spark.read.parquet(s"$tmp/tier2")
      .filter($"rhythm_hash" === "h2").select("dense")
      .head.getSeq[Float](0).map(_.toDouble).toSeq
    val h2key = spark.read.parquet(s"$tmp/tier2")
      .filter($"rhythm_hash" === "h2")
      .select(TierIndex.rowKey).head.getLong(0)
    assert(top(s"$tmp/graph").nonEmpty) // resident still serves
    val buffered = GraphIndex.probeCached(spark, s"$tmp/graph", h2dense,
      k = 3, ef = GraphIndex.GateEf).collect().map(_.getLong(0))
    assert(buffered.head == h2key,
      "freshly streamed cluster not probe-visible before rebuild")
    GraphIndex.rebuild(spark, s"$tmp/graph")
    val folded = GraphIndex.probeCached(spark, s"$tmp/graph", h2dense,
      k = 3, ef = GraphIndex.GateEf).collect().map(_.getLong(0))
    assert(folded.head == h2key,
      "stale resident copy served after the fold rebuild")
    // and the serving-candidates path sees the same world
    val cands = GraphIndex.servingCandidates(spark, s"$tmp/graph", h2dense,
      k = 3, ef = GraphIndex.GateEf)
    assert(cands.contains(h2key))
  }

  test("a replayed batch does not duplicate index rows") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ann-replay").toString
    val base = 1700000000L
    Seq.tabulate(3)(i => ("h1", base + i)).zipWithIndex
      .map { case ((h, ts), i) => (h, ts, "auth", "INFO", s"evt $i") }
      .toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
      .write.parquet(s"$tmp/tier1")
    val anoms = StatefulDetector.detect(
      spark.read.parquet(s"$tmp/tier1").select("rhythm_hash", "ts_sec"),
      60, thresholds = th).toDF()

    def run(): Unit = PromotionStream.promoteBatchIdempotent(
      spark, anoms, 7L, s"$tmp/tier1", s"$tmp/tier2", None, 60,
      annIndexPath = Some(s"$tmp/ann"))
    run()
    val q = storedVector(s"$tmp/ann/index")
    val once = probeRows(s"$tmp/ann", q)
    val onceN = spark.read.parquet(s"$tmp/ann/index").count()
    assert(once.nonEmpty && onceN > 0)
    run() // crash-replay: same batchId, same input
    assert(probeRows(s"$tmp/ann", q) == once, "replay changed probe results")
    assert(spark.read.parquet(s"$tmp/ann/index").count() == onceN,
      "replay duplicated index rows")
  }

  test("bulk build + streaming appendBatch share one layout: probe reads both") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-ann-mixed").toString + "/idx"
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val bulk = emb.filter($"vec_id" % 2 === 0L)
    val streamed = emb.filter($"vec_id" % 2 =!= 0L)
      .select($"vec_id", $"label", $"embedding")
    // the natural operational sequence: one bulk build, then streaming
    // maintenance into the SAME store — partition discovery must accept
    // the union (one (batch_id, bucket) layout, bulk under batch_id=-1)
    AnnIndex.build(bulk, tmp)
    AnnIndex.appendBatch(streamed, tmp, batchId = 3L)
    val rebuilt = Files.createTempDirectory("graft-ann-mixed-rb").toString + "/idx"
    AnnIndex.build(emb, rebuilt)
    // 64-d testdata vectors here (not EmbedText-dim): probe with the
    // 64-d default basis
    val q = storedVector(s"$rebuilt/index")
    def rows(path: String): Seq[String] =
      AnnIndex.probe(spark, path, q = q,
        qProj = graft.queries.VectorOps.RpRows.map(r =>
          r.indices.foldLeft(0.0)((a, i) => a + r(i) * q(i))))
        .collect().map(_.toString).toSeq
    assert(rows(tmp) == rows(rebuilt),
      "mixed bulk+streamed store must probe identically to a rebuild")
    // and a replay of the streaming batch still only rewrites its own level
    AnnIndex.appendBatch(streamed, tmp, batchId = 3L)
    assert(rows(tmp) == rows(rebuilt), "replay broke the mix")
  }
}
