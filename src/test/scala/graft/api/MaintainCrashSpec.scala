package graft.api

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.{PromotionStream, StatefulDetector}
import org.apache.spark.sql.functions._

/** Driver-crash recovery for the multi-store maintenance sweep
  * (VERDICT r13 item 6): each store's verb has single-store crash
  * recovery, but the SWEEP can die between stores — tier2 compacted,
  * the graph mid-bootstrap, the serving pin not yet refreshed. The next
  * sweep must converge: finish the missed stores, refresh the
  * stale-lineage pin even though THIS sweep rewrote nothing, and then go
  * quiescent, with serving answers unchanged throughout. */
class MaintainCrashSpec extends SparkSpec {

  private val th = StatefulDetector.Thresholds(
    noveltyMinCount = 2, freqMinCount = 2, freqSigma = 1.0, stdFloor = 0.5)

  test("crash between stores: next sweep converges and refreshes the pin") {
    import spark.implicits._
    val wh = Files.createTempDirectory("maintcrash").toString
    val via = new Via(spark, wh)
    val base = 1700000000L

    // tier1: two days, the older one fragmented across 3 tiny files (the
    // open/newest leaf is skipped by compactTier1 by design)
    def t1rows(rows: Seq[(String, Long)]): Unit =
      rows.zipWithIndex.map { case ((h, ts), i) =>
        (h, ts, "auth", "INFO", s"evt $i at $ts")
      }.toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
        .withColumn("dt", graft.analysis.DtPrune.dtOf(col("ts_sec")))
        .coalesce(1)
        .write.mode("append").partitionBy("dt").parquet(via.tier1Path)
    for (f <- 0 until 3)
      t1rows(Seq.tabulate(3)(i => (s"h$f", base + f * 10 + i)))
    t1rows(Seq(("hnext", base + 86400 * 2)))

    // tier2: three ledgered promotion batches (three b<id>- files), with
    // the graph index wired so rows buffer WITHOUT a built graph — the
    // sweep owes a bootstrap rebuild
    val anoms = StatefulDetector.detect(
      spark.read.parquet(via.tier1Path).select("rhythm_hash", "ts_sec"),
      60, thresholds = th).toDF()
    assert(anoms.count() > 0, "fixture produced no anomalies")
    for (bid <- 0L until 3L) {
      val slice = anoms.filter(col("rhythm_hash") === s"h$bid")
      assert(slice.count() > 0, s"batch $bid must promote something")
      PromotionStream.promoteBatchIdempotent(spark, slice,
        bid, via.tier1Path, via.tier2Path, None, 60,
        graphIndexPath = Some(via.graphIndexPath))
    }
    assert(graft.search.GraphIndex.bufferRows(spark, via.graphIndexPath) > 0)
    assert(graft.search.GraphIndex.nodeCount(spark, via.graphIndexPath).isEmpty)

    via.pinServing()
    def served(): Seq[String] = via.clusters(base + 7 * 86400)
      .collect().map(_.toString).sorted.toSeq
    val before = served()
    assert(before.nonEmpty)

    // --- the mid-sweep death: tier1 + tier2 compacted, everything after
    // (graph bootstrap, repin) never ran
    via.maintainCrashAfter = Some("tier2")
    val boom = intercept[IllegalStateException] {
      via.maintainIndexes(smallFileThreshold = 2)
    }
    assert(boom.getMessage.contains("tier2"))
    via.maintainCrashAfter = None
    assert(graft.search.GraphIndex.nodeCount(spark, via.graphIndexPath).isEmpty,
      "crash point must precede the graph bootstrap")
    // the resident pin keeps serving the snapshot across the gap
    assert(served() == before, "serving changed across the crashed sweep")

    // --- recovery sweep: finishes the missed stores AND repins even
    // though tier2 reports "none" this time (its files were already
    // rewritten by the dead sweep — the pin's frozen lineage is broken)
    val acts = via.maintainIndexes(smallFileThreshold = 2)
    def act(t: String) = acts.filter(_.target == t).map(_.action)
    assert(act("tier2") == Seq("none"), s"tier2 should be done: $acts")
    assert(act("graphidx").exists(_ != "none"),
      s"graph bootstrap must run on recovery: $acts")
    assert(act("serving") == Seq("repin"),
      s"stale-lineage pin must refresh on recovery: $acts")
    assert(served() == before, "serving parity broken after recovery")
    assert(graft.search.GraphIndex.nodeCount(spark, via.graphIndexPath)
      .exists(_ > 0))

    // --- converged: one more sweep is fully quiescent
    val acts2 = via.maintainIndexes(smallFileThreshold = 2)
    assert(acts2.forall(_.action == "none"), s"not quiescent: $acts2")
    assert(served() == before)
  }
}
