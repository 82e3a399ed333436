package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Multi-writer safety of the commit-ledger stores (VERDICT r13 item 2).
  *
  * The `b<id>-` + marker protocol assumes ONE serial writer: two writers
  * with independent batch-id sequences would delete each other's files on
  * replay and mis-classify committed-ness. The store therefore DETECTS
  * and REFUSES: the first identified append claims the ledger, any other
  * identity throws before touching data, and the legitimate cases — a
  * kill/restart of the same logical writer, an explicit ownership
  * release — keep working. */
class MultiWriterSpec extends SparkSpec {

  private def batchDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    rows.toDF("ts_sec", "body")
      .withColumn("dt", graft.analysis.DtPrune.dtOf(col("ts_sec")))
  }

  private val rowsA = Seq(1700000000L -> "a0", 1700000001L -> "a1")
  private val rowsB = Seq(1700000002L -> "b0")

  test("a second writer identity is refused before any mutation") {
    val tier1 = Files.createTempDirectory("mw").toString + "/t1"
    IngestPipeline.appendBatchIdempotent(batchDf(rowsA), tier1, 0,
      writerId = Some("ingest:/ckpt/A"))
    IngestPipeline.appendBatchIdempotent(batchDf(rowsA), tier1, 1,
      writerId = Some("ingest:/ckpt/A"))
    val before = spark.read.parquet(tier1).count()
    assert(before == 4)
    // writer B replays ITS batch id 1 — under the old protocol its replay
    // cleanup would delete A's committed b1-* files; now it must refuse
    // with the store byte-identical
    val e = intercept[IngestPipeline.ConcurrentWriterException] {
      IngestPipeline.appendBatchIdempotent(batchDf(rowsB), tier1, 1,
        writerId = Some("ingest:/ckpt/B"))
    }
    assert(e.getMessage.contains("ingest:/ckpt/A"))
    assert(spark.read.parquet(tier1).count() == before,
      "refusal must leave the store untouched")
    // ...and B's refusal is not sticky for the owner
    IngestPipeline.appendBatchIdempotent(batchDf(rowsB), tier1, 2,
      writerId = Some("ingest:/ckpt/A"))
    assert(spark.read.parquet(tier1).count() == before + 1)
  }

  test("same identity restarts freely; release transfers ownership") {
    val tier1 = Files.createTempDirectory("mw2").toString + "/t1"
    IngestPipeline.appendBatchIdempotent(batchDf(rowsA), tier1, 0,
      writerId = Some("ingest:/ckpt/A"))
    // kill/restart of writer A: same checkpoint → same identity → same
    // batch-id sequence; the replay of batch 0 stays a no-op and batch 1
    // appends (the IngestSinkSpec recovery contract, now under the lock)
    IngestPipeline.appendBatchIdempotent(batchDf(rowsA), tier1, 0,
      writerId = Some("ingest:/ckpt/A"))
    IngestPipeline.appendBatchIdempotent(batchDf(rowsB), tier1, 1,
      writerId = Some("ingest:/ckpt/A"))
    assert(spark.read.parquet(tier1).count() == 3)
    // decommission A, hand the store to B: the documented operator path
    IngestPipeline.releaseWriter(spark, tier1)
    IngestPipeline.appendBatchIdempotent(batchDf(rowsB), tier1, 2,
      writerId = Some("ingest:/ckpt/B"))
    assert(spark.read.parquet(tier1).count() == 4)
    // ...and the claim is sticky again for the NEW owner
    intercept[IngestPipeline.ConcurrentWriterException] {
      IngestPipeline.appendBatchIdempotent(batchDf(rowsB), tier1, 3,
        writerId = Some("ingest:/ckpt/A"))
    }
  }

  test("concurrent first claims: exactly one writer wins the empty store") {
    // the create-no-overwrite race: N threads claim a fresh store under
    // DISTINCT identities at once; exactly one must own it, every loser
    // must see ConcurrentWriterException (never two owners, never a
    // silent double-claim). Repeated over fresh stores because the race
    // is probabilistic: one round caught LocalFileSystem's
    // check-then-create only intermittently (4 "owners" on a bad
    // scheduling roll); 20 rounds made the pre-fix failure reliable.
    val dir = Files.createTempDirectory("mw3").toString
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      (0 until 20).foreach { round =>
        val root = new org.apache.hadoop.fs.Path(s"$dir/t$round")
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val results = (0 until 8).map { i =>
          pool.submit(new java.util.concurrent.Callable[Option[String]] {
            def call(): Option[String] =
              try { IngestPipeline.claimWriter(fs, root, s"w$i"); Some(s"w$i") }
              catch { case _: IngestPipeline.ConcurrentWriterException => None }
          })
        }.map(_.get())
        val winners = results.flatten
        assert(winners.size == 1,
          s"round $round: exactly one claim must win: $winners")
        // the surviving lock belongs to the winner, and re-claiming under
        // that identity still passes
        IngestPipeline.claimWriter(fs, root, winners.head)
      }
    } finally pool.shutdown()
  }

  test("promotion stream sink claims tier-2: a rival promotion refuses") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("mw4").toString
    val tier1 = s"$dir/t1"
    val tier2 = s"$dir/t2"
    // minimal Tier-1 content so promoteBatchIdempotent's scan resolves
    batchDf(rowsA)
      .withColumn("rhythm_hash", lit(42L))
      .withColumn("service", lit("svc")).withColumn("severity", lit("INFO"))
      .write.partitionBy("dt").parquet(tier1)
    val anoms = spark.range(1).select(
      lit(42L).as("rhythm_hash"), lit("spike").as("anomaly_type"),
      lit(2L).as("n"), lit(1.0).as("baseline_mean"),
      lit(1700000000L - 1700000000L % 60).as("window_start"))
    PromotionStream.promoteBatchIdempotent(spark, anoms, 0L, tier1, tier2,
      rules = None, windowSec = 60, writerId = Some("promotion:/ckpt/P1"))
    val rows = spark.read.parquet(tier2).count()
    assert(rows > 0)
    intercept[IngestPipeline.ConcurrentWriterException] {
      PromotionStream.promoteBatchIdempotent(spark, anoms, 0L, tier1, tier2,
        rules = None, windowSec = 60, writerId = Some("promotion:/ckpt/P2"))
    }
    assert(spark.read.parquet(tier2).count() == rows)
  }
}
