package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Checkpoint recovery for the streaming exact-dedup: the query is
  * STOPPED between micro-batches and restarted from its checkpoint dir.
  * Content whose fingerprint was admitted BEFORE the stop must still be
  * dropped when it re-arrives AFTER the restart (the
  * dropDuplicatesWithinWatermark state store recovered — no re-admitted
  * duplicate), phase-1 output must not re-emit (file-sink exactly-once
  * via offsets + metadata log), and genuinely new content is admitted. */
class DedupRecoverySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("fingerprint state survives a stop/restart: no re-admitted duplicate") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-dedup-rec").toString
    val base = 1700000000L
    def ts(off: Long) = new Timestamp((base + off) * 1000L)
    def writeDocs(rows: Seq[(Timestamp, Long, String)]): Unit =
      rows.toDF("ts", "doc_id", "text")
        .coalesce(1).write.mode("append").parquet(s"$tmp/docs")

    def start() = StreamingDedup.dedupByContent(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/docs"),
      delay = "10 minutes")
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append()).start()

    // phase 1: two distinct docs admitted (plus an in-batch duplicate
    // dropped), then the query stops with both fingerprints in state
    writeDocs(Seq(
      (ts(1), 1L, "Alpha Report!"),
      (ts(2), 2L, "beta note"),
      (ts(3), 3L, "alpha report"))) // in-batch dup of doc 1 → dropped
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2 arrives while NO query runs: a re-arrival of doc 1's
    // content INSIDE the horizon (must be dropped using the RECOVERED
    // state) and a genuinely new doc (must be admitted)
    writeDocs(Seq(
      (ts(60), 4L, "ALPHA -- report"),
      (ts(61), 5L, "gamma fresh")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val ids = spark.read.parquet(s"$tmp/out")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 5L)),
      s"expected first arrivals {1,2,5} only (4 is a post-restart dup, " +
        s"3 an in-batch dup), got ${ids.toSeq}")
  }
}
