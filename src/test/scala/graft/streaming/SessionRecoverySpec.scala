package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** Checkpoint recovery for the streaming sessionizer: the query is
  * STOPPED between micro-batches — with a session OPEN in keyed state —
  * and restarted from its checkpoint dir. The session spanning the
  * restart must merge its pre- and post-restart events into ONE rollup
  * (state recovered, no loss), phase-1 sessions must not re-emit
  * (offsets recovered, no duplication), and per-user ordinals must stay
  * continuous across the restart. */
class SessionRecoverySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  test("open session spans a stop/restart: one merged rollup, continuous ordinals") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-sess-rec").toString
    val base = 1700000000L
    def ts(off: Long) = new Timestamp((base + off) * 1000L)
    def writeEvents(rows: Seq[(Long, Timestamp, Double)]): Unit =
      rows.toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("append").parquet(s"$tmp/events")

    def start() = SessionStream.sessions(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/events"),
      gapSec = 600L, watermarkDelay = "1 second")
      .writeStream.format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode(OutputMode.Append()).start()

    // phase 1: session 1 closes by GAP (>600 s), session 2 OPENS and
    // stays open in state when the query stops
    writeEvents(Seq((1L, ts(0), 1.0), (1L, ts(10), 2.0)))
    writeEvents(Seq((1L, ts(700), 3.0))) // gap: closes s1, opens s2
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // phase 2 arrives while NO query runs: s2 continues (base+750 is
    // within the 600 s gap of base+700 — merging it needs the RECOVERED
    // open-session state), then a gap closes s2 and opens s3; sentinels
    // advance the watermark so s3's event-time timeout fires
    writeEvents(Seq((1L, ts(750), 4.0)))
    writeEvents(Seq((1L, ts(1500), 5.0))) // gap: closes s2, opens s3
    writeEvents(Seq((999L, ts(9000), 0.0)))
    writeEvents(Seq((999L, ts(9100), 0.0)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(s"$tmp/out")
      .filter($"user_id" === 1L)
      .select("session_id", "n_events", "start_sec", "end_sec", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1)
    val want = Seq(
      (1L, 2L, base, base + 10L, 3.0),        // phase-1 only, NOT re-emitted
      (2L, 2L, base + 700L, base + 750L, 7.0), // SPANS the restart: merged
      (3L, 1L, base + 1500L, base + 1500L, 5.0)) // post-restart, ordinal 3
    assert(got.toSeq == want,
      s"recovery broke sessionization:\n got=${got.toSeq}\nwant=$want")
  }
}
