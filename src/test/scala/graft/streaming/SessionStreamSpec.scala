package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import graft.streaming.SessionStream._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, TestGroupState}

/** SessionStream must agree with the batch `sessionize` operator: same
  * gap rule, same rollup values, same per-user ordinals — verified at the
  * step() unit level and end-to-end as a real MemoryStream replay of the
  * sf0.001 events fixture against the batch query's output. */
class SessionStreamSpec extends SparkSpec {

  private def freshState(watermarkMs: Long = 0L, timedOut: Boolean = false,
      st: Option[OpenSession] = None): TestGroupState[OpenSession] =
    TestGroupState.create[OpenSession](
      optionalState = st.fold(
        org.apache.spark.api.java.Optional.empty[OpenSession]())(
        org.apache.spark.api.java.Optional.of),
      timeoutConf = GroupStateTimeout.EventTimeTimeout(),
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(watermarkMs),
      hasTimedOut = timedOut)

  private def ev(sec: Long, cents: Long) = Ev(1L, new Timestamp(sec * 1000L), cents)

  test("step: folds within gap, closes on gap, ordinals advance") {
    val st = freshState()
    // one batch: two sessions (gap of 700 s > 600 s between them)
    val out = step(600L)(1L,
      Iterator(ev(1000, 150), ev(1300, 250), ev(2000, 100)), st).toSeq
    assert(out.map(s => (s.session_id, s.n_events, s.start_sec, s.end_sec,
        s.sum_value)) ==
      Seq((1L, 2L, 1000L, 1300L, 4.0)),
      s"first session must close when the gap exceeds 600 s: $out")
    assert(st.get == OpenSession(2L, 1L, 2000L, 2000L, 100L),
      "second session stays open with the next ordinal")
    // timeout timestamp armed strictly past last + gap
    assert(st.getTimeoutTimestampMs.get() == (2000L + 600L) * 1000L + 1L)
  }

  test("step: timeout emits and evicts the open session") {
    val st = freshState(watermarkMs = 10000000L, timedOut = true,
      st = Some(OpenSession(3L, 5L, 9000L, 9400L, 1234L)))
    val out = step(600L)(7L, Iterator.empty, st).toSeq
    assert(out == Seq(ClosedSession(7L, 3L, 5L, 9000L, 9400L, 12.34)))
    assert(st.isRemoved, "state must evict at close")
  }

  test("stream replay of the events fixture matches batch sessionize") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val SfDir = "/root/testdata/sf0.001"
    val rows = Tables.events(spark, SfDir)
      .selectExpr("user_id", "ts_us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._2)
    val maxUs = rows.map(_._2).max

    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val q = SessionStream.sessions(events, watermarkDelay = "1 second")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      // micro-timestamp fidelity: Timestamp carries millis + nanos; build
      // from micros exactly
      def tsOf(us: Long): Timestamp = {
        val t = new Timestamp(us / 1000L)
        t.setNanos(((us % 1000000L) * 1000L).toInt)
        t
      }
      input.addData(rows.map(r => (r._1, tsOf(r._2), r._3)).toSeq)
      q.processAllAvailable()
      // two sentinel batches for a throwaway user: the first advances the
      // watermark past every real session's last+gap (watermark updates at
      // END of a batch), the second runs with it so the timeouts fire
      val sentinelUs = maxUs + (SessionOpsGap + 3600L) * 1000000L
      input.addData(Seq((999999L, tsOf(sentinelUs), 0.0)))
      q.processAllAvailable()
      input.addData(Seq((999999L, tsOf(sentinelUs + 1000000L), 0.0)))
      q.processAllAvailable()

      val got = spark.sql(
        "SELECT user_id, session_id, n_events, start_sec, end_sec, sum_value" +
          " FROM sessions WHERE user_id <> 999999")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      val batch = graft.queries.Registry.all.find(_.name == "sessionize").get
        .fn(spark, SfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      assert(got.size == batch.size,
        s"streamed ${got.size} sessions, batch has ${batch.size}")
      batch.foreach { case (k, v) =>
        assert(got(k) == v, s"session $k: streamed ${got.get(k)} != batch $v")
      }
    } finally q.stop()
  }

  private val SessionOpsGap = graft.queries.SessionOps.SessionGapSec
}
