package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming joins proven against their batch mirrors: the stream–stream
  * interval join must emit exactly the pairs the batch `range_join`
  * counts (for errors with context), and stream–static enrichment must
  * behave as a per-batch broadcast left join. */
class JoinStreamsSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  test("stream-stream interval join replays to the batch range_join counts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Tables.events(s, SfDir)
      .selectExpr("event_id", "user_id", "ts_us", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._3)

    val input = MemoryStream[(Long, Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "user_id", "ts", "event_type")
    val q = JoinStreams.errorContext(events, watermarkDelay = "1 second")
      .writeStream.format("memory").queryName("errctx")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.map(r => (r._1, r._2, tsOf(r._3), r._4)).toSeq)
      q.processAllAvailable()
      val got = s.sql("SELECT err_id, count(*) AS n FROM errctx GROUP BY err_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.queries.Registry.all.find(_.name == "range_join").get
        .fn(s, SfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      // inner join: only errors with at least one in-band neighbor emit
      val expected = batch.filter(_._2 > 0)
      assert(got == expected,
        s"${got.size} streamed errors vs ${expected.size} batch errors with context")
      assert(expected.nonEmpty, "fixture must contain errors with context")
    } finally q.stop()
  }

  test("leftOuter interval join emits zero-context errors after the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Tables.events(s, SfDir)
      .selectExpr("event_id", "user_id", "ts_us", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._3)
    val maxUs = rows.map(_._3).max

    val input = MemoryStream[(Long, Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "user_id", "ts", "event_type")
    val q = JoinStreams.errorContext(events, watermarkDelay = "1 second",
        joinType = "leftOuter")
      .writeStream.format("memory").queryName("errctx_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.map(r => (r._1, r._2, tsOf(r._3), r._4)).toSeq)
      q.processAllAvailable()
      // sentinel rows on BOTH watermarked sides (error + non-error),
      // far enough ahead to close every real error's band; watermark
      // updates at end of batch, so run one more batch with it
      val farUs = maxUs + 48L * 3600 * 1000000
      input.addData(Seq((9999991L, 999999L, tsOf(farUs), "error"),
        (9999992L, 999999L, tsOf(farUs), "click")))
      q.processAllAvailable()
      input.addData(Seq((9999993L, 999999L, tsOf(farUs + 1000000L), "error"),
        (9999994L, 999999L, tsOf(farUs + 1000000L), "click")))
      q.processAllAvailable()

      val got = s.sql(
        """SELECT err_id, count(oth_id) AS n FROM errctx_outer
           WHERE err_id < 9999991 GROUP BY err_id""")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.queries.Registry.all.find(_.name == "range_join").get
        .fn(s, SfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == batch,
        s"outer streamed ${got.size} errors vs batch ${batch.size}")
      assert(batch.values.exists(_ == 0),
        "fixture must contain zero-context errors for the outer case to prove")
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dim into each batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq(("error", 3L), ("click", 1L)).toDF("event_type", "weight")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("event_id", "event_type")
    val q = JoinStreams.enrich(stream, dim, Seq("event_type"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq((1L, "error"), (2L, "click"), (3L, "scroll")))
      q.processAllAvailable()
      val got = s.sql("SELECT event_id, weight FROM enriched")
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got == Map(1L -> Some(3L), 2L -> Some(1L), 3L -> None),
        s"got $got")
      // left join: unmatched stream rows survive with NULL enrichment
    } finally q.stop()
  }
}
