package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** StreamingDedup keeps first arrivals and drops duplicate content within
  * the watermark horizon, as a REAL stream (MemoryStream micro-batches). */
class StreamingDedupSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("duplicate content is dropped within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")

    val q = StreamingDedup.dedupByContent(docs)
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = 1700000000L
      // batch 1: same content twice (differing only in non-alnum chars —
      // the fingerprint normalizes), plus a distinct doc
      input.addData(
        (ts(base + 1), 1L, "Hello, World!"),
        (ts(base + 2), 2L, "hello world"),
        (ts(base + 3), 3L, "something else"))
      q.processAllAvailable()
      // batch 2: another re-arrival of the same content inside the horizon
      input.addData((ts(base + 30), 4L, "HELLO world"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM deduped")
        .collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 3L)),
        s"expected first arrivals only, got ${ids.toSeq}")
      // the fp column is the dedup_exact fingerprint (cross-check one)
      val fp = spark.sql("SELECT fp FROM deduped WHERE doc_id = 1")
        .collect().head.getString(0)
      val batchFp = spark.range(1).select(
        graft.functions.TextFunctions.fingerprint(lit("Hello, World!")))
        .collect().head.getString(0)
      assert(fp == batchFp)
    } finally q.stop()
  }

  test("state is watermark-bounded: re-arrival past the horizon is re-admitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")

    val q = StreamingDedup.dedupByContent(docs, delay = "10 seconds")
      .writeStream.format("memory").queryName("deduped_ttl")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = 1700000000L
      input.addData((ts(base), 1L, "recurring report"))
      q.processAllAvailable()
      // push the watermark far past base + 10 s so the fp state evicts
      input.addData((ts(base + 3600), 2L, "unrelated"))
      q.processAllAvailable()
      // same content again, one hour later: a NEW occurrence, re-admitted
      input.addData((ts(base + 3700), 3L, "recurring report"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM deduped_ttl")
        .collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)),
        s"horizon-expired content must re-admit, got ${ids.toSeq}")
    } finally q.stop()
  }

  test("incrementalFlags matches the batch dedup_incremental on a stream replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val SfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, SfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpus = graft.Tables.documents(spark, SfDir)
      .filter(col("doc_id") % graft.queries.TextOps.IncrMod =!= 0L)
      .select(col("doc_id"), col("text"))
    val incoming = docs.filter(_._1 % graft.queries.TextOps.IncrMod == 0)

    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingDedup.incrementalFlags(stream, corpus)
      .writeStream.format("memory").queryName("incr_flags")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = 1700000000L
      // replay the incoming shard in three micro-batches
      incoming.grouped(math.max(incoming.length / 3, 1)).zipWithIndex
        .foreach { case (batch, i) =>
          input.addData(batch.map { case (id, text) =>
            (id, ts(base + i * 60), text)
          }.toSeq: _*)
          q.processAllAvailable()
        }
      val got = spark.sql("SELECT doc_id, dup_exact, dup_near FROM incr_flags")
        .collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
      val want = graft.queries.Registry.all
        .find(_.name == "dedup_incremental").get.fn(spark, SfDir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
      assert(got.size == want.size, s"${got.size} vs ${want.size} verdicts")
      want.foreach { case (id, v) =>
        assert(got(id) == v, s"doc $id: stream ${got(id)} != batch $v")
      }
    } finally q.stop()
  }

  test("incrementalFlagsIndexed over a persisted DedupIndex matches the batch verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val SfDir = "/root/testdata/sf0.001"
    val corpus = graft.Tables.documents(spark, SfDir)
      .filter(col("doc_id") % graft.queries.TextOps.IncrMod =!= 0L)
      .select(col("doc_id"), col("text"))
    val incoming = graft.Tables.documents(spark, SfDir)
      .filter(col("doc_id") % graft.queries.TextOps.IncrMod === 0L)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val path = java.nio.file.Files.createTempDirectory("sdidx").toString + "/idx"
    graft.search.DedupIndex.build(corpus, path)

    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingDedup.incrementalFlagsIndexed(stream, path)
      .writeStream.format("memory").queryName("incr_flags_idx")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = 1700000000L
      incoming.grouped(math.max(incoming.length / 2, 1)).zipWithIndex
        .foreach { case (batch, i) =>
          input.addData(batch.map { case (id, text) =>
            (id, ts(base + i * 60), text)
          }.toSeq: _*)
          q.processAllAvailable()
        }
      val got = spark.sql("SELECT doc_id, dup_exact, dup_near FROM incr_flags_idx")
        .collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
      val want = graft.queries.Registry.all
        .find(_.name == "dedup_incremental").get.fn(spark, SfDir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
      assert(got.size == want.size, s"${got.size} vs ${want.size} verdicts")
      want.foreach { case (id, v) =>
        assert(got(id) == v, s"doc $id: indexed stream ${got(id)} != batch $v")
      }
    } finally q.stop()
  }
}
