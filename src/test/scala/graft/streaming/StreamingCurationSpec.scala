package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.queries.{CurationOps, TextOps}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The per-row curation stages (quality score, repetition score, PII
  * scrub) compose with watermarked streaming dedup into ONE streaming
  * curation pass — proving the native curation expressions run under
  * streaming codegen, not only in batch plans. */
class StreamingCurationSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("dedup + quality gate + PII scrub + repetition in one stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")

    val curated = StreamingDedup.dedupByContent(docs)
      .withColumn("quality", graft.functions.TextFunctions.qualityScore($"text"))
      .withColumn("repetition", CurationOps.repetitionCol($"text"))
      .withColumn("text", regexp_replace($"text", TextOps.EmailRe, "<EMAIL>"))

    val q = curated.writeStream.format("memory").queryName("stream_curated")
      .outputMode(OutputMode.Append()).start()
    try {
      val base = 1700000000L
      val good = "the quick brown fox jumps over the lazy dog and then " +
        "walks away to the river bank where it rests under a tree"
      input.addData(
        (ts(base + 1), 1L, s"$good contact me at fox@forest.example.org ok"),
        (ts(base + 2), 2L, s"$good contact me at fox@forest-example.org ok"),
        (ts(base + 3), 3L, "word word word word word word word word word word"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, text, quality, repetition FROM stream_curated")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
        .sortBy(_._1)
      // docs 1 and 2 normalize to the same fingerprint? No — their emails
      // differ in one char ('.' vs '-', both stripped by the alnum
      // normalizer) → SAME fingerprint, so doc 2 must be dropped
      assert(rows.map(_._1).sameElements(Array(1L, 3L)), rows.mkString("; "))
      // PII scrubbed in-flight
      assert(rows(0)._2.contains("<EMAIL>") && !rows(0)._2.contains("@"))
      // repetition: the looping doc scores maximal, the prose doc low
      assert(rows(1)._4 > 0.8, s"loop doc repetition ${rows(1)._4}")
      assert(rows(0)._4 < 0.3, s"prose doc repetition ${rows(0)._4}")
      // quality computed per row under streaming codegen
      assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    } finally q.stop()
  }
}
