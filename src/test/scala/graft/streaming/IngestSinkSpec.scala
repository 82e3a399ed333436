package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.api.Via
import org.apache.spark.sql.DataFrame

/** The Tier-1 `foreachBatch` sink (VERDICT r9 item 1): idempotent
  * batchId-keyed appends with no `_spark_metadata`, so `Via.compactTier1`
  * works on the production streaming store — including UNDER live ingest
  * — and a kill/restart replays without loss or duplication. */
class IngestSinkSpec extends SparkSpec {

  private def otelLine(service: String, tsSec: Long, body: String): String =
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"$service"}}]},""" +
      s""""scopeLogs":[{"logRecords":[{"timeUnixNano":"${tsSec}000000000","severityText":"INFO",""" +
      s""""body":{"stringValue":"$body"}}]}]}]}"""

  // three consecutive UTC days; the max day is the open (skipped) leaf
  private val day1 = 1700000000L - (1700000000L % 86400)
  private val day2 = day1 + 86400
  private val day3 = day1 + 2 * 86400
  private val day1Dt = java.time.LocalDate.ofEpochDay(day1 / 86400).toString

  private def batchDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    rows.toDF("ts_sec", "body")
      .withColumn("dt", graft.analysis.DtPrune.dtOf(col("ts_sec")))
  }

  private def parquetNames(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).map(_.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
  }

  test("streaming store has no sink log and compacts under live ingest") {
    val work = Files.createTempDirectory("ingest-sink").toString
    val inDir = s"$work/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    val via = new Via(spark, work)
    // 6 input files x maxFilesPerTrigger=1 -> >=6 micro-batches, so the
    // two CLOSED day leaves fragment into several b<id>- files each
    (0 until 6).foreach { i =>
      val lines = Seq(
        otelLine("svc", day1 + 100 + i, s"d1 event $i"),
        otelLine("svc", day2 + 100 + i, s"d2 event $i"),
        otelLine("svc", day3 + 100 + i, s"d3 event $i"))
      Files.writeString(java.nio.file.Paths.get(s"$inDir/f$i.jsonl"),
        lines.mkString("\n"))
    }
    val q = IngestPipeline.start(spark, inDir, via.tier1Path,
      s"$work/ckpt", triggerMs = 10, maxFilesPerTrigger = 1)
    try {
      q.processAllAvailable()
      assert(!new java.io.File(s"${via.tier1Path}/_spark_metadata").exists,
        "foreachBatch sink must not write a FileStreamSink log")
      val before = spark.read.parquet(via.tier1Path)
        .select("body").collect().map(_.getString(0)).sorted
      assert(before.length == 18, s"all rows ingested: ${before.length}")
      val d1FilesBefore = parquetNames(s"${via.tier1Path}/dt=$day1Dt")

      // compact WHILE the query is live (it is idle but running)
      val stats = via.compactTier1(targetBytes = 128L * 1024 * 1024)
      assert(stats.partitionsCompacted == 2,
        s"both closed day leaves compacted: $stats")
      assert(stats.leavesSkipped == 1, s"open leaf skipped: $stats")
      assert(parquetNames(s"${via.tier1Path}/dt=$day1Dt").size
        < d1FilesBefore.size, "closed leaf must have fewer files")

      // stream keeps working after the swap: feed one more file
      Files.writeString(java.nio.file.Paths.get(s"$inDir/f9.jsonl"),
        otelLine("svc", day1 + 999, "d1 late event"))
      q.processAllAvailable()
      val after = spark.read.parquet(via.tier1Path)
        .select("body").collect().map(_.getString(0)).sorted
      assert(after.length == 19, s"late row arrived: ${after.length}")
      assert(before.forall(after.contains), "compaction lost no row")
      assert(after.distinct.length == after.length, "no duplicates")
    } finally q.stop()
  }

  test("kill/restart replays without loss or duplication") {
    val work = Files.createTempDirectory("ingest-restart").toString
    val inDir = s"$work/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    val tier1 = s"$work/tier1"
    Files.writeString(java.nio.file.Paths.get(s"$inDir/a.jsonl"),
      (0 until 5).map(i => otelLine("svc", day1 + i, s"phase1 $i")).mkString("\n"))
    val q1 = IngestPipeline.start(spark, inDir, tier1, s"$work/ckpt")
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(tier1).count() == 5)

    Files.writeString(java.nio.file.Paths.get(s"$inDir/b.jsonl"),
      (0 until 4).map(i => otelLine("svc", day1 + 50 + i, s"phase2 $i")).mkString("\n"))
    val q2 = IngestPipeline.start(spark, inDir, tier1, s"$work/ckpt")
    q2.processAllAvailable(); q2.stop()
    val bodies = spark.read.parquet(tier1)
      .select("body").collect().map(_.getString(0)).sorted
    assert(bodies.length == 9, s"restart lost/duplicated rows: ${bodies.toSeq}")
    assert(bodies.distinct.length == 9)
  }

  test("replay of a committed batch is a no-op; a crashed attempt converges") {
    val tier1 = Files.createTempDirectory("ingest-idem").toString + "/t1"
    val rows = Seq((day1 + 1, "r0"), (day1 + 2, "r1"), (day2 + 1, "r2"))
    IngestPipeline.appendBatchIdempotent(batchDf(rows), tier1, 0)
    assert(spark.read.parquet(tier1).count() == 3)
    // committed replay: marker short-circuits, content untouched
    IngestPipeline.appendBatchIdempotent(batchDf(rows), tier1, 0)
    assert(spark.read.parquet(tier1).count() == 3, "replay must be a no-op")

    // crash AFTER the moves, BEFORE the marker: delete the marker and
    // replay — delete-by-prefix wipes the leftovers, content converges
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val rows1 = Seq((day1 + 9, "s0"), (day2 + 9, "s1"))
    IngestPipeline.appendBatchIdempotent(batchDf(rows1), tier1, 1)
    val marker = new org.apache.hadoop.fs.Path(
      s"$tier1/${IngestPipeline.CommitLedgerDir}/1")
    assert(fs.delete(marker, false), "fixture: marker must exist")
    IngestPipeline.appendBatchIdempotent(batchDf(rows1), tier1, 1)
    val bodies = spark.read.parquet(tier1)
      .select("body").collect().map(_.getString(0)).sorted
    assert(bodies.toSeq == Seq("r0", "r1", "r2", "s0", "s1"),
      s"crashed-attempt replay must converge, got ${bodies.toSeq}")

    // crash MID-move (partial leftovers): drop one b2- file, replay
    val rows2 = Seq((day1 + 20, "t0"), (day2 + 20, "t1"))
    IngestPipeline.appendBatchIdempotent(batchDf(rows2), tier1, 2)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$tier1/${IngestPipeline.CommitLedgerDir}/2"), false)
    val d1Leaf = new java.io.File(s"$tier1/dt=$day1Dt")
    val b2 = d1Leaf.listFiles().filter(_.getName.startsWith("b2-"))
    assert(b2.nonEmpty, "fixture: batch-2 file in day-1 leaf")
    b2.foreach(f => assert(f.delete()))
    IngestPipeline.appendBatchIdempotent(batchDf(rows2), tier1, 2)
    val bodies2 = spark.read.parquet(tier1)
      .select("body").collect().map(_.getString(0)).sorted
    assert(bodies2.toSeq == Seq("r0", "r1", "r2", "s0", "s1", "t0", "t1"),
      s"partial-leftover replay must converge, got ${bodies2.toSeq}")
  }

  test("compaction skips uncommitted batch files; their replay still converges") {
    val work = Files.createTempDirectory("ingest-skipfile").toString
    val via = new Via(spark, work)
    // committed fragmentation in the day-1 leaf (closed: day-3 is open)
    (0 until 4).foreach { i =>
      IngestPipeline.appendBatchIdempotent(
        batchDf(Seq((day1 + i, s"c$i"), (day3 + i, s"open$i"))),
        via.tier1Path, i)
    }
    // batch 9 lands in the CLOSED day-1 leaf but its marker is lost
    // (in-flight / crashed attempt)
    IngestPipeline.appendBatchIdempotent(
      batchDf(Seq((day1 + 50, "u0"))), via.tier1Path, 9)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"${via.tier1Path}/${IngestPipeline.CommitLedgerDir}/9"), false)

    val stats = via.compactTier1(targetBytes = 128L * 1024 * 1024)
    assert(stats.partitionsCompacted == 1, stats.toString)
    val d1 = new java.io.File(s"${via.tier1Path}/dt=$day1Dt")
    val names = d1.listFiles().map(_.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
    assert(names.count(_.startsWith("b9-")) == 1,
      s"uncommitted b9- file must survive the rewrite BY NAME: ${names.toSeq}")
    assert(!names.exists(n => (0 until 4).exists(i => n.startsWith(s"b$i-"))),
      s"committed files must have been merged: ${names.toSeq}")

    // the replay now finds its leftover, deletes it, re-lands: no dupes
    IngestPipeline.appendBatchIdempotent(
      batchDf(Seq((day1 + 50, "u0"))), via.tier1Path, 9)
    val bodies = spark.read.parquet(via.tier1Path)
      .select("body").collect().map(_.getString(0)).sorted
    assert(bodies.count(_ == "u0") == 1,
      s"replay after compaction must not duplicate: ${bodies.toSeq}")
    assert(bodies.length == 9, s"expected 9 rows, got ${bodies.toSeq}")
  }

  test("window-probed tail stays exact under live streaming ingest") {
    val work = Files.createTempDirectory("ingest-tail").toString
    val inDir = s"$work/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    val via = new Via(spark, work)
    def fullTail(n: Int): Seq[String] =
      IngestPipeline.tail(spark.read.parquet(via.tier1Path), n, None)
        .collect().map(_.toString).sorted.toSeq
    def probedTail(n: Int): Seq[String] =
      via.tail(n).collect().map(_.toString).sorted.toSeq
    Files.writeString(java.nio.file.Paths.get(s"$inDir/f0.jsonl"),
      (0 until 40).map(i => otelLine("svc", day1 + i * 7, s"w0 event $i"))
        .mkString("\n"))
    val q = IngestPipeline.start(spark, inDir, via.tier1Path,
      s"$work/ckpt", triggerMs = 10, maxFilesPerTrigger = 1)
    try {
      q.processAllAvailable()
      assert(probedTail(10) == fullTail(10), "tail wrong after batch 0")
      // more waves land in many small uncompacted b<id>- files: the
      // footer anchor must track the advancing max and the probe must
      // stay row-identical to the full scan between every wave
      (1 to 3).foreach { wave =>
        Files.writeString(java.nio.file.Paths.get(s"$inDir/f$wave.jsonl"),
          (0 until 40).map(i =>
            otelLine("svc", day1 + wave * 300 + i * 7, s"w$wave event $i"))
            .mkString("\n"))
        q.processAllAvailable()
        assert(probedTail(10) == fullTail(10), s"tail diverged after wave $wave")
        assert(probedTail(10).nonEmpty)
      }
      // the newest rows really are the last wave's
      assert(via.tail(5).collect().forall(_.getAs[String]("body")
        .startsWith("w3")), "tail must serve the newest wave")
    } finally q.stop()
  }

  test("refuses a legacy FileStreamSink store with a migration message") {
    val work = Files.createTempDirectory("ingest-legacy").toString
    Files.createDirectories(
      java.nio.file.Paths.get(s"$work/tier1/_spark_metadata"))
    val e = intercept[IllegalArgumentException] {
      IngestPipeline.start(spark, s"$work/in", s"$work/tier1", s"$work/ckpt")
    }
    assert(e.getMessage.contains("_spark_metadata"))
    assert(e.getMessage.contains("fresh checkpoint"))
  }
}
