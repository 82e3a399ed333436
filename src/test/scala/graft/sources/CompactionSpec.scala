package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.{PromotionStream, StatefulDetector}
import org.apache.spark.sql.functions.col

/** `Layout.compact`: per-micro-batch small files collapse to
  * size-targeted files, row content is hash-identical, partition-column
  * values round-trip, already-compact partitions are untouched — and the
  * swap is safe under a CONCURRENTLY APPENDING PromotionStream (the
  * VERDICT r7 #6 gate: compaction only rewrites leaves that existed at
  * its listing snapshot; the appender only creates new ones). */
class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet") && !f.getName.startsWith(".")) Seq(f)
      else Seq.empty
    walk(new java.io.File(dir))
  }

  test("many small files per partition -> one; contents and partition values identical") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact").toString
    // 3 dt partitions x 8 single-row files each (repartition forces the
    // small-file shape a per-trigger appender produces)
    (0 until 24).map(i => (i.toLong, s"row $i", s"2026-01-0${i % 3 + 1}"))
      .toDF("id", "body", "dt")
      .repartition(8)
      .write.partitionBy("dt").mode("overwrite").parquet(tmp)
    val before = spark.read.parquet(tmp).collect().map(_.toString).sorted
    val filesBefore = parquetFiles(tmp).size
    assert(filesBefore >= 12, s"fixture not fragmented: $filesBefore files")

    val stats = Layout.compact(spark, tmp, targetBytes = 64L * 1024 * 1024)
    assert(stats.partitionsCompacted == 3, stats.toString)
    assert(stats.filesBefore == filesBefore.toLong)
    assert(stats.filesAfter == 3, s"expected 1 file per dt partition: $stats")
    assert(parquetFiles(tmp).size == 3)

    val got = spark.read.parquet(tmp).collect().map(_.toString).sorted
    assert(got.sameElements(before), "compaction changed row content")
    // dt landed back as a partition column with its values intact
    assert(spark.read.parquet(tmp).select("dt").distinct().count() == 3)
  }

  test("already-compact partitions are not rewritten") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-noop").toString
    (0 until 10).map(i => (i.toLong, s"2026-02-0${i % 2 + 1}"))
      .toDF("id", "dt").coalesce(1)
      .write.partitionBy("dt").mode("overwrite").parquet(tmp)
    val sig = parquetFiles(tmp).map(f => (f.getPath, f.lastModified)).sorted
    val stats = Layout.compact(spark, tmp, targetBytes = 64L * 1024 * 1024)
    assert(stats.partitionsCompacted == 0, stats.toString)
    assert(parquetFiles(tmp).map(f => (f.getPath, f.lastModified)).sorted == sig,
      "noop compaction must not touch files")
  }

  test("refuses a FileStreamSink store (_spark_metadata pins file names)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-sink").toString
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(tmp)
    Files.createDirectory(java.nio.file.Paths.get(tmp, "_spark_metadata"))
    val e = intercept[IllegalArgumentException] {
      Layout.compact(spark, tmp, targetBytes = 64L * 1024 * 1024)
    }
    assert(e.getMessage.contains("_spark_metadata"))
  }

  test("skipLeaf leaves the excluded partition fragmented and untouched") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-skip").toString
    (0 until 16).map(i => (i.toLong, s"2026-03-0${i % 2 + 1}"))
      .toDF("id", "dt").repartition(8)
      .write.partitionBy("dt").mode("overwrite").parquet(tmp)
    val openFiles = parquetFiles(s"$tmp/dt=2026-03-02")
      .map(f => (f.getPath, f.lastModified)).sorted
    val stats = Layout.compact(spark, tmp, targetBytes = 64L * 1024 * 1024,
      skipLeaf = _.getName == "dt=2026-03-02")
    assert(stats.leavesSkipped == 1, stats.toString)
    assert(stats.partitionsCompacted == 1, stats.toString)
    assert(parquetFiles(s"$tmp/dt=2026-03-01").size == 1)
    assert(parquetFiles(s"$tmp/dt=2026-03-02")
      .map(f => (f.getPath, f.lastModified)).sorted == openFiles,
      "skipped leaf must not be touched")
  }

  test("a swap-out stranded by a crash is restored on the next run") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-crash").toString
    (0 until 8).map(i => (i.toLong, "2026-04-01"))
      .toDF("id", "dt").repartition(4)
      .write.partitionBy("dt").mode("overwrite").parquet(tmp)
    val before = spark.read.parquet(tmp).collect().map(_.toString).sorted
    // simulate a crash between the two renames: leaf moved to trash,
    // swap-in never happened
    val leaf = java.nio.file.Paths.get(tmp, "dt=2026-04-01")
    val trash = java.nio.file.Paths.get(tmp, "_compact-dt=2026-04-01.old")
    Files.move(leaf, trash)
    assert(!Files.exists(leaf) && Files.exists(trash))
    val stats = Layout.compact(spark, tmp, targetBytes = 64L * 1024 * 1024)
    assert(stats.trashRecovered == 1, stats.toString)
    val after = spark.read.parquet(tmp).collect().map(_.toString).sorted
    assert(after.sameElements(before), "recovery must restore every row")
  }

  test("compaction under a concurrently appending PromotionStream loses nothing") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-live").toString
    val base = 1700000000L
    val th = StatefulDetector.Thresholds(
      noveltyMinCount = 2, freqMinCount = 2, freqSigma = 1.0, stdFloor = 0.5)
    def writeT1(rows: Seq[(String, Long)]): Unit =
      rows.zipWithIndex.map { case ((h, ts), i) =>
        (h, ts, "auth", "INFO", s"evt $i at $ts")
      }.toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
        .coalesce(1).write.mode("append").parquet(s"$tmp/tier1")

    // phase 1: one closed novelty window lands in Tier-2, then the query
    // keeps running while we compact
    writeT1(Seq.tabulate(3)(i => ("h1", base + i)))
    writeT1(Seq(("close1", base + 75)))
    val q = PromotionStream.start(spark, s"$tmp/tier1", s"$tmp/tier2",
      s"$tmp/ckpt", rules = None, windowSec = 60,
      watermarkDelay = "10 seconds", thresholds = th,
      triggerMs = 50, stateTtlMs = None)
    try {
      q.processAllAvailable()
      val phase1 = spark.read.parquet(s"$tmp/tier2")
        .collect().map(_.toString).sorted
      assert(phase1.nonEmpty, "phase 1 must promote")

      // compact the existing partitions WHILE the stream stays live and
      // new batches land: feed phase 2 and compact in the same breath
      writeT1(Seq.tabulate(8)(i => ("h1", base + 120 + i)))
      writeT1(Seq(("close2", base + 4000)))
      val stats = Layout.compact(spark, s"$tmp/tier2",
        targetBytes = 64L * 1024 * 1024)
      q.processAllAvailable()

      // every phase-1 row survived the swap; phase-2 rows all arrived
      val after = spark.read.parquet(s"$tmp/tier2")
        .collect().map(_.toString).sorted
      assert(phase1.forall(after.contains),
        s"compaction lost promoted rows:\n before=${phase1.toSeq}\n after=${after.toSeq}")
      assert(after.size > phase1.size, "phase-2 promotion must have appended")
      assert(after.distinct.size == after.size, "no duplicated rows")
      assert(stats.filesBefore >= stats.filesAfter, stats.toString)
      // and the batch reference agrees with the final content (the
      // PromotionRecoverySpec gate, now WITH a mid-stream compaction)
      val allEvents = spark.read.parquet(s"$tmp/tier1")
        .select("rhythm_hash", "ts_sec")
      val batchAnoms = StatefulDetector.detect(allEvents, 60, thresholds = th).toDF()
      PromotionStream.promoteBatch(spark, batchAnoms,
        s"$tmp/tier1", s"$tmp/t2_ref", None, 60)
      def rows(path: String): Seq[String] =
        spark.read.parquet(path)
          .select("rhythm_hash", "anomaly_type", "anomaly_context", "start_ts",
            "end_ts", "count", "service", "severity", "body")
          .collect().map(_.toString).toSeq.sorted
      assert(rows(s"$tmp/tier2") == rows(s"$tmp/t2_ref"),
        "compacted + appended Tier-2 diverged from the batch reference")
    } finally q.stop()
  }

  test("a file committed into the leaf mid-compaction survives the swap") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-race").toString
    (0 until 8).map(i => (i.toLong, s"row $i", "2026-01-01"))
      .toDF("id", "body", "dt")
      .repartition(8).write.mode("overwrite").partitionBy("dt").parquet(tmp)
    // the race, made deterministic via the test seam: a "late event"
    // commit lands in the leaf AFTER the rewrite read its snapshot and
    // BEFORE the swap-out rename
    val stats = Layout.compact(spark, tmp, targetBytes = 1L << 30,
      onBeforeSwap = { _ =>
        Seq((99L, "late row", "2026-01-01")).toDF("id", "body", "dt")
          .coalesce(1).write.mode("append").partitionBy("dt").parquet(tmp)
      })
    assert(stats.partitionsCompacted == 1)
    val got = spark.read.parquet(tmp).select("id").as[Long].collect().toSet
    assert(got == (0L until 8L).toSet + 99L,
      s"late commit must survive compaction, got $got")
  }

  test("a file committed BETWEEN the two swap renames survives (leaf recreated by appender)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-race2").toString
    (0 until 8).map(i => (i.toLong, s"row $i", "2026-01-01"))
      .toDF("id", "body", "dt")
      .repartition(8).write.mode("overwrite").partitionBy("dt").parquet(tmp)
    // the ADVICE r9 window: the appender commits AFTER the swap-out
    // rename (the leaf dir is gone, the append recreates it) and BEFORE
    // the swap-in — the swap-in must fold the recreated leaf's files
    // into the trash and still land the rewrite, and the late-append
    // sweep must carry the commit into the rewritten leaf
    val stats = Layout.compact(spark, tmp, targetBytes = 1L << 30,
      onAfterSwapOut = { _ =>
        Seq((99L, "between-renames row", "2026-01-01"))
          .toDF("id", "body", "dt")
          .coalesce(1).write.mode("append").partitionBy("dt").parquet(tmp)
      })
    assert(stats.partitionsCompacted == 1)
    val got = spark.read.parquet(tmp).select("id").as[Long].collect().toSet
    assert(got == (0L until 8L).toSet + 99L,
      s"between-renames commit must survive compaction, got $got")
    assert(!new java.io.File(s"$tmp/_compact-dt%3D2026-01-01.old").exists,
      "trash must be dropped after a successful swap")
  }

  test("recovery restores originals when the leaf is an appender husk, not the rewrite") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-crash3").toString
    (0 until 6).map(i => (i.toLong, s"row $i", "2026-01-01"))
      .toDF("id", "body", "dt")
      .repartition(6).write.mode("overwrite").partitionBy("dt").parquet(tmp)
    val leaf = new java.io.File(s"$tmp/dt=2026-01-01")
    val originals = leaf.listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
    // crash state after a FAILED swap-in (ADVICE r9): originals sit in
    // the trash with a v2 manifest whose R-files never landed; the leaf
    // dir was recreated by a concurrent appender and holds ONLY its
    // commit. Pre-fix recovery mistook the husk for the rewrite and
    // deleted the trash — every original row.
    val trash = new java.io.File(s"$tmp/_compact-dt=2026-01-01.old")
    assert(leaf.renameTo(trash))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(trash.toString, "_compact_snapshot"),
      ("v2" +: (originals.map(n => s"S $n") :+
        "R part-rewrite-that-never-landed.parquet")).mkString("\n"))
    Seq((99L, "appender row", "2026-01-01")).toDF("id", "body", "dt")
      .coalesce(1).write.mode("append").partitionBy("dt").parquet(tmp)
    assert(leaf.exists, "fixture: appender must have recreated the leaf")

    val stats = Layout.compact(spark, tmp, targetBytes = 1L << 30)
    assert(stats.trashRecovered == 1, stats.toString)
    assert(!trash.exists, "trash must be consumed by the restore")
    val got = spark.read.parquet(tmp).select("id").as[Long].collect().toSet
    assert(got == (0L until 6L).toSet + 99L,
      s"recovery must restore originals AND keep the appender commit, got $got")
  }

  test("crash between swap-in and late sweep: recovery preserves the late file") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-crash2").toString
    (0 until 6).map(i => (i.toLong, s"row $i", "2026-01-01"))
      .toDF("id", "body", "dt")
      .repartition(6).write.mode("overwrite").partitionBy("dt").parquet(tmp)
    // run a normal compaction-with-late-commit, but simulate the crash by
    // reconstructing the post-swap-in pre-sweep state: rewritten leaf in
    // place, trash holding snapshot + late file + manifest
    val leaf = new java.io.File(s"$tmp/dt=2026-01-01")
    val snapshotNames = leaf.listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getName)
    Seq((99L, "late row", "2026-01-01")).toDF("id", "body", "dt")
      .coalesce(1).write.mode("append").partitionBy("dt").parquet(tmp)
    // manifest: the pre-late snapshot
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(leaf.toString, "_compact_snapshot"),
      snapshotNames.mkString("\n"))
    // "crash state": the whole leaf (snapshot + late + manifest) is the
    // trash; the rewritten leaf is a fresh compaction of ONLY the snapshot
    val trash = new java.io.File(s"$tmp/_compact-dt=2026-01-01.old")
    assert(leaf.renameTo(trash))
    spark.read.parquet(snapshotNames.map(n => s"$trash/$n"): _*)
      .coalesce(1).write.parquet(leaf.toString)
    // next run's recovery must move the late file into the leaf
    Layout.compact(spark, tmp, targetBytes = 1L << 30)
    assert(!trash.exists, "trash must be dropped after recovery")
    val got = spark.read.parquet(tmp).select("id").as[Long].collect().toSet
    assert(got == (0L until 6L).toSet + 99L,
      s"recovery must preserve the late commit, got $got")
  }

  test("tail: stats path == distributed fallback at every compaction race window") {
    // VERDICT r12 item 8: Via.tail anchors its probe on driver-side
    // footer stats; a live compaction swap can yank files and whole
    // leaves between tail's listing, its footer reads, and its scan. At
    // BOTH seam windows (rewrite-written→swap-out, swap-out→swap-in) the
    // stats-anchored tail must return exactly what the plain full scan
    // returns AT THAT INSTANT — readers racing a swap may transiently
    // miss the mid-swap leaf (the documented window every swap-based
    // maintenance op shares), but the stats path must never diverge from
    // the fallback's view of the same racing store.
    import spark.implicits._
    val via = new graft.api.Via(spark,
      Files.createTempDirectory("tailrace").toString)
    def otel(ts: Long, body: String) =
      s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc"}}]},""" +
        s""""scopeLogs":[{"logRecords":[{"timeUnixNano":"${ts}000000000","severityText":"INFO",""" +
        s""""body":{"stringValue":"$body"}}]}]}]}"""
    val now = 1700000000L
    // two days, each fragmented by several appends (real footer spread)
    (0 until 4).foreach { b =>
      via.ingestBatch((0 until 10).map(i =>
        otel(now - 86400 + b * 100 + i, s"oldday b$b i$i")).toDF("value"))
      via.ingestBatch((0 until 10).map(i =>
        otel(now + b * 100 + i, s"newday b$b i$i")).toDF("value"))
    }
    var checks = 0
    def check(tag: String): Unit = {
      val probe = via.tail(n = 12).collect().map(_.toString).sorted.toSeq
      val full = graft.streaming.IngestPipeline
        .tail(spark.read.parquet(via.tier1Path), 12, None)
        .collect().map(_.toString).sorted.toSeq
      assert(probe == full, s"stats tail diverged from full scan: $tag")
      checks += 1
    }
    check("before compaction")
    Layout.compact(spark, via.tier1Path, targetBytes = 1L << 30,
      onBeforeSwap = { leaf =>
        // a late commit lands in the leaf inside the race window, THEN
        // tail runs: the footer anchor must see the same store state the
        // full scan sees (including the brand-new max ts)
        via.ingestBatch(Seq(otel(now + 5000,
          s"late during ${leaf.getName}")).toDF("value"))
        check(s"listing->swap window (${leaf.getName})")
      },
      onAfterSwapOut = { leaf =>
        // the leaf is GONE mid-swap: both paths transiently miss it, and
        // they must miss it IDENTICALLY
        check(s"swap-out->swap-in window (${leaf.getName})")
      })
    check("after compaction")
    // both days' seams actually fired (2 leaves × 2 windows + 2 ends)
    assert(checks == 6, s"expected all race windows exercised, got $checks")
  }
}
