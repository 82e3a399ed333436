package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** The zone-map read path: exact bounds from parquet footer statistics,
  * and None (→ caller's distributed fallback) for every shape where the
  * stats can't PROVE the bound. */
class FooterStatsSpec extends SparkSpec {

  test("maxLong: exact max across multiple files, including negatives") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fstats").toString
    Seq(-5L, 3L, 17L).toDF("ts_sec").coalesce(1)
      .write.mode("append").parquet(dir)
    Seq(99L, 42L).toDF("ts_sec").coalesce(1)
      .write.mode("append").parquet(dir)
    Seq(-100L, -50L).toDF("ts_sec").coalesce(1)
      .write.mode("append").parquet(dir)
    assert(FooterStats.maxLong(spark, dir, "ts_sec") == Some(99L))
    // an all-negative store still proves its (negative) max
    val neg = Files.createTempDirectory("fstats-neg").toString
    Seq(-100L, -7L).toDF("ts_sec").write.mode("append").parquet(neg)
    assert(FooterStats.maxLong(spark, neg, "ts_sec") == Some(-7L))
  }

  test("maxLong declines when it cannot prove a bound") {
    import spark.implicits._
    // missing directory
    assert(FooterStats.maxLong(spark, "/nonexistent-fstats", "ts_sec").isEmpty)
    // column absent from the files
    val dir = Files.createTempDirectory("fstats2").toString
    Seq(1L, 2L).toDF("other").write.mode("append").parquet(dir)
    assert(FooterStats.maxLong(spark, dir, "ts_sec").isEmpty)
    // non-INT64 physical type (string column named ts_sec)
    val dir2 = Files.createTempDirectory("fstats3").toString
    Seq("a", "b").toDF("ts_sec").write.mode("append").parquet(dir2)
    assert(FooterStats.maxLong(spark, dir2, "ts_sec").isEmpty)
    // all-null column: stats carry no non-null value
    val dir3 = Files.createTempDirectory("fstats4").toString
    Seq(Some(1L), None, None).toDF("x")
      .selectExpr("CAST(NULL AS BIGINT) AS ts_sec")
      .write.mode("append").parquet(dir3)
    assert(FooterStats.maxLong(spark, dir3, "ts_sec").isEmpty)
  }

  test("maxLong: nulls mixed with values use the non-null max") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fstats5").toString
    Seq(Some(4L), None, Some(11L)).toDF("ts_sec")
      .write.mode("append").parquet(dir)
    assert(FooterStats.maxLong(spark, dir, "ts_sec") == Some(11L))
  }

  test("footer memo LRU: evicts the least-recently-read file, keeps hot ones") {
    import spark.implicits._
    // VERDICT r13 item 4: the old overflow handling cleared the WHOLE
    // memo; with LRU a hot footer survives a cold tail wider than the cap
    val dirs = (0 until 6).map { i =>
      val d = Files.createTempDirectory(s"fmemo$i").toString
      Seq(i.toLong, i.toLong + 10).toDF("ts_sec").coalesce(1)
        .write.mode("append").parquet(d)
      d
    }
    val savedCap = FooterStats.memoCap
    try {
      FooterStats.memoCap = 4
      FooterStats.memoReset()
      dirs.take(5).foreach(d =>
        assert(FooterStats.maxLong(spark, d, "ts_sec").isDefined))
      def names(d: String): Set[String] = {
        val f = new java.io.File(d).listFiles()
          .filter(f => f.isFile && !f.getName.startsWith(".")
            && !f.getName.startsWith("_"))
        f.map(_.getName).toSet
      }
      val after5 = FooterStats.memoFileNames.toSet
      // cap 4: the 5th insert evicted exactly the first dir's footer
      assert(names(dirs(0)).intersect(after5).isEmpty, "eldest evicted")
      assert(names(dirs(1)).subsetOf(after5), "recent entries kept")
      // re-reading dir1 refreshes recency; the 6th read then evicts dir2
      FooterStats.maxLong(spark, dirs(1), "ts_sec")
      FooterStats.maxLong(spark, dirs(5), "ts_sec")
      val after6 = FooterStats.memoFileNames.toSet
      assert(names(dirs(1)).subsetOf(after6), "hot footer survived")
      assert(names(dirs(2)).intersect(after6).isEmpty,
        "new eldest evicted, not clear()")
      assert(names(dirs(5)).subsetOf(after6))
    } finally {
      FooterStats.memoCap = savedCap
      FooterStats.memoReset()
    }
  }
}
