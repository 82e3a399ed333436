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
}
