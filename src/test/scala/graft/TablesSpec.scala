package graft

import org.apache.spark.sql.types.LongType

/** `Tables.events`' timestamp normalization contract: the driver's parquet
  * has shipped `ts` as TIMESTAMP(NANOS) (read as a raw long) in earlier
  * rounds and TIMESTAMP(MICROS) (NTZ) now; every downstream operator uses
  * only the derived `ts_us`/`ts_sec` columns, which must mean "epoch
  * micros/seconds of the wall clock, treated as UTC" — DuckDB's
  * `epoch_us(ts)` convention — regardless of layout AND regardless of the
  * Spark session timezone (an NTZ→instant cast is session-zone-dependent;
  * the loader must compensate).
  */
class TablesSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("events exposes long ts_us/ts_sec with ts_sec = ts_us div 1e6") {
    val df = Tables.events(spark, SfDir)
    assert(df.schema("ts_us").dataType == LongType)
    assert(df.schema("ts_sec").dataType == LongType)
    val bad = df.filter("ts_sec != ts_us div 1000000").count()
    assert(bad == 0L)
  }

  test("ts_us is invariant under a non-UTC session timezone") {
    val utc = Tables.events(spark, SfDir)
      .selectExpr("event_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val ny = Tables.events(spark, SfDir)
        .selectExpr("event_id", "ts_us").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ny == utc)
    } finally spark.conf.set(tzKey, saved)
  }

  test("ts_us is invariant under a non-UTC session even in the DST fold hour") {
    // 2025-11-02 01:30:00 lies in America/New_York's REPEATED wall hour
    // (the clocks-back fold): an NTZ→instant cast there resolves to one
    // of two instants, so any loader path that round-trips through an
    // instant cast is ambiguous (ADVICE r9). The field-based path must
    // return the UTC reading exactly. The driver fixture avoids fold
    // hours, so this plants its own one-row events.parquet.
    val dir = java.nio.file.Files.createTempDirectory("graft-fold").toString
    spark.sql(
      """select 1L as event_id,
                timestamp_ntz'2025-11-02 01:30:00' as ts,
                1L as user_id, 'click' as event_type,
                1.0d as value, '{}' as props""")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val expectUs = 1762047000000000L // 2025-11-02T01:30:00Z
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      Seq("UTC", "America/New_York").foreach { tz =>
        spark.conf.set(tzKey, tz)
        val got = Tables.events(spark, dir)
          .selectExpr("ts_us").collect().map(_.getLong(0)).toSeq
        assert(got == Seq(expectUs), s"session tz $tz")
      }
    } finally spark.conf.set(tzKey, saved)
  }

  test("ts_us matches the parquet wall clock read as UTC") {
    // Independent recompute from wall-clock FIELDS (all zone-independent
    // on a naive timestamp): days-since-epoch, h/m, and exact decimal
    // seconds — no instant casts anywhere.
    val df = Tables.events(spark, SfDir)
    val bad = df.selectExpr(
      "ts_us",
      """unix_date(cast(ts as date)) * 86400000000L
         + hour(ts) * 3600000000L + minute(ts) * 60000000L
         + cast(date_part('SECOND', ts) * 1000000 as bigint) AS expect""")
      .filter("ts_us != expect").count()
    assert(bad == 0L)
  }
}
