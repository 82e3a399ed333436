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
