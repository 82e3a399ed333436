package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout levers for the warehouse path: bucketing for
  * co-located joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
  * sides. Writing the tables bucketed on the join key (same bucket count,
  * same key) makes the partitioning part of the STORED layout: Catalyst
  * recognizes the matching `HashPartitioning` on both scans and plans a
  * sort-merge join with ZERO Exchange — each task reads bucket i of both
  * tables. The price is paid once at write time (one shuffle into
  * buckets), then every subsequent join, aggregate or dedup keyed on the
  * bucket column is exchange-free; for append-heavy fact tables that
  * ratio is strongly in bucketing's favor.
  *
  * Bucketed tables go through the session catalog (`saveAsTable` — plain
  * `parquet(path)` cannot record bucket metadata). BucketedJoinSpec
  * asserts the exchange-free plan shape end to end.
  */
object Layout {

  /** Write `df` as a bucketed catalog table (overwriting), bucketed AND
    * sorted by `key` into `buckets` files per partition — sorted buckets
    * let the merge join skip its sort when bucket files are read in
    * order. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** The co-located join of two same-key bucketed tables. Plain
    * `spark.table(a).join(spark.table(b), key)` — the exchange-free plan
    * comes from the stored layout, not from hints; this helper only names
    * the pattern. */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession,
      left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
