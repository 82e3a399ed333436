package graft.search

import graft.functions.TextFunctions.fingerprint
import graft.queries.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted dedup signature index — the "build once, probe many" half of
  * the 100 TB incremental-dedup story, the signature-table analogue of
  * [[IvfIndex]]: the corpus's content fingerprints and MinHash band
  * buckets are materialized ONCE at write time, and every later shard
  * (batch or streaming) probes the persisted tables instead of re-running
  * the shingle+minhash kernel over the corpus per query
  * (`dedup_incremental` derives the same two tables in-query from the
  * fixture split — correct, but it re-pays the corpus kernel on every
  * run; this is the production form its Scaladoc promises).
  *
  * Layout: `path/fp` holds the distinct 128-bit content fingerprints;
  * `path/bands` holds the distinct (band_idx, band_hash) buckets,
  * PARTITIONED BY band_idx — a per-band probe (the streaming per-band
  * join shape) filters on the literal band_idx and prunes to one
  * partition directory at file-listing time, `nBands`-fold less I/O.
  * Within each partition the bucket hashes are sorted, so parquet
  * min/max row-group stats also prune hash-range misses.
  *
  * Incremental growth: a new shard's own signatures are exactly
  * `probe`'s join inputs — append them with [[append]] after flagging,
  * and the index stays current without ever re-reading the corpus. */
object DedupIndex {

  /** Materialize both signature tables from a raw corpus. One
    * shingle+minhash pass + two distinct aggregates; the band write is
    * repartitioned on band_idx so each partition directory is written by
    * one task (no small-files churn). */
  def build(docs: DataFrame, path: String): Unit = {
    import docs.sparkSession.implicits._
    docs.select(fingerprint($"text").as("fp")).distinct()
      .write.mode("overwrite").parquet(s"$path/fp")
    TextOps.bandRelation(docs)
      .select($"band_idx", $"band_hash").distinct()
      .repartition($"band_idx")
      .sortWithinPartitions($"band_hash")
      .write.mode("overwrite").partitionBy("band_idx").parquet(s"$path/bands")
  }

  /** Append a flagged shard's signatures (dedup between the shard's own
    * docs is the shard-local `dedup_exact`/`lsh_pairs` pass, declared). */
  def append(docs: DataFrame, path: String): Unit = {
    import docs.sparkSession.implicits._
    docs.select(fingerprint($"text").as("fp")).distinct()
      .write.mode("append").parquet(s"$path/fp")
    TextOps.bandRelation(docs)
      .select($"band_idx", $"band_hash").distinct()
      .repartition($"band_idx")
      .sortWithinPartitions($"band_hash")
      .write.mode("append").partitionBy("band_idx").parquet(s"$path/bands")
  }

  /** Merge per-append files in both signature tables — the periodic
    * counterweight [[append]]'s Scaladoc promises. The band rewrite
    * re-sorts by band_hash (probes lean on within-file hash order for
    * row-group stats pruning; concatenated sorted files lose it); the
    * flat fp table needs no ordering. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024)
      : graft.sources.Layout.CompactionStats = {
    val fpStats = graft.sources.Layout.compact(spark, s"$path/fp", targetBytes)
    val bandStats = graft.sources.Layout.compact(spark, s"$path/bands",
      targetBytes, rewrite = _.sortWithinPartitions(col("band_hash")))
    graft.sources.Layout.CompactionStats(
      fpStats.partitionsCompacted + bandStats.partitionsCompacted,
      fpStats.filesBefore + bandStats.filesBefore,
      fpStats.filesAfter + bandStats.filesAfter,
      fpStats.leavesSkipped + bandStats.leavesSkipped,
      fpStats.trashRecovered + bandStats.trashRecovered)
  }

  /** The persisted fingerprint table (fp: string). */
  def fingerprints(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/fp")

  /** The persisted band table (band_hash: string, band_idx: int). */
  def bands(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/bands")

  /** Flag each document of `shard` against the indexed corpus: exact
    * (fingerprint seen) and near (any shared band bucket) — identical
    * verdict semantics to the `dedup_incremental` gate query, with the
    * corpus side a plain parquet scan of the persisted tables. Two
    * shard-sized semi-joins against corpus-sized build sides; zero pair
    * formation, zero corpus recompute. */
  def probe(spark: SparkSession, path: String, shard: DataFrame): DataFrame = {
    import spark.implicits._
    val dupExact = shard.select($"doc_id", fingerprint($"text").as("fp"))
      .join(fingerprints(spark, path), Seq("fp"), "left_semi")
      .select($"doc_id").withColumn("de", lit(true))
    val dupNear = TextOps.bandRelation(shard)
      .join(bands(spark, path), Seq("band_idx", "band_hash"), "left_semi")
      .select($"doc_id").distinct().withColumn("dn", lit(true))
    shard.select($"doc_id")
      .join(dupExact, Seq("doc_id"), "left")
      .join(dupNear, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"de", lit(false)).as("dup_exact"),
        coalesce($"dn", lit(false)).as("dup_near"))
  }
}
