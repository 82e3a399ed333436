package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-flight exact deduplication for streaming corpus ingest — the
  * streaming analogue of the batch `dedup_exact` operator: fingerprint the
  * normalized content, keep the FIRST arrival, drop re-arrivals.
  *
  * Built on `dropDuplicatesWithinWatermark`, so the dedup state is
  * watermark-bounded: a fingerprint is remembered only within the event-
  * time delay and evicted afterwards — the property that makes streaming
  * dedup viable at 100 TB/day (unbounded `dropDuplicates` state would grow
  * with the corpus forever; re-arrivals later than the horizon are a batch
  * compaction's job, declared). State is keyed by the 128-bit fingerprint,
  * not the text, so per-key state is constant-size.
  */
object StreamingDedup {

  /** Drop in-flight duplicates of `textCol` (exact content matches after
    * lowercase/alnum normalization — same fingerprint as `dedup_exact`).
    * `tsCol` must be a TimestampType event-time column; `delay` is the
    * dedup horizon AND the lateness bound. */
  def dedupByContent(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      delay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming incremental dedup — the streaming form of the batch
    * `dedup_incremental` operator: each micro-batch of incoming documents
    * probes the EXISTING corpus's fingerprint and MinHash-band tables
    * (static side; at warehouse scale these are the materialized
    * signature tables, re-read per batch so slowly-growing corpora are
    * picked up) and every incoming doc emits one verdict row
    * `(doc_id, ts, dup_exact, dup_near)`.
    *
    * Single-pass stream shape: joining two DERIVATIVES of one stream
    * would be a stream–stream join (state, watermarks, delayed output),
    * so the near probe never re-keys the stream — each of the
    * [[graft.queries.TextOps.MinhashK]]/[[graft.queries.TextOps.BandSize]]
    * band keys gets its own stream–static LEFT join against that band's
    * distinct static hash set (≤1 match per join, so no row
    * multiplication), and the flags OR together per row. Every join is
    * stateless (static side rebuilt per batch); the stream is scanned
    * once, keeps no state, and emits in append mode at any stream age. */
  def incrementalFlags(
      stream: DataFrame,
      corpus: DataFrame,
      tsCol: String = "ts"): DataFrame = {
    import graft.queries.TextOps
    val spark = corpus.sparkSession
    import spark.implicits._
    // The static probe tables are PERSISTED: without the cache every
    // micro-batch would recompute the full-corpus shingle+minhash kernel
    // once per band join (16×) plus once for the fingerprints. The cost is
    // that the corpus snapshot is frozen at first materialization — a
    // growing corpus is picked up by restarting the query, or by probing a
    // materialized [[graft.search.DedupIndex]] via [[incrementalFlagsIndexed]]
    // (cheap partition-pruned parquet scans, no in-memory corpus state).
    // The cached blocks live for the streaming query's lifetime; callers
    // running many queries in one session should prefer the index path.
    val exFp = corpus
      .select(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exBands = TextOps.bandRelation(corpus)
      .select($"band_idx", $"band_hash").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    flagsAgainst(stream, exFp, exBands, tsCol)
  }

  /** [[incrementalFlags]] probing a persisted [[graft.search.DedupIndex]]
    * instead of deriving the corpus signature tables in-query: the static
    * side of every per-band join is a parquet scan pruned to that band's
    * partition directory by the literal band_idx filter, so a micro-batch
    * costs 1/nBands of the band table per join and ZERO corpus-side
    * signature recompute — the production form at 100 TB, where the index
    * is built once at ingest and appended per flagged shard. */
  def incrementalFlagsIndexed(
      stream: DataFrame,
      indexPath: String,
      tsCol: String = "ts"): DataFrame = {
    val spark = stream.sparkSession
    flagsAgainst(stream,
      graft.search.DedupIndex.fingerprints(spark, indexPath),
      graft.search.DedupIndex.bands(spark, indexPath), tsCol)
  }

  /** The shared single-pass stream shape over any (fp) + (band_idx,
    * band_hash) static pair — see [[incrementalFlags]] for why each band
    * gets its own stream–static LEFT join. */
  private def flagsAgainst(
      stream: DataFrame,
      exFp: DataFrame,
      exBands: DataFrame,
      tsCol: String): DataFrame = {
    import graft.queries.TextOps
    import stream.sparkSession.implicits._
    val nBands = TextOps.MinhashK / TextOps.BandSize
    var cur = stream
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .withColumn("bands", TextOps.minhashBands(col("text")))
      .join(exFp.withColumn("de", lit(true)), Seq("fp"), "left")
    (0 until nBands).foreach { b =>
      val exB = exBands.filter($"band_idx" === b)
        .select($"band_hash".as(s"bh_$b"), lit(true).as(s"dn_$b"))
      cur = cur.join(exB, element_at($"bands", b + 1) === col(s"bh_$b"), "left")
    }
    val dn = (0 until nBands)
      .map(b => coalesce(col(s"dn_$b"), lit(false))).reduce(_ || _)
    cur.select(col("doc_id"), col(tsCol),
      coalesce($"de", lit(false)).as("dup_exact"), dn.as("dup_near"))
  }
}
