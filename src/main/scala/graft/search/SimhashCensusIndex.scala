package graft.search

import graft.queries.SimhashOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained per-doc simhash near-dup census — the
  * streaming/append twin of the batch `simhash_dedup_stats` scale surface
  * (VERDICT r16 item 8): a live ingest pipeline gets the keep/drop signal
  * (`n_dups`, `min_hamming` per document) without ever materializing the
  * global pair listing, and without re-running the corpus×corpus band
  * join per shard.
  *
  * Layout at `path/`:
  *   - `sig/`    — the (doc_id, sh) 60-bit signature table, append-only.
  *   - `census/` — append-only DELTA rows (doc_id, n_dups, min_hamming).
  *     [[census]] folds deltas on read (sum / min — both associative and
  *     commutative, so delta order never matters); [[compact]] folds them
  *     physically. The LSM-style delta log is what makes an append touch
  *     O(shard × collision) rows instead of rewriting a corpus-sized
  *     census table — at 100 TB the census is as big as the corpus.
  *
  * Append math: for a corpus C and a NEW disjoint shard S, the pairs of
  * C∪S partition exactly into pairs-within-C (already counted at build or
  * by earlier appends), pairs-within-S (a self band join of the shard),
  * and cross pairs S×C (the shard's bands probing the persisted corpus
  * band relation — shard-sized stream side, no corpus recompute). Each
  * delta row carries one endpoint's contribution; summing deltas therefore
  * reproduces the batch census over C∪S EXACTLY (SimhashCensusSpec proves
  * build+append ≡ batch on a split corpus). Precondition: shard doc_ids
  * are new (the ingest contract every append-only store here shares) —
  * re-appending an id would double-count its pairs.
  *
  * Staleness: none — unlike a quantile stat, the census is exact after
  * every append. DELETES are out of scope (the reference pipeline only
  * appends; a delete would need tombstone deltas with negative counts —
  * min_hamming is not invertible, so a delete forces a rebuild of the
  * affected docs' rows; declared).
  */
object SimhashCensusIndex {

  /** Materialize signatures + the initial within-corpus census. */
  def build(docs: DataFrame, path: String): Unit = {
    val sig = SimhashOps.signatures(docs)
    sig.write.mode("overwrite").parquet(s"$path/sig")
    val spark = docs.sparkSession
    val bands = SimhashOps.explodeBands(sigTable(spark, path)).cache()
    try
      SimhashOps.censusOf(SimhashOps.pairsBetween(bands, bands, self = true))
        .write.mode("overwrite").parquet(s"$path/census")
    finally bands.unpersist()
  }

  /** Fold a new disjoint shard in: one shard self-join + one
    * shard-vs-corpus band probe, census deltas appended for BOTH the
    * shard's docs and the corpus docs they collide with. */
  def append(shard: DataFrame, path: String): Unit = {
    val spark = shard.sparkSession
    // the shard signature is written FIRST so a crash between the two
    // writes leaves sig ⊇ census (the next append would then double the
    // missing deltas if it re-sent the same shard — the ingest ledger
    // upstream owns exactly-once delivery, as everywhere in this repo)
    val newSig = SimhashOps.signatures(shard)
    newSig.write.mode("append").parquet(s"$path/sig")
    // corpus = everything persisted EXCEPT the shard just appended
    val shardIds = newSig.select(col("doc_id"))
    val corpusSig = sigTable(spark, path)
      .join(shardIds, Seq("doc_id"), "left_anti")
    val shardBands = SimhashOps
      .explodeBands(SimhashOps.signatures(shard)).cache()
    try {
      val within =
        SimhashOps.pairsBetween(shardBands, shardBands, self = true)
      val cross = SimhashOps.pairsBetween(
        shardBands, SimhashOps.explodeBands(corpusSig), self = false)
      SimhashOps.censusOf(within.unionByName(cross))
        .write.mode("append").parquet(s"$path/census")
    } finally shardBands.unpersist()
  }

  /** The folded census: one row per involved doc, exactly the batch
    * `simhash_dedup_stats` relation over everything built + appended. */
  def census(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/census")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_dups")).as("n_dups"),
        min(col("min_hamming")).as("min_hamming"))

  /** The persisted signature table (doc_id, sh). */
  def sigTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sig")

  /** Physically fold the delta log (and merge small sig files): the
    * periodic counterweight to per-shard appends, same contract as
    * [[DedupIndex.compact]]. The census rewrite pre-aggregates the
    * deltas so the folded file holds one row per doc again. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024)
      : graft.sources.Layout.CompactionStats = {
    val sigStats = graft.sources.Layout.compact(spark, s"$path/sig", targetBytes)
    val cStats = graft.sources.Layout.compact(spark, s"$path/census",
      targetBytes, rewrite = df => df.groupBy(col("doc_id"))
        .agg(sum(col("n_dups")).as("n_dups"),
          min(col("min_hamming")).as("min_hamming")))
    graft.sources.Layout.CompactionStats(
      sigStats.partitionsCompacted + cStats.partitionsCompacted,
      sigStats.filesBefore + cStats.filesBefore,
      sigStats.filesAfter + cStats.filesAfter,
      sigStats.leavesSkipped + cStats.leavesSkipped,
      sigStats.trashRecovered + cStats.trashRecovered)
  }
}
