package graft.search

import graft.functions.TextFunctions.wordTokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted postings index for full-text word match — the
  * "build once, probe many" form of the P7 `text_match` scan (the
  * reference backs its full-text filter with a word-tokenized payload
  * index, `/root/reference/app/services/qdrant_service.py:95`; the
  * inline gate query re-tokenizes the whole corpus per query, the
  * honest cost this index exists to amortize — the [[DedupIndex]]
  * pattern applied to tokens).
  *
  * Layout: `path/postings` holds distinct (token, doc_id) pairs
  * PARTITIONED BY `tb` = murmur3(token) mod [[Buckets]] — a probe
  * filters on the LITERAL bucket set of its query tokens, pruning to
  * ≤ |query| of [[Buckets]] partition directories at file-listing time
  * (TextIndexSpec proves the listing count). Within each partition the
  * postings are sorted by token, so parquet min/max row-group stats
  * prune non-matching tokens inside a shared bucket too. Partitioning
  * by raw token would create unbounded tiny directories (vocabulary-
  * sized); hashing into a fixed bucket count keeps the directory fan-out
  * constant while preserving listing-time pruning — the same trade
  * [[DedupIndex]] makes with band_idx.
  *
  * AND-semantics probe: one scan of the pruned partitions restricted to
  * the query tokens, then `count(distinct token) == |query|` per doc —
  * a per-token semi-join batch expressed as a single aggregate; shuffle
  * volume is (matching docs × matched tokens), never corpus-sized.
  *
  * Incremental growth: [[append]] a new shard's postings, the
  * [[DedupIndex.append]] contract (one new file per touched bucket per
  * shard; `sources/Layout.compact` is the periodic counterweight). */
object TextIndex {

  val Buckets = 64

  /** Bucket of a token — `pmod(hash(token), Buckets)` exactly: the same
    * Murmur3(seed 42) Spark's `hash()` computes, evaluated driver-side
    * so probes can prune with literals. */
  def tokenBucket(token: String): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val h = Murmur3Hash(Seq(Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(token))), 42)
      .eval(null).asInstanceOf[Int]
    math.floorMod(h, Buckets)
  }

  private def postingsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", explode(wordTokens($"text")).as("token"))
      .distinct()
      .withColumn("tb", pmod(hash($"token"), lit(Buckets)))
  }

  /** Materialize the postings table: one tokenize+explode pass, distinct
    * (token, doc_id), one task per bucket partition (no small-files
    * churn), token-sorted within partitions. */
  def build(docs: DataFrame, path: String): Unit =
    postingsOf(docs)
      .repartition(col("tb"))
      .sortWithinPartitions(col("token"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")

  /** Append a new shard's postings (dedup across shards unnecessary:
    * doc_ids are disjoint between shards by contract). */
  def append(docs: DataFrame, path: String): Unit =
    postingsOf(docs)
      .repartition(col("tb"))
      .sortWithinPartitions(col("token"))
      .write.mode("append").partitionBy("tb").parquet(s"$path/postings")

  /** Merge per-append postings files inside each `tb=` bucket partition —
    * the periodic counterweight [[append]]'s Scaladoc promises. The
    * rewrite re-sorts by token: probes lean on within-file token order
    * for row-group stats pruning, and concatenating sorted files would
    * silently lose it. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024)
      : graft.sources.Layout.CompactionStats =
    graft.sources.Layout.compact(spark, s"$path/postings", targetBytes,
      rewrite = _.sortWithinPartitions(col("token")))

  /** doc_ids containing ALL of `query`'s word tokens (the `matchText`
    * AND semantics), via the pruned postings scan. Empty-token queries
    * match everything — callers short-circuit like the inline form. */
  def probe(spark: SparkSession, path: String, query: String): DataFrame = {
    import spark.implicits._
    val qTokens = query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
    require(qTokens.nonEmpty,
      "empty token set matches every document — no probe needed")
    val buckets = qTokens.map(tokenBucket).distinct.toSeq
    spark.read.parquet(s"$path/postings")
      .filter($"tb".isin(buckets: _*)) // literal predicate → partition pruning
      .filter($"token".isin(qTokens.toSeq: _*)) // row-group stats prune here
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("nt")) // (token, doc_id) distinct at build time
      .filter($"nt" === qTokens.length)
      .select($"doc_id")
  }

  // dir → built index path: the gate query pays the build once per JVM,
  // every later invocation is probe-only (AnnIndex.indexFor's pattern).
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Postings index for the documents table under `dir`, building on
    * first use (per JVM). */
  def indexFor(spark: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("textidx").toString
      build(graft.Tables.documents(spark, dir), p)
      p
    })
}
