package graft.search

import graft.functions.VectorFunctions.{cosineToConst, matVec, packSignBits}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN sign-bucket index — the "build once, probe many" form of
  * the inline `ann_lsh`/`ann_rerank` bucket probe, completing the trio
  * with [[IvfIndex]] (centroid partitions) and [[DedupIndex]] (minhash
  * band partitions): the [[graft.queries.VectorOps.AnnBits]]-bit sign
  * bucket is computed ONCE at write time and becomes a PARTITION COLUMN,
  * so a probe's multi-probe predicate (query bucket + every 1-bit
  * neighbor) prunes at file-listing time — (1+bits) of 2^bits partitions
  * touched, ~3.5% of the corpus at the default 8 bits — instead of
  * re-hashing every vector per query, which is what the inline gate query
  * must do without a persisted layout.
  *
  * Scale shape: the build is one scan-side kernel pass + a
  * repartition-by-bucket write (one file per non-empty bucket partition,
  * no small-files churn); a probe never reads index metadata at all — the
  * probe set is pure bit arithmetic on the query vector (contrast IVF,
  * which reads the nlist-row centroid table), so the only IO is the
  * pruned data scan itself. Probing then runs the full ann_rerank
  * composition on the survivors: JL-projected shortlist (16-d, 4× cheaper
  * per row) → exact 64-d cosine on the constant-size shortlist.
  * AnnIndexSpec proves probe == inline `ann_rerank` AND that the probe
  * scan lists exactly the non-empty probed partitions' files.
  */
object AnnIndex {

  /** Write `embeddings` partitioned by sign bucket of the first `bits`
    * dims (bucket values 0 .. 2^bits-1; NULL/short vectors land in the
    * bucket their defined sign pattern produces, same as the inline
    * probe's `packSignBits`). The 16-d JL projection is ALSO computed at
    * write time (`proj` column — the same `matVec` the inline query runs
    * per probe), so the probe's shortlist stage reads 16 doubles per row
    * and never touches the 64-d vectors until the rerank — the
    * "projections are write-time columns" claim of SCALE.md, executable. */
  /** Bulk writes land under `batch_id = -1`: ONE partition layout —
    * `(batch_id, bucket)` — for bulk builds, shard appends AND the
    * streaming [[appendBatch]], so a store that mixes a bulk build with
    * streaming maintenance (the natural build-then-maintain sequence)
    * stays readable. Two top-level layouts (`bucket=` next to
    * `batch_id=`) would fail Spark's partition discovery with
    * "Conflicting directory structures". */
  val BulkBatchId = -1L

  /** Fail fast if `path/index` was built with the pre-`batch_id` layout
    * (top-level `bucket=` dirs). Appending the current `(batch_id,
    * bucket)` layout next to it would poison the store: Spark's
    * partition discovery throws "Conflicting directory structures" on
    * the MIXED store only at read time, after the bad write already
    * landed (ADVICE r9). Nothing migrates in place — partition values
    * live in dir names, so a migration is a rewrite anyway; a rebuild
    * IS the migration. */
  private def requireBatchIdLayout(spark: SparkSession, path: String): Unit = {
    val idx = new org.apache.hadoop.fs.Path(s"$path/index")
    val fs = idx.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(idx) &&
        fs.listStatus(idx).exists(s =>
          s.isDirectory && s.getPath.getName.startsWith("bucket="))) {
      throw new IllegalStateException(
        s"ANN index at $path has the legacy top-level bucket= layout; " +
        "appends write (batch_id, bucket) and would corrupt partition " +
        "discovery. Rebuild the index with AnnIndex.build(...) first.")
    }
  }

  def build(embeddings: DataFrame, path: String,
      bits: Int = graft.queries.VectorOps.AnnBits,
      rpRows: Seq[Seq[Double]] = graft.queries.VectorOps.RpRows): Unit = {
    import embeddings.sparkSession.implicits._
    embeddings
      .withColumn("bucket", packSignBits($"embedding", bits))
      .withColumn("proj", matVec($"embedding", rpRows))
      .withColumn("batch_id", lit(BulkBatchId))
      .repartition($"bucket") // one task → one file per bucket partition
      .write.mode("overwrite").partitionBy("batch_id", "bucket")
      .parquet(s"$path/index")
  }

  /** Append a new shard of vectors to an existing index — the daily
    * maintenance write of a growing corpus (the [[DedupIndex.append]]
    * counterpart). Sign buckets are corpus-independent (pure bit
    * arithmetic on each vector), so appended rows land in exactly the
    * partitions a rebuild would put them in: probe(append) ≡
    * probe(rebuild) row-for-row (AnnIndexSpec). Appends create one new
    * file per touched bucket per shard — `sources/Layout.compact` is the
    * periodic counterweight. */
  def append(newVectors: DataFrame, path: String,
      bits: Int = graft.queries.VectorOps.AnnBits,
      rpRows: Seq[Seq[Double]] = graft.queries.VectorOps.RpRows): Unit = {
    import newVectors.sparkSession.implicits._
    requireBatchIdLayout(newVectors.sparkSession, path)
    newVectors
      .withColumn("bucket", packSignBits($"embedding", bits))
      .withColumn("proj", matVec($"embedding", rpRows))
      .withColumn("batch_id", lit(BulkBatchId))
      .repartition($"bucket")
      .write.mode("append").partitionBy("batch_id", "bucket")
      .parquet(s"$path/index")
  }

  /** Batch-IDEMPOTENT append — the streaming-maintenance write
    * ([[graft.streaming.PromotionStream]] wires freshly promoted Tier-2
    * vectors in here per micro-batch). A plain [[append]] replayed after
    * a crash-before-checkpoint would double its rows; this write stamps
    * the deterministic `batchId` as the OUTER partition level and uses
    * dynamic partition overwrite, so a replay of batch N rewrites
    * exactly the `(batch_id=N, bucket=*)` partitions it produced (same
    * input → same rows) and touches no other batch (the bulk level
    * `batch_id = -1` included) — the Tier-2 exactly-once trick applied
    * to the index. Probes filter on `bucket`, which prunes at
    * file-listing time at its nesting level regardless of how many
    * batch_id levels exist above it. */
  def appendBatch(newVectors: DataFrame, path: String, batchId: Long,
      bits: Int = graft.queries.VectorOps.AnnBits,
      rpRows: Seq[Seq[Double]] = graft.queries.VectorOps.RpRows): Unit = {
    import newVectors.sparkSession.implicits._
    requireBatchIdLayout(newVectors.sparkSession, path)
    newVectors
      .withColumn("bucket", packSignBits($"embedding", bits))
      .withColumn("proj", matVec($"embedding", rpRows))
      .withColumn("batch_id", lit(batchId))
      .repartition($"bucket")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "bucket")
      .parquet(s"$path/index")
  }

  /** The multi-probe bucket set for query `q`: its own bucket plus every
    * 1-bit flip — the same set the inline `ann_lsh`/`ann_rerank` probe
    * filters on. Pure arithmetic; no IO. */
  def probeBuckets(q: Seq[Double],
      bits: Int = graft.queries.VectorOps.AnnBits): Seq[Long] = {
    val qBucket = (0 until bits)
      .foldLeft(0L)((acc, i) => if (q(i) > 0) acc | (1L << i) else acc)
    qBucket +: (0 until bits).map(b => qBucket ^ (1L << b))
  }

  /** prune (partition-pruned scan) → shortlist (projected cosine) →
    * rerank (exact cosine), identical row-for-row to the inline
    * `ann_rerank` gate query. */
  def probe(spark: SparkSession, path: String,
      q: Seq[Double] = graft.queries.VectorOps.Q,
      k: Int = graft.queries.VectorOps.AnnK,
      bits: Int = graft.queries.VectorOps.AnnBits,
      shortlistN: Int = graft.queries.VectorOps.RerankShortlist,
      qProj: Seq[Double] = graft.queries.VectorOps.RpQ): DataFrame = {
    import spark.implicits._
    val probes = probeBuckets(q, bits)
    // shortlist scores the STORED 16-d projection (write-time column —
    // bit-identical to re-projecting, since matVec's doubles round-trip
    // parquet exactly); the 64-d vectors are read for the same pruned
    // rows but only the rerank touches them
    val shortlist = spark.read.parquet(s"$path/index")
      .filter($"bucket".isin(probes: _*)) // literal predicate → partition pruning
      .select($"vec_id", $"label", $"embedding",
        round(cosineToConst($"proj", qProj), 6).as("pscore"))
      .orderBy($"pscore".desc, $"vec_id")
      .limit(shortlistN)
    shortlist
      .select($"vec_id", $"label",
        round(cosineToConst($"embedding", q), 6).as("score"), $"pscore")
      .orderBy($"score".desc, $"vec_id")
      .limit(k)
  }

  // dir → built index path: a gate query (`ann_rerank_indexed`) pays the
  // build once per JVM and every later invocation is probe-only — the
  // honest build-once/probe-many cost profile, and what the bench's
  // min-of-N steady-state measures.
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Index path for the embeddings table under `dir`, building on first
    * use (per JVM). */
  def indexFor(spark: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("annidx").toString
      build(graft.Tables.embeddings(spark, dir), p)
      p
    })
}
