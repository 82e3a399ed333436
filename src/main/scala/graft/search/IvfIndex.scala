package graft.search

import graft.functions.VectorFunctions.{cosine, cosineToConst}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the production "build once, probe many" shape of
  * the inline `ann_ivf` gate query: vector→centroid assignment is computed
  * once and written PARTITIONED BY CENTROID, so a probe reads only the
  * `nprobe` nearest partitions (real partition pruning, ≈ nprobe/nlist of
  * the corpus scanned) instead of re-assigning the whole corpus per query.
  *
  * Scale shape: the build is one broadcast-centroids pass + a
  * repartition-by-centroid write (one file per centroid partition, no
  * small-files churn); a probe collects only the `nprobe` winning centroid
  * ids (index METADATA, bounded by nlist — never corpus data) so the cid
  * filter is literal and prunes partitions at file-listing time.
  * IvfIndexSpec proves probe == inline ann_ivf AND that the probe scan
  * lists exactly nprobe files.
  */
object IvfIndex {

  /** Assign every vector to its nearest centroid (argmax cosine, tie →
    * min cid — same rule as `ann_ivf`) and persist index + centroids.
    * The seed-row quantizer the gate query pins; [[buildTrained]] is the
    * production entry point. */
  def build(embeddings: DataFrame, path: String,
      centroidIds: Seq[Long] = graft.queries.VectorOps.IvfCentroids): Unit = {
    import embeddings.sparkSession.implicits._
    val cents = embeddings.filter($"vec_id".isin(centroidIds: _*))
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    buildWith(embeddings, path, cents)
  }

  /** Train the coarse quantizer with [[KMeans]] (spherical Lloyd's, one
    * corpus scan per iteration) and build the index on the trained
    * centroids — the recall-bearing production build. Returns the
    * trained model so callers can record convergence. Centroid cids are
    * 0..k-1 (not corpus vec_ids); probes are unchanged — they read
    * whatever centroid table the build persisted. */
  def buildTrained(embeddings: DataFrame, path: String, k: Int = 16,
      dim: Int = 64): KMeans.Trained = {
    val t = KMeans.train(embeddings, k, dim = dim)
    buildWith(embeddings, path, t.toDf(embeddings.sparkSession))
    t
  }

  /** Build against an explicit centroid relation (`cid`, `cvec`) —
    * shared by the seed-row and trained paths. */
  def buildWith(embeddings: DataFrame, path: String,
      cents: DataFrame): Unit = {
    import embeddings.sparkSession.implicits._
    val assigned = embeddings.select($"vec_id", $"embedding")
      .crossJoin(broadcast(cents))
      .withColumn("cs", cosine($"embedding", $"cvec"))
      .groupBy($"vec_id")
      .agg(graft.GraftFunctions.maxByPrim(struct($"cid"), struct(coalesce($"cs", lit(-2d)), -$"cid")).getField("cid").as("cid"))
    embeddings.join(assigned, "vec_id")
      .repartition($"cid") // one task → one file per centroid partition
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/index")
    cents.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Append a new shard of vectors to an existing index — the daily
    * maintenance write of a growing corpus. New vectors are assigned
    * against the PERSISTED centroid table (the production IVF contract:
    * the coarse quantizer is frozen at build time; re-training is a
    * rebuild), so probe(append) ≡ probe(rebuild) as long as the centroid
    * set is unchanged (IvfIndexSpec). Appends create one new file per
    * touched centroid partition per shard — `sources/Layout.compact` is
    * the periodic counterweight. */
  def append(newVectors: DataFrame, path: String): Unit = {
    val spark = newVectors.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids")
    val assigned = newVectors.select($"vec_id", $"embedding")
      .crossJoin(broadcast(cents))
      .withColumn("cs", cosine($"embedding", $"cvec"))
      .groupBy($"vec_id")
      .agg(graft.GraftFunctions.maxByPrim(struct($"cid"), struct(coalesce($"cs", lit(-2d)), -$"cid")).getField("cid").as("cid"))
    newVectors.join(assigned, "vec_id")
      .repartition($"cid")
      .write.mode("append").partitionBy("cid").parquet(s"$path/index")
  }

  /** Merge the one-file-per-append accumulation inside each centroid
    * partition back toward one file per `targetBytes` — the periodic
    * counterweight [[append]]'s Scaladoc promises, now wired
    * ([[graft.sources.Layout.compact]] with its proven swap/recovery
    * machinery; appends into existing `cid=` leaves are exactly the
    * late-append race CompactionSpec covers). */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024)
      : graft.sources.Layout.CompactionStats =
    graft.sources.Layout.compact(spark, s"$path/index", targetBytes)

  /** Top-k by cosine to `q` over the `nprobe` nearest centroid partitions
    * of a built index. */
  def probe(spark: SparkSession, path: String,
      q: Seq[Double] = graft.queries.VectorOps.Q,
      k: Int = graft.queries.VectorOps.IvfK,
      nprobe: Int = graft.queries.VectorOps.IvfNprobe): DataFrame = {
    import spark.implicits._
    // index metadata read: nprobe winning cids (≤ nlist rows, never data)
    val probeIds = spark.read.parquet(s"$path/centroids")
      .select($"cid", cosineToConst($"cvec", q).as("qs"))
      .orderBy($"qs".desc, $"cid")
      .limit(nprobe)
      .select($"cid").as[Long].collect()
    spark.read.parquet(s"$path/index")
      .filter($"cid".isin(probeIds: _*)) // literal predicate → partition pruning
      .select($"vec_id", $"label",
        round(cosineToConst($"embedding", q), 6).as("score"))
      .orderBy($"score".desc, $"vec_id")
      .limit(k)
  }
}
