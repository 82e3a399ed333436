package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted INT8 scalar-quantization corpus statistics — the write-time
  * half of the reference's `ScalarQuantization(type=INT8, quantile=0.99)`
  * (`qdrant_service.py:84-90`; Qdrant computes the quantile when the
  * segment is written, never per search).
  *
  * `int8_corpus_topk` keeps the inline two-pass form as the oracle row —
  * the explode-all-components percentile pass there cost 1.3 s of its
  * 1.71 s at sf10 (4.3× DuckDB, VERDICT r16 item 3) because it re-runs
  * per query. This table makes it the one-time write-side pass the code
  * comment always claimed it should be: ONE row of parquet
  * (`bound` double, `n_vectors` long) stored next to the index family,
  * and the probe-only query reads it like BM25 reads its corpus stats.
  *
  * STALENESS SEMANTICS (same policy as the ANN index family's
  * append+fold maintenance): the bound is frozen at write time, so
  * appended vectors quantize under the OLD bound until the next
  * recompute — exactly Qdrant's behavior between segment optimizations.
  * A stale bound never breaks scoring correctness of existing vectors
  * (every stored code stays fixed); it only changes how hard NEW
  * outliers clip. Recompute on compaction / index fold — one linear
  * pass — or whenever the corpus grows materially; `Via.maintainIndexes`
  * is the natural hook. The gate's probe row builds the stats once per
  * JVM ([[statsFor]]) and reads them thereafter, the build-once/
  * probe-many profile every persisted index row uses.
  */
object Int8Stats {

  /** |component| quantile matching the reference config. */
  val Quantile = 0.99

  /** One linear pass over the embeddings: the [[Quantile]] of |x| across
    * every component of every vector, rounded to 6 dp (both engines
    * round identically, so a last-ulp interpolation difference cannot
    * flip a quantized component). Written as a single-row parquet. */
  def write(embeddings: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    embeddings
      .select(explode(col("embedding")).as("x"))
      .agg(
        round(expr(s"percentile(abs(cast(x as double)), $Quantile)"), 6)
          .as("bound"),
        count(lit(1)).as("n_components"))
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** The persisted stats relation (one row: bound, n_components). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build-once-per-JVM stats table for the gate/bench rows (the same
    * memo pattern as [[AnnIndex.indexFor]]): first call pays the one
    * linear pass, every later call is a one-row parquet read. */
  def statsFor(spark: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("int8stats").toString
      write(graft.Tables.embeddings(spark, dir), p)
      p
    })
}
