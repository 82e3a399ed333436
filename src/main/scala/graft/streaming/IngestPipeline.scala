package graft.streaming

import graft.GraftFunctions
import graft.functions.TextFunctions.{rhythmHash, template}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Tier-1 ingest: OTel JSONL stream → derived columns → day-partitioned
  * parquet (S1→P1-P5→S4).
  *
  * Streaming analogue of the reference's HTTP batch path
  * (`/root/reference/app/api/v1/endpoints/ingest.py:10-16` →
  * `ingestion_service.py:44-71` → fire-and-forget Qdrant upsert
  * `qdrant_service.py:97-110`): each micro-batch ≡ one HTTP batch; the
  * append sink ≡ the upsert (UUID point ids ≡ `uuid()` column); the
  * thread/gRPC hop becomes the driver→executor task boundary.
  *
  * Scale shape: fully narrow — parse, project and write shuffle nothing;
  * `dt` partitioning gives the detector and tail queries partition pruning
  * for free. At 1000 executors this is embarrassingly parallel; the only
  * coordination is the streaming commit log.
  */
object IngestPipeline {

  /** P1-P3 derivations over canonical log columns (service, severity,
    * ts_sec, body) — shared by the batch and streaming paths. */
  def derive(logs: DataFrame): DataFrame = {
    GraftFunctions.register(logs.sparkSession)
    logs
      .withColumn("template", template(col("body")))
      .withColumn("rhythm_hash",
        rhythmHash(col("template"), col("service"), col("severity")))
      .withColumn("simhash", GraftFunctions.simhash64(col("template")))
      .withColumn("point_id", expr("uuid()"))
      .withColumn("dt", graft.analysis.DtPrune.dtOf(col("ts_sec")))
  }

  /** Batch ingest: raw OTel JSON strings → Tier-1 rows (no write). */
  def ingestBatch(rawJsonLines: DataFrame, jsonCol: String = "value"): DataFrame =
    derive(OTel.parseJson(rawJsonLines, jsonCol))

  /** Start the streaming ingest: JSONL files under `inputDir` → Tier-1
    * parquet at `tier1Path`, day-partitioned. `maxFilesPerTrigger` bounds
    * micro-batch size (the reference's MAX_BATCH_SIZE analogue, T1). */
  def start(
      spark: SparkSession,
      inputDir: String,
      tier1Path: String,
      checkpoint: String,
      triggerMs: Long = 500,
      maxFilesPerTrigger: Int = 16): StreamingQuery = {
    // read as TEXT, not .json(schema): parseJson keeps the ORIGINAL line in
    // full_log_json (a schema'd json read would re-serialize through
    // OTel.schema and drop unknown attributes / extra value arms — the
    // reference stores the raw record verbatim, ingestion_service.py:66)
    val raw = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(inputDir)
    derive(OTel.parseJson(raw))
      .writeStream
      .format("parquet")
      .option("path", tier1Path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("dt")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()
  }

  /** S3 — live tail: last `n` rows, optional case-insensitive substring
    * filter (`/root/reference/app/api/v1/endpoints/stream.py:12-34`; the
    * reference's oversampled deque read becomes an exact filter→top-k). */
  def tail(tier1: DataFrame, n: Int = 100, substring: Option[String] = None): DataFrame = {
    val base = substring.fold(tier1)(f =>
      tier1.filter(lower(col("body")).contains(f.toLowerCase)))
    base.orderBy(col("ts_sec").desc).limit(n)
  }
}
