package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OTel-JSON log shape and the flattening projection (P4/P5).
  *
  * Reference walk (`/root/reference/app/services/ingestion_service.py:44-53`):
  * `resourceLogs[0]` → resource attrs (`service.name`), `scopeLogs[0]` →
  * `logRecords[0]` → `severityText`, `timeUnixNano` (string nanos → epoch
  * seconds), `body.stringValue`; malformed records are skipped (`:69-71`).
  * Producer shape: `/root/reference/generate_logs.py:61-79`.
  */
object OTel {

  /** attributes: [{key, value: {stringValue|intValue|...}}] — only the
    * string arm is projected; other arms parse as null (PERMISSIVE). */
  private val attr = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StructType(Seq(
      StructField("stringValue", StringType),
      StructField("intValue", LongType))))))

  private val logRecord = StructType(Seq(
    StructField("timeUnixNano", StringType),
    StructField("traceId", StringType),
    StructField("spanId", StringType),
    StructField("severityNumber", LongType),
    StructField("severityText", StringType),
    StructField("body", StructType(Seq(StructField("stringValue", StringType)))),
    StructField("attributes", ArrayType(attr))))

  val schema: StructType = StructType(Seq(
    StructField("resourceLogs", ArrayType(StructType(Seq(
      StructField("resource", StructType(Seq(
        StructField("attributes", ArrayType(attr))))),
      StructField("scopeLogs", ArrayType(StructType(Seq(
        StructField("logRecords", ArrayType(logRecord))))))))))))

  /** Lookup `service.name` in a resource-attribute array column. */
  private def serviceName(attrs: Column): Column =
    element_at(filter(attrs, a => a.getField("key") === "service.name"), 1)
      .getField("value").getField("stringValue")

  /** Flatten a DataFrame with an OTel `resourceLogs` column into the
    * canonical log columns. Mirrors the reference's first-element walk; a
    * producer batching several records per envelope would use
    * `explode(resourceLogs)` instead — the reference emits one per record.
    *
    * Output: service, severity, ts_sec (LONG epoch s), body — malformed
    * rows (no parseable timestamp or body) are dropped, like the
    * reference's try/except-continue.
    */
  def flatten(raw: DataFrame): DataFrame = {
    val rl = element_at(col("resourceLogs"), 1)
    val rec = element_at(element_at(rl.getField("scopeLogs"), 1)
      .getField("logRecords"), 1)
    val hasRaw = raw.columns.contains("full_log_json")
    val base = Seq(
      coalesce(serviceName(rl.getField("resource").getField("attributes")),
        lit("unknown")).as("service"),
      coalesce(rec.getField("severityText"), lit("INFO")).as("severity"),
      rec.getField("timeUnixNano").cast("long").as("ts_nanos"),
      rec.getField("body").getField("stringValue").as("body"))
    // reference keeps the entire raw record in the payload
    // (ingestion_service.py:66 `full_log_json`); retained losslessly as a
    // string column, from_json applied on demand (SURVEY §1.3)
    val cols = if (hasRaw) base :+ col("full_log_json")
      else base :+ to_json(struct(col("resourceLogs"))).as("full_log_json")
    raw.select(cols: _*)
      // integer division (`div`), NOT `/`: Spark's `/` on longs is double
      // division, and nanos (~1.7e18) exceed 2^53 — the quotient can land
      // on the wrong second within ~128 ns of a boundary (same fix as
      // Tables.events' ts_sec)
      .withColumn("ts_sec", expr("ts_nanos div 1000000000"))
      .select("service", "severity", "ts_sec", "body", "full_log_json")
      .filter(col("ts_sec").isNotNull && col("body").isNotNull)
  }

  /** Parse a column of raw OTel JSON strings then flatten; the original
    * line rides along as `full_log_json`. */
  def parseJson(lines: DataFrame, jsonCol: String = "value"): DataFrame =
    flatten(lines.select(from_json(col(jsonCol), schema).as("o"),
      col(jsonCol).as("full_log_json"))
      .select(col("o.resourceLogs").as("resourceLogs"), col("full_log_json")))
}
