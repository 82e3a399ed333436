package graft.control

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** C1-C3 — the dynamic schema engine: detect a source's log format from a
  * sample and map it onto the canonical `{timestamp, level, service,
  * message}` schema; persist named schemas in a registry table.
  *
  * Reference (`/root/reference/app/services/schema_service.py`):
  * detection walks the OTel JSON path (`:22-48`) or matches a
  * fixed-position BGL regex (`:51-64`); schemas upsert by name into
  * SQLite (`:69-84`). Canonical field set: `:41-46`/`:58-63`.
  */
object SchemaEngine {

  /** One detected field: canonical name, type, source JSON path/regex group. */
  case class Field(name: String, fieldType: String, sourceField: String)
  case class LogSchema(format: String, fields: Seq[Field])

  /** BGL fixed-position line, e.g.
    * `- 1117838570 2005.06.03 R02-M1-N0-C:J12-U11 2005-06-03-15.42.50.363779 R02-M1-N0-C:J12-U11 RAS KERNEL INFO instruction cache parity error corrected`
    * (reference regex `schema_service.py:53-56`; sample in
    * `tests/test_api_flow.py:26`). */
  val BglRegex: String =
    "^(?<alert>\\S+) (?<ts>\\d+) (?<date>\\S+) (?<node>\\S+) (?<fulltime>\\S+) " +
      "(?<nodeagain>\\S+) (?<mtype>RAS) (?<component>\\S+) (?<level>\\S+) (?<message>.*)$"

  /** C1/C2 — detect from sample lines: OTel JSON wins if the first sample
    * REALLY parses as a JSON object and the
    * `resourceLogs[0].scopeLogs[0].logRecords[0]` path exists (Jackson,
    * already on Spark's classpath — mirrors the reference's `json.loads` +
    * path walk, `schema_service.py:22-48`; we additionally require the OTel
    * path to be present, where the reference's defaulted walk would accept
    * ANY json dict — declared tightening, same canonical field output);
    * else BGL if the regex matches; else None. */
  def detect(samples: Seq[String]): Option[LogSchema] = {
    val first = samples.headOption.getOrElse("")
    if (isOtelJson(first))
      Some(LogSchema("otel-json", Seq(
        Field("timestamp", "datetime",
          "resourceLogs[0].scopeLogs[0].logRecords[0].timeUnixNano"),
        Field("level", "keyword",
          "resourceLogs[0].scopeLogs[0].logRecords[0].severityText"),
        Field("service", "keyword",
          "resourceLogs[0].resource.attributes[key=service.name].value.stringValue"),
        Field("message", "string",
          "resourceLogs[0].scopeLogs[0].logRecords[0].body.stringValue"))))
    else if (first.matches(BglRegex))
      Some(LogSchema("bgl", Seq(
        Field("timestamp", "integer", "ts"),
        Field("level", "keyword", "level"),
        Field("service", "keyword", "node"),
        Field("message", "string", "message"))))
    else None
  }

  /** Real JSON parse + OTel path walk: the sample must be a JSON object
    * whose `resourceLogs[0].scopeLogs[0].logRecords[0]` resolves to an
    * object (strict mode — a non-JSON line containing the literal token
    * `"resourceLogs"`, or a JSON object missing the path, is NOT OTel). */
  private def isOtelJson(s: String): Boolean = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    try {
      val root = mapper.readTree(s)
      if (root == null || !root.isObject) return false
      val rec = root.path("resourceLogs").path(0)
        .path("scopeLogs").path(0)
        .path("logRecords").path(0)
      rec.isObject
    } catch { case _: java.io.IOException => false }
  }

  /** C2 — project BGL lines into canonical columns with regexp_extract. */
  def parseBgl(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val c = col(lineCol)
    lines.select(
      regexp_extract(c, BglRegex, 2).cast("long").as("timestamp"),
      regexp_extract(c, BglRegex, 9).as("level"),
      regexp_extract(c, BglRegex, 4).as("service"),
      regexp_extract(c, BglRegex, 10).as("message"))
      .filter(col("timestamp").isNotNull && col("level") =!= "")
  }
}

/** C3 — named-schema registry over a small parquet table (the SQLite
  * `schemas` table with `ON CONFLICT(name) DO UPDATE`,
  * `schema_service.py:69-104`). */
final class SchemaRegistry(spark: SparkSession, path: String) {
  import SchemaEngine._

  private def empty: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, String)].toDF("name", "format", "fields_json")
  }

  def load(): DataFrame =
    if (Files.exists(Paths.get(path))) spark.read.parquet(path) else empty

  def save(name: String, schema: LogSchema): Unit = {
    import spark.implicits._
    val fieldsJson = schema.fields.map(f =>
      s"""{"name":"${f.name}","type":"${f.fieldType}","source_field":"${f.sourceField}"}""")
      .mkString("[", ",", "]")
    val incoming = Seq((name, schema.format, fieldsJson))
      .toDF("name", "format", "fields_json")
    val merged = load().filter(col("name") =!= name).unionByName(incoming)
    val rows = merged.collect().toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), merged.schema)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def get(name: String): Option[(String, String)] =
    load().filter(col("name") === name)
      .collect().headOption.map(r => (r.getString(1), r.getString(2)))

  def list(): Seq[String] =
    load().select("name").collect().map(_.getString(0)).sorted.toSeq
}
