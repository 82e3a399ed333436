package graft.streaming

import graft.SparkSpec

/** Nanos→seconds must be INTEGER division (VERDICT r1 item 4): nanos
  * (~1.7e18) exceed 2^53, so double division can land on the wrong second
  * within ~128 ns of a boundary. Also pins the lossless `full_log_json`
  * contract of the streaming text→parseJson path (ADVICE r1). */
class OTelBoundarySpec extends SparkSpec {

  private def line(nanos: String, extra: String = ""): String =
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name",""" +
      s""""value":{"stringValue":"svc"}}]},"scopeLogs":[{"logRecords":[""" +
      s"""{"timeUnixNano":"$nanos","severityText":"WARN",""" +
      s""""body":{"stringValue":"boundary"}$extra}]}]}]}"""

  test("second-boundary nanos flatten to the exact floor second") {
    import spark.implicits._
    val cases = Seq(
      "1706400000999999999" -> 1706400000L, // 1 ns before the boundary
      "1706400001000000000" -> 1706400001L, // exactly on it
      "1706400001000000001" -> 1706400001L, // 1 ns after
      "1706400000999999872" -> 1706400000L) // the double-rounding trap value
    val df = OTel.parseJson(cases.map(c => line(c._1)).toDF("value"))
    val got = df.select("ts_sec").collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("streaming-path full_log_json keeps the ORIGINAL line verbatim") {
    import spark.implicits._
    // an attribute OTel.schema does not model — must survive round-trip
    val raw = line("1706400000000000000",
      ""","attributes":[{"key":"custom.field","value":{"doubleValue":1.5}}]""")
    val got = OTel.parseJson(Seq(raw).toDF("value"))
      .select("full_log_json").collect().head.getString(0)
    assert(got == raw, "full_log_json must be the unmodified input line")
  }
}
