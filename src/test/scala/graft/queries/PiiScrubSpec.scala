package graft.queries

import graft.{SparkEntry, SparkSpec}

/** pii_scrub on synthetic PII (the gate fixture is PII-free by
  * construction, so its row only proves no false positives — this spec
  * proves the redaction itself, via a temp-dir documents.parquet). */
class PiiScrubSpec extends SparkSpec {

  test("emails and phone spans redact with typed placeholders, counts match") {
    import spark.implicits._
    val docs = Seq(
      (0L, "contact alice.smith+spam@example.co.uk or call 415-555-1234 today", "en", "s", 0L),
      (1L, "two mails: a@b.io c.d@e-corp.org and 212.555.0000", "en", "s", 0L),
      (2L, "no pii here, just version 1.2.3 and year 2026", "en", "s", 0L))
    val dir = java.nio.file.Files.createTempDirectory("pii").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("pii_scrub")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows(0) == ((0L, 1L, 1L,
      "contact <EMAIL> or call <PHONE> today")))
    assert(rows(1)._2 == 2 && rows(1)._3 == 1)
    assert(rows(1)._4 == "two mails: <EMAIL> <EMAIL> and <PHONE>")
    // doc 2: untouched — version strings and years are not phone numbers
    assert(rows(2) == ((2L, 0L, 0L, docs(2)._2)))
  }
}
