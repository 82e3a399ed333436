package graft

import org.apache.spark.sql.functions._

/** Every native kernel is reachable from SQL through GraftExtensions —
  * the session-extension path a SQL-only user (spark-sql, JDBC,
  * spark.sql(...)) takes. Each registered function must agree with its
  * Column-API form on the same input. */
class SqlRegistrySpec extends SparkSpec {

  test("scanner/count kernels answer from SQL with Column-API values") {
    import spark.implicits._
    Seq(
      ("a", "Call 1.2.3.4 or id deadbeef-dead-beef-dead-beefdeadbeef x 42 " +
        "mail bob@x.org phone 123-456-7890 !!",
        """{"k": 7, "j": "x"}"""),
      ("b", "plain text, 100 tokens it is not", """{"k":"s"}"""),
      ("c", "", "not json")
    ).toDF("id", "t", "j").createOrReplaceTempView("sql_reg_docs")

    val rows = spark.sql("""
      SELECT id,
        template_kernel(t) AS tpl,
        pii_scrub_kernel(t) AS scrubbed,
        count_ws_tokens(t) AS n_ws,
        count_sub_tokens(lower(t)) AS n_sub,
        count_punct_chars(t) AS n_punct,
        sum_str_lengths(split(t, ' ')) AS chars,
        count_alpha_tokens(split(t, ' ')) AS n_alpha,
        json_get(j, 'k') AS k
      FROM sql_reg_docs ORDER BY id
    """)

    val api = spark.table("sql_reg_docs").select($"id",
      graft.functions.TextFunctions.template($"t").as("tpl"),
      GraftFunctions.columnOf(graft.functions.PiiScrubExpr(
        GraftFunctions.exprOf($"t"))).as("scrubbed"),
      graft.functions.TextFunctions.tokenCountWs($"t").as("n_ws"),
      graft.functions.TextFunctions.tokenCountSub(lower($"t")).as("n_sub"),
      GraftFunctions.columnOf(graft.functions.CountPunctChars(
        GraftFunctions.exprOf($"t"))).as("n_punct"),
      GraftFunctions.columnOf(graft.functions.SumStrLengths(
        GraftFunctions.exprOf(split($"t", " ")))).as("chars"),
      GraftFunctions.columnOf(graft.functions.CountAlphaTokens(
        GraftFunctions.exprOf(split($"t", " ")))).as("n_alpha"),
      graft.functions.TextFunctions.jsonGet($"j", "k").as("k"))
      .orderBy($"id")

    assert(rows.collect().toSeq == api.collect().toSeq)
    // spot values: the SQL path really computed something
    val a = rows.collect()(0)
    assert(a.getString(1).contains("*")) // template masked
    assert(a.getString(2).contains("<EMAIL>") && a.getString(2).contains("<PHONE>"))
    assert(a.getString(8) == "7")
  }

  test("pii count functions answer from SQL") {
    import spark.implicits._
    Seq("mail a@b.cc and c@d.ee, call 123-456-7890", "nothing here")
      .toDF("t").createOrReplaceTempView("sql_reg_pii")
    val rows = spark.sql("""
      SELECT pii_count_emails(t) AS e, pii_count_phones(t) AS p
      FROM sql_reg_pii ORDER BY e DESC
    """).collect()
    assert(rows(0).getLong(0) == 2L && rows(0).getLong(1) == 1L)
    assert(rows(1).getLong(0) == 0L && rows(1).getLong(1) == 0L)
  }

  test("sweep-2 kernels answer from SQL with Column-API values") {
    import spark.implicits._
    Seq((1L, "the cat sat on the mat the cat"), (2L, ""), (3L, "one"))
      .toDF("doc_id", "t").createOrReplaceTempView("sql_reg_sweep2")

    val rows = spark.sql("""
      SELECT doc_id,
        bigram_counts(t) AS bg,
        contains_all_tokens(t, 'cat mat') AS hit,
        chunk_spans(t, 3, 2) AS chunks,
        drop_covered_tokens(split(lower(t), ' '), array(2), 3) AS kept
      FROM sql_reg_sweep2 ORDER BY doc_id
    """)
    val api = spark.table("sql_reg_sweep2").select($"doc_id",
      GraftFunctions.columnOf(graft.functions.BigramCounts(
        GraftFunctions.exprOf($"t"))).as("bg"),
      graft.functions.TextFunctions.matchText($"t", "cat mat").as("hit"),
      GraftFunctions.columnOf(graft.functions.ChunkSpans(
        GraftFunctions.exprOf($"t"), 3, 2)).as("chunks"),
      GraftFunctions.columnOf(graft.functions.DropCoveredTokens(
        GraftFunctions.exprOf(split(lower($"t"), " ")),
        GraftFunctions.exprOf(array(lit(2))), 3)).as("kept"))
      .orderBy($"doc_id")
    assert(rows.collect().toSeq == api.collect().toSeq)
    assert(rows.collect()(0).getBoolean(2))

    // the min-k aggregate from SQL
    val agg = spark.sql(
      "SELECT min_k_longs(doc_id, 2) AS s FROM sql_reg_sweep2")
      .collect()(0).getSeq[Long](0)
    assert(agg == Seq(1L, 2L))

    // plan-time parameters must be literals
    intercept[Exception] {
      spark.sql("SELECT contains_all_tokens(t, t) FROM sql_reg_sweep2").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT min_k_longs(doc_id, doc_id) FROM sql_reg_sweep2").collect()
    }
  }

  test("single-arg kernels reject extra arguments instead of ignoring them") {
    import spark.implicits._
    Seq(("x", "y")).toDF("a", "b").createOrReplaceTempView("sql_reg_arity")
    val e = intercept[Exception] {
      spark.sql("SELECT template_kernel(a, b) FROM sql_reg_arity").collect()
    }
    assert(e.getMessage.contains("exactly 1 argument"))
  }

  test("json_get rejects a non-literal key") {
    import spark.implicits._
    Seq(("{}", "k")).toDF("j", "key").createOrReplaceTempView("sql_reg_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT json_get(j, key) FROM sql_reg_bad").collect()
    }
    assert(e.getMessage.contains("string literal") ||
      e.getMessage.toLowerCase.contains("foldable"))
  }
}
