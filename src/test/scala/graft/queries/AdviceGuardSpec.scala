package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Edge-case guards on the curation operators: inputs the sf fixtures never
  * produce (clean shards, punctuation-only documents, infeasible mixture
  * targets) must degrade to the DOCUMENTED semantics, not a runtime error
  * or a silently wrong result.
  */
class AdviceGuardSpec extends SparkSpec {

  test("connectedComponents on a shard with zero LSH pairs: all singletons") {
    import spark.implicits._
    // five wildly different texts — no shingle overlap, no candidate pairs
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliett"),
      (2L, "one two three four five six seven eight nine ten eleven twelve"),
      (3L, "red orange yellow green blue indigo violet magenta cyan teal"),
      (4L, "north south east west up down left right forward backward"),
      (5L, "spark scala parquet shuffle broadcast partition executor driver"))
      .toDF("doc_id", "text")
    val got = CurationOps.connectedComponents(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("mixSourceFilter with an absent target source yields EMPTY, not a redistributed mix") {
    import spark.implicits._
    val docs = (1L to 100L)
      .map(i => (i, if (i % 2 == 0) "src0" else "src1", s"doc $i"))
      .toDF("doc_id", "source", "text")
    // src2 is a declared target but absent from the corpus: the mixture is
    // infeasible downsampling-only, so the output must be empty
    val got = CurationOps.mixSourceFilter(docs,
      Seq("src0" -> 500L, "src1" -> 300L, "src2" -> 200L))
    assert(got.count() == 0L)
    // sanity: the same corpus with a feasible target list is non-empty
    val feasible = CurationOps.mixSourceFilter(docs,
      Seq("src0" -> 500L, "src1" -> 500L))
    assert(feasible.count() > 0L)
  }

  test("promo_rollup raises on an id outside the sample-packing bounds") {
    import spark.implicits._
    // one directory per case: Tables memoizes (session, path) relations, so
    // rewriting the same fixture path mid-session would serve a stale listing
    def write(eventId: Long): String = {
      val dir = java.nio.file.Files.createTempDirectory("guard-promo").toString
      Seq((eventId, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          1L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // in-range id: fine
    assert(SparkEntry.queries("promo_rollup")(spark, write(42L)).count() == 1L)
    // id >= 2^32 would corrupt the (ts << 32) | id packing — the guard
    // must RAISE, never silently mis-sample (ADVICE r10)
    val e = intercept[Exception] {
      SparkEntry.queries("promo_rollup")(spark, write(1L << 33)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("out of range")),
      s"wrong failure: ${messages(e)}")
  }

  test("bigram_surprisal drops zero/one-token docs instead of erroring") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("guard-bigram").toString
    Seq(
      (1L, "!!! ??? ... ---"), // zero word tokens: slice guard territory
      (2L, "single"),          // one token: no pairs
      (3L, "hello world hello world"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("bigram_surprisal")(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(3L))
    assert(got.head.getLong(1) == 3L) // 3 adjacent pairs in doc 3
  }
}
