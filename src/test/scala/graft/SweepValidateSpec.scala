package graft

import org.apache.spark.sql.functions._

/** Discriminating power of the sf10 pair-family validators (the
  * CcCheckSpec corruption-test mold): each validator must pass on a
  * faithful dump and FLAG a corrupted one — otherwise "validator green at
  * sf10" proves nothing. */
class SweepValidateSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def dump(name: String, outDir: String): Unit =
    SparkEntry.queries(name)(spark, SfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")

  test("lsh_pairs validator: green on faithful dump, flags drops and fakes") {
    val out = java.nio.file.Files.createTempDirectory("swv").toString
    dump("minhash_sig", out)
    dump("lsh_pairs", out)
    val ok = SweepValidate.lshPairs(spark, out)
    assert(ok("unsound") == 0 && ok("missing") == 0 && ok("dup_rows") == 0)
    assert(ok("rows") > 0, "sf0.001 corpus must produce candidate pairs")
    val pairs = spark.read.parquet(s"$out/lsh_pairs").cache()
    pairs.count()
    // drop one true pair -> completeness counter fires
    val dropped = pairs.orderBy("a_id", "b_id").limit(1)
    pairs.join(dropped, Seq("a_id", "b_id"), "left_anti")
      .write.mode("overwrite").parquet(s"$out/lsh_pairs_c1")
    spark.read.parquet(s"$out/lsh_pairs_c1").write.mode("overwrite")
      .parquet(s"$out/lsh_pairs")
    assert(SweepValidate.lshPairs(spark, out)("missing") > 0)
    // add a pair no band supports -> soundness counter fires
    val ids = spark.read.parquet(s"$out/minhash_sig")
      .select("doc_id").orderBy("doc_id").limit(2)
      .collect().map(_.getLong(0))
    val fake = spark.range(1).select(lit(ids(1)).as("a_id"),
      lit(ids(0)).as("b_id")) // reversed order also violates a<b
    pairs.union(fake).write.mode("overwrite").parquet(s"$out/lsh_pairs")
    assert(SweepValidate.lshPairs(spark, out)("unsound") > 0)
    pairs.unpersist()
  }

  test("simhash validator: independent sig == engine sig; corruption flagged") {
    val out = java.nio.file.Files.createTempDirectory("swv2").toString
    dump("simhash_dedup", out)
    val ok = SweepValidate.simhashDedup(spark, SfDir, out)
    assert(ok("unsound") == 0 && ok("missing") == 0 && ok("dup_rows") == 0)
    assert(ok("rows") > 0)
    // corrupt one hamming value -> soundness fires (re-derived signatures
    // disagree with the dumped distance)
    val d = spark.read.parquet(s"$out/simhash_dedup").cache()
    d.count()
    d.withColumn("hamming",
        when(col("a_id") === d.orderBy("a_id", "b_id").limit(1)
          .collect()(0).getLong(0), col("hamming") + 1L)
          .otherwise(col("hamming")))
      .write.mode("overwrite").parquet(s"$out/simhash_dedup")
    assert(SweepValidate.simhashDedup(spark, SfDir, out)("unsound") > 0)
    d.unpersist()
  }

  test("jaccard validators: exact top-50 parity; a perturbed score flags") {
    val out = java.nio.file.Files.createTempDirectory("swv3").toString
    dump("jaccard_pairs", out)
    dump("jaccard_capped", out)
    assert(SweepValidate.jaccardTop50(spark, SfDir, out, capped = false)("mismatch") == 0)
    assert(SweepValidate.jaccardTop50(spark, SfDir, out, capped = true)("mismatch") == 0)
    val d = spark.read.parquet(s"$out/jaccard_pairs").cache()
    d.count()
    d.withColumn("jaccard", col("jaccard") + 0.000001)
      .write.mode("overwrite").parquet(s"$out/jaccard_pairs")
    assert(SweepValidate.jaccardTop50(spark, SfDir, out, capped = false)("mismatch") > 0)
    d.unpersist()
  }

  test("decontaminate_semantic validator: green faithful; flags sim drift and drops") {
    val out = java.nio.file.Files.createTempDirectory("swv4").toString
    dump("decontaminate_semantic", out)
    val ok = SweepValidate.decontamSemantic(spark, SfDir, out)
    assert(ok.filterNot(_._1 == "rows").values.forall(_ == 0L), s"faithful: $ok")
    assert(ok("rows") > 0)
    val d = spark.read.parquet(s"$out/decontaminate_semantic").cache()
    d.count()
    // shift EVERY sim by 1e-5 (well past the rounding tolerance) — the
    // sampled recompute must flag it whatever the sample lands on
    d.withColumn("sim", col("sim") + 0.00001)
      .write.mode("overwrite").parquet(s"$out/decontaminate_semantic")
    assert(SweepValidate.decontamSemantic(spark, SfDir, out)("mismatch") > 0)
    // drop one training row -> coverage counter fires
    d.orderBy("vec_id").offset(1)
      .write.mode("overwrite").parquet(s"$out/decontaminate_semantic")
    assert(SweepValidate.decontamSemantic(spark, SfDir, out)("missing") > 0)
    // NULL every sim/eval_id — null-unsafe =!= would evaluate to NULL and
    // let the corruption ESCAPE the mismatch count (ADVICE r15)
    d.withColumn("sim", lit(null).cast("double"))
      .write.mode("overwrite").parquet(s"$out/decontaminate_semantic")
    assert(SweepValidate.decontamSemantic(spark, SfDir, out)("mismatch") > 0,
      "a nulled sim column must count as a mismatch")
    d.withColumn("eval_id", lit(null).cast("long"))
      .write.mode("overwrite").parquet(s"$out/decontaminate_semantic")
    val nulledEval = SweepValidate.decontamSemantic(spark, SfDir, out)
    assert(nulledEval("mismatch") > 0 || nulledEval("bad_eval") > 0,
      s"a nulled eval_id column must be flagged: $nulledEval")
    d.unpersist()
  }

  test("simhash_dedup_stats validator: green faithful; flags drift, drops, nulls") {
    val out = java.nio.file.Files.createTempDirectory("swv6").toString
    dump("simhash_dedup", out)
    dump("simhash_dedup_stats", out)
    val ok = SweepValidate.simhashStats(spark, out)
    assert(ok.filterNot(_._1 == "rows").values.forall(_ == 0L), s"faithful: $ok")
    assert(ok("rows") > 0)
    val d = spark.read.parquet(s"$out/simhash_dedup_stats").cache()
    d.count()
    // off-by-one census -> mismatch fires on every row
    d.withColumn("n_dups", col("n_dups") + 1L)
      .write.mode("overwrite").parquet(s"$out/simhash_dedup_stats")
    assert(SweepValidate.simhashStats(spark, out)("mismatch") > 0)
    // dropped doc -> coverage fires
    d.orderBy("doc_id").offset(1)
      .write.mode("overwrite").parquet(s"$out/simhash_dedup_stats")
    assert(SweepValidate.simhashStats(spark, out)("missing") > 0)
    // nulled min_hamming must COUNT as a mismatch (null-safe compare)
    d.withColumn("min_hamming", lit(null).cast("long"))
      .write.mode("overwrite").parquet(s"$out/simhash_dedup_stats")
    assert(SweepValidate.simhashStats(spark, out)("mismatch") > 0)
    d.unpersist()
  }

  test("range_join validator: green faithful; flags count drift and extras") {
    val out = java.nio.file.Files.createTempDirectory("swv5").toString
    dump("range_join", out)
    val ok = SweepValidate.rangeJoin(spark, SfDir, out)
    assert(ok.filterNot(_._1 == "rows").values.forall(_ == 0L), s"faithful: $ok")
    assert(ok("rows") > 0)
    val d = spark.read.parquet(s"$out/range_join").cache()
    d.count()
    // off-by-one on every count -> value compare fires on all rows
    d.withColumn("n_nearby", col("n_nearby") + 1L)
      .write.mode("overwrite").parquet(s"$out/range_join")
    assert(SweepValidate.rangeJoin(spark, SfDir, out)("mismatch") > 0)
    // a row for a non-error event -> extra fires
    d.unionAll(d.limit(1).select((col("event_id") + 1000000000L).as("event_id"),
        col("user_id"), col("n_nearby")))
      .write.mode("overwrite").parquet(s"$out/range_join")
    assert(SweepValidate.rangeJoin(spark, SfDir, out)("extra") > 0)
    // nulled user_id / n_nearby must COUNT as mismatches, not slip past a
    // null-unsafe =!= (ADVICE r15)
    d.withColumn("user_id", lit(null).cast("long"))
      .write.mode("overwrite").parquet(s"$out/range_join")
    assert(SweepValidate.rangeJoin(spark, SfDir, out)("mismatch") > 0,
      "a nulled user_id column must count as a mismatch")
    d.withColumn("n_nearby", lit(null).cast("long"))
      .write.mode("overwrite").parquet(s"$out/range_join")
    assert(SweepValidate.rangeJoin(spark, SfDir, out)("mismatch") > 0,
      "a nulled n_nearby column must count as a mismatch")
    d.unpersist()
  }
}
