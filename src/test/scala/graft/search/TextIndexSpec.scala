package graft.search

import graft.{SparkSpec, Tables}
import graft.queries.Registry
import org.apache.spark.sql.functions.col

/** The persisted postings index must return exactly what the inline
  * token-subset scan computes, while listing ONLY the query tokens'
  * hash-bucket partitions. */
class TextIndexSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("probe == inline text_match; appends extend it consistently") {
    val docs = Tables.documents(spark, SfDir)
    val path = java.nio.file.Files.createTempDirectory("ti").toString + "/idx"
    TextIndex.build(docs, path)
    val want = Registry.all.find(_.name == "text_match").get
      .fn(spark, SfDir).collect().map(_.getLong(0)).toSeq
    val got = TextIndex.probe(spark, path, "filter window join")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == want.sorted, s"got=$got want=$want")
    assert(got.nonEmpty, "fixture must contain matches")

    // build(partA) + append(partB) == build(all): the incremental path
    val partB = docs.filter(col("doc_id") % 3 === 0)
    val partA = docs.filter(col("doc_id") % 3 =!= 0)
    val inc = java.nio.file.Files.createTempDirectory("ti2").toString + "/idx"
    TextIndex.build(partA, inc)
    TextIndex.append(partB, inc)
    val got2 = TextIndex.probe(spark, inc, "filter window join")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got2 == got, s"append diverged: $got2 != $got")
  }

  test("gate row text_match_indexed matches text_match row-for-row") {
    val a = Registry.all.find(_.name == "text_match_indexed").get
      .fn(spark, SfDir).collect().map(_.toString).toSeq
    val b = Registry.all.find(_.name == "text_match").get
      .fn(spark, SfDir).collect().map(_.toString).toSeq
    assert(a == b, s"indexed=$a inline=$b")
  }

  test("probe lists only the query tokens' bucket partitions") {
    val path = java.nio.file.Files.createTempDirectory("ti3").toString + "/idx"
    TextIndex.build(Tables.documents(spark, SfDir), path)
    val qTokens = Seq("filter", "window", "join")
    val buckets = qTokens.map(TextIndex.tokenBucket).distinct
    // the bucket column must agree between driver-side literals and the
    // executor-side hash() the build used — else pruning silently drops
    // matches (checked here by construction: probed buckets non-empty)
    val pruned = spark.read.parquet(s"$path/postings")
      .filter(col("tb").isin(buckets: _*))
      .filter(col("token").isin(qTokens: _*))
      .select(col("doc_id"))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no scan in pruning plan"))
    assert(scan.metrics("numFiles").value == buckets.size,
      s"expected ${buckets.size} bucket files, got ${scan.metrics("numFiles").value}")
    assert(scan.metadata("PartitionFilters").contains("tb"),
      scan.metadata("PartitionFilters"))
  }
}
