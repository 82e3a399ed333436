package graft.search

import graft.{SparkSpec, Tables}
import graft.queries.TextOps
import org.apache.spark.sql.functions._

/** The persisted dedup index must return exactly what dedup_incremental's
  * in-query derivation computes, prune band probes to one partition
  * directory, and stay correct under append. */
class DedupIndexSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def split(mod: Long) = {
    val docs = Tables.documents(spark, SfDir).select(col("doc_id"), col("text"))
    (docs.filter(col("doc_id") % TextOps.IncrMod =!= mod),
      docs.filter(col("doc_id") % TextOps.IncrMod === mod))
  }

  test("probe == in-query dedup_incremental derivation") {
    val (corpus, shard) = split(0L)
    val path = java.nio.file.Files.createTempDirectory("dedupidx").toString + "/idx"
    DedupIndex.build(corpus, path)
    val got = DedupIndex.probe(spark, path, shard).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    val want = graft.queries.Registry.all
      .find(_.name == "dedup_incremental").get.fn(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.nonEmpty && got.sameElements(want),
      s"got ${got.take(3).mkString(",")} want ${want.take(3).mkString(",")}")
  }

  test("a per-band probe prunes to ONE band partition at file-listing time") {
    val (corpus, _) = split(0L)
    val path = java.nio.file.Files.createTempDirectory("dedupidx2").toString + "/idx"
    DedupIndex.build(corpus, path)
    val nBands = TextOps.MinhashK / TextOps.BandSize
    val all = DedupIndex.bands(spark, path)
    all.collect()
    val allScan = all.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no scan"))
    val totalFiles = allScan.metrics("numFiles").value
    assert(totalFiles >= nBands, s"expected >= $nBands files, got $totalFiles")

    val one = DedupIndex.bands(spark, path).filter(col("band_idx") === 3)
    one.collect()
    val oneScan = one.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no scan"))
    assert(oneScan.metadata("PartitionFilters").contains("band_idx"),
      oneScan.metadata("PartitionFilters"))
    assert(oneScan.metrics("numFiles").value < totalFiles / (nBands / 2),
      s"band probe listed ${oneScan.metrics("numFiles").value} of $totalFiles files")
  }

  test("append keeps probe verdicts current without corpus re-read") {
    val (corpus, shard) = split(0L)
    val path = java.nio.file.Files.createTempDirectory("dedupidx3").toString + "/idx"
    DedupIndex.build(corpus, path)
    // index the shard itself; re-probing the same shard must now flag every
    // doc as an exact dup of its indexed self
    DedupIndex.append(shard, path)
    val got = DedupIndex.probe(spark, path, shard)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.nonEmpty && got.forall(_._2), "all shard docs indexed -> dup_exact")
    assert(got.forall(_._3), "a doc shares every band with itself -> dup_near")
  }
}
