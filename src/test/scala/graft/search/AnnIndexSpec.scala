package graft.search

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.VectorOps
import org.apache.spark.sql.functions.col

/** The persisted ANN sign-bucket index must return exactly what the
  * inline `ann_rerank` query computes, while scanning ONLY the probed
  * bucket partitions — the file-pruning proof that makes SCALE.md's
  * "bucket is a write-time partition column" claim executable. */
class AnnIndexSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("probe == inline ann_rerank, scanning only probed bucket partitions") {
    val path = java.nio.file.Files.createTempDirectory("ann").toString + "/idx"
    AnnIndex.build(Tables.embeddings(spark, SfDir), path)

    val probed = AnnIndex.probe(spark, path)
    val got = probed.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val want = SparkEntry.queries("ann_rerank")(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(got.sameElements(want),
      s"got ${got.take(3).mkString(",")} want ${want.take(3).mkString(",")}")

    // pruning proof: the literal bucket predicate is a PARTITION filter
    val probeScan = probed.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata("Location").contains("idx/index") => s
    }
    assert(probeScan.nonEmpty, "index scan not found in probe plan")
    assert(probeScan.head.metadata("PartitionFilters").contains("bucket"),
      probeScan.head.metadata("PartitionFilters"))

    // file-listing count on a filter-only plan over the same index +
    // predicate (TakeOrdered doesn't surface scan driver metrics): exactly
    // one file per NON-EMPTY probed bucket, and far fewer than the total —
    // the probe set is 1+AnnBits of 2^AnnBits buckets
    val probes = AnnIndex.probeBuckets(VectorOps.Q)
    val idx = spark.read.parquet(s"$path/index")
    val nonEmptyProbed = idx.filter(col("bucket").isin(probes: _*))
      .select(col("bucket")).distinct().count()
    val totalFiles = {
      val all = idx.select(col("vec_id"))
      all.collect()
      all.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.getOrElse(fail("no scan"))
    }
    val plain = idx.filter(col("bucket").isin(probes: _*)).select(col("vec_id"))
    plain.collect()
    val scan = plain.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no scan in plain pruning plan"))
    assert(scan.metrics("numFiles").value == nonEmptyProbed,
      s"expected $nonEmptyProbed files (one per non-empty probed bucket), " +
        s"got ${scan.metrics("numFiles").value}")
    assert(scan.metrics("numFiles").value < totalFiles,
      s"probe listed ${scan.metrics("numFiles").value} of $totalFiles files — no pruning")
  }

  test("gate row ann_rerank_indexed matches ann_rerank row-for-row") {
    val a = SparkEntry.queries("ann_rerank_indexed")(spark, SfDir).collect()
    val b = SparkEntry.queries("ann_rerank")(spark, SfDir).collect()
    assert(a.sameElements(b))
  }

  test("append shard == rebuild: the daily maintenance write") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, SfDir)
    val partA = emb.filter(col("vec_id") % 3 =!= 0L)
    val partB = emb.filter(col("vec_id") % 3 === 0L)

    val appended = java.nio.file.Files.createTempDirectory("annap").toString + "/idx"
    AnnIndex.build(partA, appended)
    AnnIndex.append(partB, appended)
    val rebuilt = java.nio.file.Files.createTempDirectory("annrb").toString + "/idx"
    AnnIndex.build(emb, rebuilt)

    val a = AnnIndex.probe(spark, appended).collect().map(_.toString)
    val b = AnnIndex.probe(spark, rebuilt).collect().map(_.toString)
    assert(a.sameElements(b),
      s"append diverged from rebuild:\n a=${a.toSeq}\n b=${b.toSeq}")
  }
}
