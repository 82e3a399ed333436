package graft.search

import graft.{SparkEntry, SparkSpec, Tables}
import graft.queries.VectorOps

/** The persisted IVF index must return exactly what the inline ann_ivf
  * query computes, while scanning ONLY the probed centroid partitions. */
class IvfIndexSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("probe == inline ann_ivf, scanning only nprobe partitions") {
    val path = java.nio.file.Files.createTempDirectory("ivf").toString + "/idx"
    IvfIndex.build(Tables.embeddings(spark, SfDir), path)

    val probed = IvfIndex.probe(spark, path)
    probed.collect() // finalize AQE so the scan metrics are real
    val got = probed.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val want = SparkEntry.queries("ann_ivf")(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.sameElements(want),
      s"got ${got.take(3).mkString(",")} want ${want.take(3).mkString(",")}")

    // pruning proof on the probe plan itself: the literal cid predicate is
    // a PARTITION filter (listing-time), not a data filter
    val probeScan = probed.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata("Location").contains("idx/index") => s
    }
    assert(probeScan.nonEmpty, "index scan not found in probe plan")
    assert(probeScan.head.metadata("PartitionFilters").contains("cid"),
      probeScan.head.metadata("PartitionFilters"))
    // ...and the file-listing count on a plain plan over the same index +
    // predicate (TakeOrderedAndProjectExec does not surface scan driver
    // metrics; a filter-only plan does — same pattern as the dt-pruning
    // assert): exactly nprobe files listed, one per probed partition
    import org.apache.spark.sql.functions.col
    val cids = probeScan.head.metadata("PartitionFilters")
    val probeIds = spark.read.parquet(s"$path/centroids")
      .select(col("cid"), graft.functions.VectorFunctions
        .cosineToConst(col("cvec"), VectorOps.Q).as("qs"))
      .orderBy(col("qs").desc, col("cid")).limit(VectorOps.IvfNprobe)
      .collect().map(_.getLong(0))
    val plain = spark.read.parquet(s"$path/index")
      .filter(col("cid").isin(probeIds: _*))
      .select(col("vec_id"))
    plain.collect()
    val scan = plain.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no scan in plain pruning plan"))
    assert(scan.metrics("numFiles").value == VectorOps.IvfNprobe,
      s"expected ${VectorOps.IvfNprobe} files listed (filters: $cids), " +
        s"got ${scan.metrics("numFiles").value}")
  }

  test("append shard == rebuild against the frozen centroid table") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, SfDir)
    // centroid rows stay in the base shard so build(partA) and
    // build(full) freeze the SAME coarse quantizer
    val partB = emb.filter(
      col("vec_id") % 3 === 0L &&
        !col("vec_id").isin(VectorOps.IvfCentroids: _*))
    val partA = emb.exceptAll(partB)

    val appended = java.nio.file.Files.createTempDirectory("ivfap").toString + "/idx"
    IvfIndex.build(partA, appended)
    IvfIndex.append(partB, appended)
    val rebuilt = java.nio.file.Files.createTempDirectory("ivfrb").toString + "/idx"
    IvfIndex.build(emb, rebuilt)

    val a = IvfIndex.probe(spark, appended).collect().map(_.toString)
    val b = IvfIndex.probe(spark, rebuilt).collect().map(_.toString)
    assert(a.sameElements(b),
      s"append diverged from rebuild:\n a=${a.toSeq}\n b=${b.toSeq}")
  }
}
