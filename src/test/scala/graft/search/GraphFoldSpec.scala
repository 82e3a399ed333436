package graft.search

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Incremental segment fold (VERDICT r13 item 3): folding the buffer must
  * cost O(buffer) — existing sub-graph files untouched byte-for-byte —
  * while gate probes stay exactly equal to the inline exact query, across
  * the worst crash point and under the maintenance policy. */
class GraphFoldSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private val Q = graft.queries.VectorOps.Q

  private def partFiles(path: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(s"$path/graph"))
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> (f.length(), f.lastModified()))
      .toMap
  }

  private def gateProbe(path: String): Seq[(Long, Int, Double)] =
    GraphIndex.probeCached(spark, path, Q, 10, ef = GraphIndex.GateEf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq

  private def inline(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Double)] =
    GraphIndex.inlineTopK(df, Q, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq

  test("fold adds segments without touching existing sub-graph files") {
    val emb = Tables.embeddings(spark, SfDir)
    val base = emb.filter(col("vec_id") < 400)
    val fresh = emb.filter(col("vec_id") >= 400 && col("vec_id") < 460)
    val path = java.nio.file.Files.createTempDirectory("gfold").toString + "/g"
    GraphIndex.build(base, path)
    GraphIndex.append(fresh, path)
    val filesBefore = partFiles(path)
    val segsBefore = GraphIndex.segmentCount(spark, path)
    assert(GraphIndex.foldIncremental(spark, path, targetSegmentRows = 25))
    // O(buffer) proof: every pre-existing file survives bit-untouched
    // (same path, length, mtime); only NEW segment dirs appeared
    val filesAfter = partFiles(path)
    assert(filesBefore.forall { case (p, meta) => filesAfter.get(p).contains(meta) },
      "fold modified an existing sub-graph file")
    assert(GraphIndex.segmentCount(spark, path) == segsBefore + 3,
      "60 rows at target 25 must add ceil(60/25)=3 segments")
    // buffer folded away; node count stamp covers everything
    assert(GraphIndex.bufferRows(spark, path) == 0L)
    assert(GraphIndex.nodeCount(spark, path).contains(460L))
    // gate probe parity with the inline exact query over the full corpus
    val want = inline(emb.filter(col("vec_id") < 460))
    assert(gateProbe(path) == want, "fold broke gate-probe parity")
    // idempotent when nothing is buffered
    assert(!GraphIndex.foldIncremental(spark, path))
  }

  test("re-appended rows never become duplicate nodes") {
    val emb = Tables.embeddings(spark, SfDir)
    val base = emb.filter(col("vec_id") < 300)
    val overlap = emb.filter(col("vec_id") >= 250 && col("vec_id") < 320)
    val path = java.nio.file.Files.createTempDirectory("gfold2").toString + "/g"
    GraphIndex.build(base, path)
    GraphIndex.append(overlap, path) // 50 of these 70 are already nodes
    assert(GraphIndex.foldIncremental(spark, path, targetSegmentRows = 25))
    assert(GraphIndex.nodeCount(spark, path).contains(320L),
      "overlapping appends must fold to one node per key")
    val ids = spark.read.parquet(s"$path/graph").groupBy("vec_id").count()
      .filter(col("count") > 1).count()
    assert(ids == 0L, "duplicate vec_ids in the folded graph")
    assert(gateProbe(path) == inline(emb.filter(col("vec_id") < 320)))
  }

  test("crash after manifest publish: replay converges, probes stay exact") {
    val emb = Tables.embeddings(spark, SfDir)
    val base = emb.filter(col("vec_id") < 400)
    val fresh = emb.filter(col("vec_id") >= 400 && col("vec_id") < 440)
    val path = java.nio.file.Files.createTempDirectory("gfold3").toString + "/g"
    GraphIndex.build(base, path)
    GraphIndex.append(fresh, path)
    val want = inline(emb.filter(col("vec_id") < 440))
    GraphIndex.foldCrashAfterManifest = true
    try assert(GraphIndex.foldIncremental(spark, path, targetSegmentRows = 25))
    finally GraphIndex.foldCrashAfterManifest = false
    // dead mid-publish: segments built but not moved, buffer intact —
    // the live view (old graph + buffer) still answers exactly
    assert(GraphIndex.bufferRows(spark, path) > 0L)
    assert(gateProbe(path) == want, "probe wrong during the crash window")
    // the next fold replays the manifest rather than re-encoding: the
    // buffer clears, segments land once, parity holds
    assert(GraphIndex.foldIncremental(spark, path, targetSegmentRows = 25))
    assert(GraphIndex.bufferRows(spark, path) == 0L)
    assert(GraphIndex.nodeCount(spark, path).contains(440L))
    val dups = spark.read.parquet(s"$path/graph").groupBy("vec_id").count()
      .filter(col("count") > 1).count()
    assert(dups == 0L, "replay re-encoded folded rows into a second segment")
    assert(gateProbe(path) == want)
  }

  test("maintenance routes buffer growth to fold, and to rebuild past the cap") {
    val emb = Tables.embeddings(spark, SfDir)
    val wh = java.nio.file.Files.createTempDirectory("gfoldvia").toString
    val via = new graft.api.Via(spark, wh)
    GraphIndex.build(emb.filter(col("vec_id") < 300), via.graphIndexPath)
    GraphIndex.append(
      emb.filter(col("vec_id") >= 300 && col("vec_id") < 360), via.graphIndexPath)
    // 60 buffered vs 300 nodes: over the 10% ratio, under the segment cap
    val acts = via.maintainIndexes()
    assert(acts.exists(a => a.target == "graphidx" && a.action == "fold"),
      s"expected an incremental fold: $acts")
    assert(GraphIndex.bufferRows(spark, via.graphIndexPath) == 0L)
    // same pressure at the segment cap: the policy pays the full rebuild
    GraphIndex.append(
      emb.filter(col("vec_id") >= 360 && col("vec_id") < 420), via.graphIndexPath)
    val acts2 = via.maintainIndexes(maxSegments = 1)
    assert(acts2.exists(a => a.target == "graphidx" && a.action == "rebuild"),
      s"expected a rebalancing rebuild: $acts2")
    assert(GraphIndex.segmentCount(spark, via.graphIndexPath) == GraphIndex.NumParts)
    assert(gateProbe(via.graphIndexPath) ==
      inline(emb.filter(col("vec_id") < 420)))
  }

  test("crash after manifest publish: a FULL rebuild also replays first") {
    val emb = Tables.embeddings(spark, SfDir)
    val path = java.nio.file.Files.createTempDirectory("gfold4").toString + "/g"
    GraphIndex.build(emb.filter(col("vec_id") < 200), path)
    GraphIndex.append(emb.filter(col("vec_id") >= 200 && col("vec_id") < 240), path)
    GraphIndex.foldCrashAfterManifest = true
    try GraphIndex.foldIncremental(spark, path, targetSegmentRows = 25)
    finally GraphIndex.foldCrashAfterManifest = false
    GraphIndex.rebuild(spark, path)
    assert(GraphIndex.nodeCount(spark, path).contains(240L))
    val dups = spark.read.parquet(s"$path/graph").groupBy("vec_id").count()
      .filter(col("count") > 1).count()
    assert(dups == 0L)
    assert(gateProbe(path) == inline(emb.filter(col("vec_id") < 240)))
  }
}
