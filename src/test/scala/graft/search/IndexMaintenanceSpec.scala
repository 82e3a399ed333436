package graft.search

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The periodic maintenance verbs every persisted index's `append`
  * Scaladoc promises: probe results must be IDENTICAL before and after,
  * file counts must actually fall, and the AnnIndex fold must survive a
  * crash in every swap window. */
class IndexMaintenanceSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def filesUnder(path: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root)) return Seq.empty
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter { p =>
        val n = p.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      }.toSeq
  }

  private def splitEmb(n: Int): (DataFrame, Seq[DataFrame]) = {
    val emb = Tables.embeddings(spark, SfDir)
    val base = emb.filter(col("vec_id") < 300)
    val shards = (0 until n).map { i =>
      emb.filter(col("vec_id") >= 300 + i * 40 &&
        col("vec_id") < 300 + (i + 1) * 40)
    }
    (base, shards)
  }

  test("IvfIndex.compact: probe-identical, files merged") {
    val path = java.nio.file.Files.createTempDirectory("ivfc").toString + "/idx"
    val (base, shards) = splitEmb(4)
    IvfIndex.build(base, path)
    shards.foreach(IvfIndex.append(_, path))
    val beforeRows = IvfIndex.probe(spark, path).collect()
    val beforeFiles = filesUnder(s"$path/index").size
    val stats = IvfIndex.compact(spark, path)
    val afterRows = IvfIndex.probe(spark, path).collect()
    assert(afterRows.sameElements(beforeRows))
    assert(stats.partitionsCompacted > 0)
    val afterFiles = filesUnder(s"$path/index").size
    assert(afterFiles < beforeFiles, s"$beforeFiles -> $afterFiles")
  }

  test("TextIndex.compact: probe-identical, files merged, sort restored") {
    val path = java.nio.file.Files.createTempDirectory("txtc").toString + "/idx"
    val docs = Tables.documents(spark, SfDir)
    val base = docs.filter(col("doc_id") % 3 === 0)
    TextIndex.build(base, path)
    TextIndex.append(docs.filter(col("doc_id") % 3 === 1), path)
    TextIndex.append(docs.filter(col("doc_id") % 3 === 2), path)
    val q = "the data"
    val before = TextIndex.probe(spark, path, q).collect().map(_.getLong(0)).sorted
    val beforeFiles = filesUnder(s"$path/postings").size
    TextIndex.compact(spark, path)
    val after = TextIndex.probe(spark, path, q).collect().map(_.getLong(0)).sorted
    assert(after.sameElements(before))
    assert(filesUnder(s"$path/postings").size < beforeFiles)
    // the rewrite's sortWithinPartitions(token) held: every compacted
    // file is token-sorted (row-group pruning depends on it)
    val aFile = filesUnder(s"$path/postings")
      .find(_.toString.contains("tb=")).get.toString
    val toks = spark.read.parquet(aFile).select("token")
      .collect().map(_.getString(0))
    assert(toks.sameElements(toks.sorted), "compacted file lost token order")
  }

  test("DedupIndex.compact: probe-identical, files merged") {
    val path = java.nio.file.Files.createTempDirectory("ddc").toString + "/idx"
    val docs = Tables.documents(spark, SfDir)
    DedupIndex.build(docs.filter(col("doc_id") % 3 === 0), path)
    DedupIndex.append(docs.filter(col("doc_id") % 3 === 1), path)
    DedupIndex.append(docs.filter(col("doc_id") % 3 === 2), path)
    val shard = docs.limit(50)
    val before = DedupIndex.probe(spark, path, shard).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).sortBy(_._1)
    val beforeFiles = filesUnder(path).size
    val stats = DedupIndex.compact(spark, path)
    val after = DedupIndex.probe(spark, path, shard).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).sortBy(_._1)
    assert(after.sameElements(before))
    assert(stats.partitionsCompacted > 0)
    assert(filesUnder(path).size < beforeFiles)
  }

  private def annProbe(path: String) =
    AnnIndex.probe(spark, path).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))

  test("AnnIndex.fold: batch levels merge into bulk, probe-identical") {
    val path = java.nio.file.Files.createTempDirectory("annf").toString + "/idx"
    val (base, shards) = splitEmb(4)
    AnnIndex.build(base, path)
    shards.zipWithIndex.foreach { case (s, i) =>
      AnnIndex.appendBatch(s, path, batchId = i.toLong) }
    val before = annProbe(path)
    val beforeBatchDirs = new java.io.File(s"$path/index").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(beforeBatchDirs == 5, s"expected 5 batch levels, $beforeBatchDirs")
    val stats = AnnIndex.fold(spark, path)
    assert(stats.batchesFolded == 5)
    assert(stats.filesAfter < stats.filesBefore,
      s"${stats.filesBefore} -> ${stats.filesAfter}")
    val afterBatchDirs = new java.io.File(s"$path/index").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(afterBatchDirs == 1, "fold left extra batch levels")
    assert(annProbe(path).sameElements(before))
    // idempotent: a second fold is a no-op
    assert(AnnIndex.fold(spark, path).batchesFolded == 0)
  }

  test("AnnIndex.fold: batches appended after the snapshot survive") {
    val path = java.nio.file.Files.createTempDirectory("annf2").toString + "/idx"
    val (base, shards) = splitEmb(4)
    AnnIndex.build(base, path)
    AnnIndex.appendBatch(shards(0), path, 0L)
    AnnIndex.fold(spark, path)
    // a post-fold append must coexist with the folded bulk
    AnnIndex.appendBatch(shards(1), path, 1L)
    val total = spark.read.parquet(s"$path/index").count()
    assert(total == base.count() + shards(0).count() + shards(1).count())
  }

  test("AnnIndex.fold: crash after manifest but before swap rolls back") {
    val path = java.nio.file.Files.createTempDirectory("annf3").toString + "/idx"
    val (base, shards) = splitEmb(2)
    AnnIndex.build(base, path)
    shards.foreach(s => AnnIndex.appendBatch(s, path,
      shards.indexOf(s).toLong))
    val before = annProbe(path)
    // simulate: rewrite completed (tmp + manifest), swap never started
    val idx = s"$path/index"
    val tmp = s"$path/_fold.tmp"
    spark.read.option("basePath", idx).parquet(idx)
      .drop("batch_id").withColumn("batch_id", lit(AnnIndex.BulkBatchId))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("batch_id", "bucket").parquet(tmp)
    val names = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/_fold_manifest"), names.mkString("\n"))
    // recovery rolls back (snapshot could be stale) and the fold redoes
    // the work — results identical, no duplication
    val stats = AnnIndex.fold(spark, path)
    assert(stats.batchesFolded == 3)
    assert(annProbe(path).sameElements(before))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tmp)))
  }

  test("AnnIndex.fold: crash mid-swap rolls forward without loss") {
    val path = java.nio.file.Files.createTempDirectory("annf4").toString + "/idx"
    val (base, shards) = splitEmb(2)
    AnnIndex.build(base, path)
    shards.zipWithIndex.foreach { case (s, i) =>
      AnnIndex.appendBatch(s, path, i.toLong) }
    val before = annProbe(path)
    val totalBefore = spark.read.parquet(s"$path/index").count()
    // simulate a fold that crashed after moving SOME snapshot dirs to
    // trash: rewrite in tmp + manifest, two of three dirs moved
    val idx = s"$path/index"
    val tmp = s"$path/_fold.tmp"
    val trash = s"$path/_fold.trash"
    spark.read.option("basePath", idx).parquet(idx)
      .drop("batch_id").withColumn("batch_id", lit(AnnIndex.BulkBatchId))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("batch_id", "bucket").parquet(tmp)
    val names = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).sorted
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/_fold_manifest"), names.mkString("\n"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(trash))
    names.take(2).foreach { n =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(s"$idx/$n"),
        java.nio.file.Paths.get(s"$trash/$n"))
    }
    // next fold's recovery completes the swap; nothing lost or doubled
    AnnIndex.fold(spark, path)
    assert(spark.read.parquet(s"$path/index").count() == totalBefore)
    assert(annProbe(path).sameElements(before))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(trash)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tmp)))
  }
}
