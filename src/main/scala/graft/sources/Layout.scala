package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout levers for the warehouse path: bucketing for
  * co-located joins.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
  * sides. Writing the tables bucketed on the join key (same bucket count,
  * same key) makes the partitioning part of the STORED layout: Catalyst
  * recognizes the matching `HashPartitioning` on both scans and plans a
  * sort-merge join with ZERO Exchange — each task reads bucket i of both
  * tables. The price is paid once at write time (one shuffle into
  * buckets), then every subsequent join, aggregate or dedup keyed on the
  * bucket column is exchange-free; for append-heavy fact tables that
  * ratio is strongly in bucketing's favor.
  *
  * Bucketed tables go through the session catalog (`saveAsTable` — plain
  * `parquet(path)` cannot record bucket metadata). BucketedJoinSpec
  * asserts the exchange-free plan shape end to end.
  */
object Layout {

  /** Write `df` as a bucketed catalog table (overwriting), bucketed AND
    * sorted by `key` into `buckets` files per partition — sorted buckets
    * let the merge join skip its sort when bucket files are read in
    * order. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** The co-located join of two same-key bucketed tables. Plain
    * `spark.table(a).join(spark.table(b), key)` — the exchange-free plan
    * comes from the stored layout, not from hints; this helper only names
    * the pattern. */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession,
      left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  case class CompactionStats(
      partitionsCompacted: Int, filesBefore: Long, filesAfter: Long)

  /** Small-files compaction for streaming sinks — the first operational
    * problem a per-micro-batch appender (PromotionStream's
    * `(batch_id, dt)` partitions, the ingest pipeline's Tier-1 appends)
    * creates at 100 TB/day: thousands of KB-sized parquet files per
    * partition, each costing a task + a footer read per query.
    *
    * Per LEAF partition directory: if the file count exceeds
    * `ceil(bytes/targetBytes)`, the partition is re-read, coalesced to
    * that file count, written to a dot-prefixed sibling dir (invisible to
    * readers), and SWAPPED in via two directory renames (old → trash,
    * new → final, trash deleted) — the swap is rename-atomic per
    * partition, so a reader sees the old files or the new files, never a
    * mix, and row content is byte-identical either way.
    *
    * Concurrent appends are safe BY LISTING SNAPSHOT: compaction touches
    * only the leaf dirs that existed when it listed, and a concurrently
    * appending PromotionStream only ever CREATES new `(batch_id, dt)`
    * leaves (dynamic partition overwrite of its own batch on replay) —
    * the two never write the same directory (CompactionSpec proves
    * content equality under a live appender). Partition-column values
    * live in the directory names, not the files, so the rewrite
    * round-trips them untouched. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long): CompactionStats = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def isData(p: Path): Boolean =
      !p.getName.startsWith(".") && !p.getName.startsWith("_")
    def leaves(dir: Path): Seq[Path] = {
      val entries = fs.listStatus(dir).filter(s => isData(s.getPath))
      val subdirs = entries.filter(_.isDirectory)
      if (subdirs.isEmpty) {
        if (entries.exists(_.isFile)) Seq(dir) else Seq.empty
      } else subdirs.flatMap(s => leaves(s.getPath)).toSeq
    }
    var before = 0L
    var after = 0L
    var compacted = 0
    leaves(root).foreach { dir =>
      def dataFiles() = fs.listStatus(dir)
        .filter(s => s.isFile && isData(s.getPath))
      val files = dataFiles()
      val bytes = files.map(_.getLen).sum
      val want = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong)
      before += files.length
      if (files.length > want) {
        val tmp = new Path(dir.getParent, s".compact-${dir.getName}.tmp")
        val trash = new Path(dir.getParent, s".compact-${dir.getName}.old")
        fs.delete(tmp, true); fs.delete(trash, true)
        spark.read.parquet(dir.toString)
          .coalesce(want.toInt)
          .write.mode("overwrite").parquet(tmp.toString)
        if (!fs.rename(dir, trash))
          throw new java.io.IOException(s"compact: cannot swap out $dir")
        if (!fs.rename(tmp, dir)) { // restore on failure — never lose data
          fs.rename(trash, dir)
          throw new java.io.IOException(s"compact: cannot swap in $dir")
        }
        fs.delete(trash, true)
        compacted += 1
        after += dataFiles().length
      } else after += files.length
    }
    CompactionStats(compacted, before, after)
  }
}
