package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Driver-side parquet footer statistics — the zone-map read path.
  *
  * A verb that only needs an AGGREGATE BOUND of one column (e.g. `tail`
  * needs max(ts_sec) of the newest partition to anchor its probe window)
  * can answer it from row-group metadata without launching a Spark job:
  * footers are a few KB per file, and a day partition under the engine's
  * compaction policy is single-digit files. This is exactly the metadata
  * parquet keeps for row-group skipping, read one level earlier. On an
  * object store each footer read is one ranged GET; callers should
  * restrict `dir` to a pruned partition, never a table root.
  */
object FooterStats {

  /** Exact max of INT64 column `column` across the data files directly
    * under `dir`, from footer statistics alone. None when the directory
    * has no data files, any file lacks stats for the column (dropped
    * stats, column missing, non-INT64 physical type), or a footer is
    * unreadable mid-rewrite (a compaction swap) — callers fall back to
    * the equivalent Spark aggregate, so stats here are an accelerator,
    * never a correctness dependency. */
  /** Files per directory beyond which the stats path declines (None →
    * caller's distributed fallback): footer reads are driver-side IO,
    * and a badly fragmented live partition (hundreds of micro-batch
    * files awaiting compaction) should spend cluster parallelism, not
    * driver threads. Compacted stores sit far below this. */
  val MaxFiles = 256

  /** Shared bounded pool for footer IO. Per-call pool creation/teardown
    * sat on the hot serving path (every `Via.tail` probe — ADVICE r12),
    * and default non-daemon threads could pin JVM shutdown; 16 lazy
    * daemon threads are reused across calls instead. Bounded pool, not
    * the global EC: this is blocking metadata IO on the driver. */
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    16,
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-footer-io-${n.incrementAndGet()}")
        t.setDaemon(true); t
      }
    })

  def maxLong(spark: SparkSession, dir: String, column: String): Option[Long] = {
    val root = new Path(dir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return None
    val files = fs.listStatus(root)
      .filter(s => s.isFile && s.getLen > 0 && {
        val n = s.getPath.getName
        !n.startsWith(".") && !n.startsWith("_")
      })
      .map(_.getPath)
    if (files.isEmpty || files.length > MaxFiles) return None
    // footers are read CONCURRENTLY: each open is ~5-10 ms of blocking
    // metadata IO, and an un-compacted live partition holds one file per
    // writer task per batch — sequential reads were the whole cost of
    // the stats path at 32 files (TailBench).
    val futures = files.toSeq.map { f =>
      pool.submit(new java.util.concurrent.Callable[Option[Long]] {
        def call(): Option[Long] = fileMaxLong(f, conf, column)
      })
    }
    val perFile = futures.map(_.get())
    if (perFile.exists(_.isEmpty)) None // one statless file poisons it
    else perFile.flatten.filter(_ != Long.MinValue) match {
      case s if s.isEmpty => None // all files empty of row groups
      case s => Some(s.max)
    }
  }

  /** Max of `column` in one file's footer; Long.MinValue marks a file
    * with zero row groups (bounds nothing, contributes no rows), None a
    * file whose stats can't prove a bound. */
  private def fileMaxLong(f: Path, conf: org.apache.hadoop.conf.Configuration,
      column: String): Option[Long] =
    try {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        import scala.jdk.CollectionConverters._
        val blocks = reader.getFooter.getBlocks.asScala
        if (blocks.isEmpty) Some(Long.MinValue)
        else {
          val perBlock = blocks.map { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .map(_.getStatistics) match {
              case Some(s) if s != null && !s.isEmpty && s.hasNonNullValue =>
                s.genericGetMax match {
                  case v: java.lang.Long => Some(v.longValue())
                  case _ => None // stats exist but aren't INT64
                }
              case Some(s) if s != null && !s.isEmpty &&
                  s.isNumNullsSet && s.getNumNulls == b.getRowCount =>
                // PROVABLY all-null block: contributes no non-null rows,
                // so it bounds nothing — like an empty file, not like
                // missing stats
                Some(Long.MinValue)
              case _ => None // stats absent/dropped: can't prove a bound
            }
          }
          if (perBlock.exists(_.isEmpty)) None else Some(perBlock.flatten.max)
        }
      } finally reader.close()
    } catch { case _: Exception => None }
}
