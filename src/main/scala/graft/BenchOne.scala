package graft
import org.apache.spark.sql.SparkSession

/** Profiling harness for one gate query: times N reps and prints the
  * formatted physical plan, so a per-query regression in the round bench
  * can be reproduced and attributed without running all 49 queries.
  * Usage: runMain graft.BenchOne <queryName> [reps]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    // SPARK_GRAFT_COUNT=1: also report output cardinality (for scale
    // sweeps where the honest metric is rows/sec of OUTPUT, e.g. pair
    // enumeration)
    if (sys.env.get("SPARK_GRAFT_COUNT").contains("1"))
      println(s"[$name] output rows: ${fn(spark, sfDir).count()}")
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[$name] rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
