package graft

import org.apache.spark.sql.SparkSession

/** Beyond-the-gate validator for `dedup_clusters` output (see
  * [[graft.queries.CcCheck]]): re-derives the LSH edge relation from the
  * corpus and checks the dumped assignment is a valid min-label
  * components fixpoint. Used where the DuckDB recursive-CTE oracle is
  * unaffordable (the sf1 sweep).
  *
  * Usage: `sbt "runMain graft.CcValidate <sfDir> <assignParquetDir>"`
  * (assignParquetDir = Verify's `<out>/dedup_clusters`). Exits non-zero
  * on any violation.
  */
object CcValidate {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, assignDir) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val assign = spark.read.parquet(assignDir)
    val v = graft.queries.CcCheck.violations(docs, assign) +
      ("exact_mismatch" -> graft.queries.CcCheck.exactMismatch(docs, assign))
    println(s"[ccvalidate] ${v.toSeq.sortBy(_._1).map { case (k, n) => s"$k=$n" }.mkString(" ")}")
    val bad = v.values.sum
    println(if (bad == 0) "[ccvalidate] VALID fixpoint labeling"
            else s"[ccvalidate] INVALID: $bad violations")
    spark.stop()
    if (bad != 0) sys.exit(1)
  }
}
