package graft

import org.apache.spark.sql.SparkSession

/** Session tuning shared by the parquet-reading measurement mains
  * (Bench, BenchSuite, Verify) — one definition so the rationale and the
  * value cannot drift apart across entry points. */
object SessionTuning {

  /** File-open cost floor sized for local NVMe: Spark sizes scan splits
    * as `max(openCostInBytes, totalBytes/defaultParallelism)` capped by
    * `maxPartitionBytes`, and the default 4 MB floor caps a 50 MB
    * single-file table at ~13 splits on 32 cores. 1 MB lets
    * `bytesPerCore` win so compute-heavy kernel scans use the full core
    * count; a cluster keeps the default (real file opens cost more than
    * local NVMe's). */
  def tuned(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.files.openCostInBytes", String.valueOf(1024 * 1024))
}
