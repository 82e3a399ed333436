package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Regenerates the committed golden-parquet oracles under `golden/`
  * (see [[graft.queries.Golden]]): each golden-backed query is run at the
  * driver's verify scale (sf0.01) and its single-file parquet output is
  * copied to `golden/<name>.parquet`. Run after any semantic change to a
  * golden-backed operator, then commit the updated files —
  * GoldenOracleSpec fails `sbt test` if code and goldens drift apart.
  *
  * Usage: `sbt "runMain graft.GoldenGen [sfDir] [outDir]"`
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "golden"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val tmpRoot = Files.createTempDirectory("graft-golden")
    queries.Golden.backed.foreach { case (name, _) =>
      val tmp = s"$tmpRoot/$name"
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).getOrElse(
          sys.error(s"no parquet part written for $name"))
      Files.copy(part.toPath, Paths.get(outDir, s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"[golden] wrote $outDir/$name.parquet (${part.length()} bytes)")
    }
    spark.stop()
  }
}
