package graft.queries

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The committed golden parquets under `golden/` ARE the driver's DuckDB
  * oracles for the non-SQL-expressible queries (see [[Golden]]). This spec
  * recomputes each golden-backed query at the driver's verify scale
  * (sf0.01) and fails on ANY drift — a code change that alters the values
  * must regenerate the goldens (`sbt "runMain graft.GoldenGen"`) in the
  * same commit. */
class GoldenOracleSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.01"

  Golden.backed.foreach { case (name, _) =>
    test(s"$name matches its committed golden parquet") {
      assume(Files.exists(Paths.get(SfDir)), s"testdata missing: $SfDir")
      val goldenPath = Golden.path(name)
      assert(Files.exists(Paths.get(goldenPath)),
        s"golden missing — run `sbt \"runMain graft.GoldenGen\"`: $goldenPath")
      val fresh = graft.SparkEntry.queries(name)(spark, SfDir)
      val pinned = spark.read.parquet(goldenPath)
      assert(fresh.schema.map(f => (f.name, f.dataType)) ==
        pinned.schema.map(f => (f.name, f.dataType)), "schema drift vs golden")
      val freshRows = fresh.collect().map(_.toSeq).toSeq
      val pinnedRows = pinned.collect().map(_.toSeq).toSeq
      assert(freshRows.size == pinnedRows.size, "row count drift vs golden")
      freshRows.zip(pinnedRows).zipWithIndex.foreach { case ((f, p), i) =>
        assert(f == p, s"row $i drifted vs golden")
      }
    }
  }
}
