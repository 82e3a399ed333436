package graft.queries

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The committed golden parquets under `golden/` ARE the driver's DuckDB
  * oracles for the non-SQL-expressible queries (see [[Golden]]). This spec
  * recomputes each golden-backed query at the driver's verify scale
  * (sf0.01 — the root golden set) AND at sf0.1 (the per-SF tree the scale
  * sweeps read) and fails on ANY drift — a code change that alters the
  * values must regenerate the goldens (`sbt "runMain graft.GoldenGen"`,
  * plus `graft.GoldenGen <sfDir> golden/<tag>` per SF tree) in the same
  * commit. The sf1/sf10 trees are generated from `target/sf1`/`target/
  * sf10` (ScaleGen output, not present in every checkout) by the same
  * code path, so the sf0.1 leg here covers the per-SF mechanism. */
class GoldenOracleSpec extends SparkSpec {

  private def check(name: String, sfDir: String, goldenPath: String): Unit = {
    assume(Files.exists(Paths.get(sfDir)), s"testdata missing: $sfDir")
    assert(Files.exists(Paths.get(goldenPath)),
      s"golden missing — run `sbt \"runMain graft.GoldenGen\"`: $goldenPath")
    val fresh = graft.SparkEntry.queries(name)(spark, sfDir)
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

  Golden.backed.foreach { case (name, _) =>
    test(s"$name matches its committed golden parquet") {
      check(name, "/root/testdata/sf0.01", Golden.path(name))
    }
    test(s"$name matches its committed sf0.1 golden") {
      // Golden.Dir is env-selected at Verify time; the spec addresses the
      // per-SF tree directly (same layout GoldenGen wrote)
      check(name, "/root/testdata/sf0.1", s"golden/sf0.1/$name.parquet")
    }
  }
}
