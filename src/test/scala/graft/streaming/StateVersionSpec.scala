package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** Checkpoint state-schema versioning (VERDICT r9 item 6): a checkpoint
  * whose keyed [[StatefulDetector.HashState]] this build cannot read must
  * fail FAST at query start with a migration message — not a cryptic
  * state-store schema error mid-batch. */
class StateVersionSpec extends SparkSpec {

  test("fresh checkpoint is stamped; a matching tag passes on restart") {
    val ckpt = Files.createTempDirectory("sv-fresh").toString + "/ckpt"
    StatefulDetector.ensureStateVersion(spark, ckpt)
    val tag = java.nio.file.Paths.get(ckpt, "_graft_state_version")
    assert(Files.readString(tag).trim ==
      StatefulDetector.StateVersion.toString)
    // idempotent: the restart path re-checks and passes
    StatefulDetector.ensureStateVersion(spark, ckpt)
  }

  test("pre-versioning checkpoint (prior runs, no tag) fails fast") {
    val ckpt = Files.createTempDirectory("sv-v1").toString + "/ckpt"
    // the v1 shape: offsets/ exists (the query ran), no version tag
    Files.createDirectories(java.nio.file.Paths.get(ckpt, "offsets"))
    val e = intercept[IllegalStateException] {
      StatefulDetector.ensureStateVersion(spark, ckpt)
    }
    assert(e.getMessage.contains("HashState v1"), e.getMessage)
    assert(e.getMessage.contains("FRESH checkpoint"), e.getMessage)
  }

  test("mismatched version tag names both versions") {
    val ckpt = Files.createTempDirectory("sv-mismatch").toString + "/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(ckpt))
    Files.writeString(
      java.nio.file.Paths.get(ckpt, "_graft_state_version"), "1")
    val e = intercept[IllegalStateException] {
      StatefulDetector.ensureStateVersion(spark, ckpt)
    }
    assert(e.getMessage.contains("v1"), e.getMessage)
    assert(e.getMessage.contains(s"v${StatefulDetector.StateVersion}"),
      e.getMessage)
  }

  test("PromotionStream.start is wired through the check") {
    import spark.implicits._
    val work = Files.createTempDirectory("sv-wired").toString
    Seq(("h1", 1700000000L, "svc", "INFO", "b"))
      .toDF("rhythm_hash", "ts_sec", "service", "severity", "body")
      .write.parquet(s"$work/tier1")
    Files.createDirectories(java.nio.file.Paths.get(s"$work/ckpt/offsets"))
    val e = intercept[IllegalStateException] {
      PromotionStream.start(spark, s"$work/tier1", s"$work/tier2",
        s"$work/ckpt", rules = None, stateTtlMs = None)
    }
    assert(e.getMessage.contains("HashState v1"), e.getMessage)
  }
}
