package graft.control

import java.nio.file.Files

import graft.SparkSpec

class RulesSpec extends SparkSpec {

  private def fresh() = new Rules(spark,
    Files.createTempDirectory("rules").toString + "/rules")

  test("suppression TTL boundary: active strictly before expiry") {
    val r = fresh()
    r.suppress("h1", ttlSec = 100, nowSec = 1000)
    assert(r.active(1099).count() == 1)
    assert(r.active(1100).count() == 0, "expires_at == now is expired")
    assert(r.active(1101).count() == 0)
  }

  test("patch is permanent and reactivation overwrites a soft delete") {
    val r = fresh()
    r.patch("h2")
    assert(r.active(Long.MaxValue - 1).count() == 1, "no expiry on patches")
    r.deactivate("h2", Rules.AllowList)
    assert(r.active(0).count() == 0)
    r.patch("h2") // re-patch reactivates (reference ON CONFLICT DO UPDATE)
    assert(r.active(0).count() == 1)
  }

  test("same hash can hold both rule kinds; upsert keeps one row per kind") {
    val r = fresh()
    r.patch("h3")
    r.suppress("h3", 100, 1000)
    r.suppress("h3", 500, 1000) // upsert, not duplicate
    assert(r.load().count() == 2)
    assert(r.active(1400).count() == 2, "renewed TTL honored")
    assert(r.active(1600).count() == 1, "suppression lapsed, patch remains")
  }

  test("enforce drops exactly the ruled hashes") {
    import spark.implicits._
    val r = fresh()
    r.patch("drop_me")
    val df = Seq("drop_me", "keep_a", "keep_b").toDF("rhythm_hash")
    val kept = r.enforce(df, nowSec = 0).as[String].collect().sorted
    assert(kept.toSeq == Seq("keep_a", "keep_b"))
  }

  test("activeHashes == active() at every clock, and the memo sees upserts") {
    val r = fresh()
    def activeSet(now: Long): Set[String] =
      r.active(now).select("rhythm_hash").collect().map(_.getString(0)).toSet
    r.patch("p1")
    r.suppress("s1", ttlSec = 100, nowSec = 1000)
    Seq(0L, 1000L, 1099L, 1100L, 1101L, Long.MaxValue - 1).foreach { now =>
      assert(r.activeHashes(now) == activeSet(now),
        s"driver set diverged from active() at now=$now")
    }
    // the memo must not serve stale rules after an upsert rewrites the
    // table (listing fingerprint invalidation)
    r.activeHashes(1000) // prime the memo
    r.patch("p2")
    assert(r.activeHashes(1000) == activeSet(1000), "memo missed the upsert")
    r.deactivate("p1", Rules.AllowList)
    assert(r.activeHashes(1000) == activeSet(1000), "memo missed the deactivate")
  }
}
