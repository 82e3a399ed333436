package graft.streaming

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

/** Idle-state TTL for the keyed detector (VERDICT r1 item 6 / ADVICE):
  * without eviction, one HashState per distinct rhythm hash lives forever —
  * unbounded state on a 100 TB stream. With the TTL: every update re-arms
  * a processing-time timeout; a timed-out hash's state is REMOVED; a
  * returning hash re-enters as novelty (reference-consistent — a hash
  * absent from the historical sample is novel). */
class StatefulDetectorTtlSpec extends AnyFunSuite {
  import StatefulDetector._

  private val th = Thresholds(noveltyMinCount = 1, freqMinCount = 2,
    freqSigma = 1.0, stdFloor = 0.5)
  private val ttl = Some(60000L)

  private def freshState(now: Long = 1000L): TestGroupState[HashState] =
    TestGroupState.create[HashState](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout(), now, Optional.empty(), false)

  test("every update arms the processing-time timeout") {
    val st = freshState()
    classify(th, ttl)("h1", Iterator(WindowCount("h1", 60, 3)), st).toList
    assert(st.exists, "state must persist after a window")
    assert(st.getTimeoutTimestampMs.isPresent,
      "TTL run must arm a timeout on every update")
    assert(st.getTimeoutTimestampMs.get == 1000L + 60000L)
  }

  test("timeout invocation removes the idle state") {
    val st = TestGroupState.create[HashState](
      Optional.of(HashState(5, 50L)),
      GroupStateTimeout.ProcessingTimeTimeout(), 1000L, Optional.empty(), true)
    val out = classify(th, ttl)("h1", Iterator.empty, st).toList
    assert(out.isEmpty, "a timeout fires no anomalies")
    assert(st.isRemoved, "idle state must be evicted")
  }

  test("an evicted hash re-enters as novelty") {
    // before eviction: baseline exists -> high count flags as frequency
    val before = TestGroupState.create[HashState](
      Optional.of(HashState(10, 20L)),
      GroupStateTimeout.ProcessingTimeTimeout(), 1000L, Optional.empty(), false)
    val f = classify(th, ttl)("h1", Iterator(WindowCount("h1", 120, 9)), before).toList
    assert(f.map(_.anomaly_type) == List("frequency"))
    // after eviction: same hash, fresh state -> novelty again
    val after = freshState(2000L)
    val n = classify(th, ttl)("h1", Iterator(WindowCount("h1", 300, 9)), after).toList
    assert(n.map(_.anomaly_type) == List("novelty"))
  }

  test("no-TTL mode never touches timeouts (batch-compare path)") {
    val st = TestGroupState.create[HashState](Optional.empty(),
      GroupStateTimeout.NoTimeout(), 1000L, Optional.empty(), false)
    classify(th, None)("h1", Iterator(WindowCount("h1", 60, 3)), st).toList
    assert(st.exists)
  }
}
