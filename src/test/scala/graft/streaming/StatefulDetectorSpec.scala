package graft.streaming

import graft.SparkSpec
import graft.streaming.StatefulDetector._
import org.apache.spark.sql.streaming.TestGroupState

class StatefulDetectorSpec extends SparkSpec {

  private def freshState(): TestGroupState[HashState] =
    TestGroupState.create[HashState](
      optionalState = org.apache.spark.api.java.Optional.empty[HashState](),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = false)

  test("classify: novelty on first window, frequency on burst, baseline folds") {
    val st = freshState()
    // first window, count 3 -> novelty
    val w1 = classify(Thresholds())("h", Iterator(WindowCount("h", 0, 3)), st).toSeq
    assert(w1.map(a => (a.anomaly_type, a.n)) == Seq(("novelty", 3L)))
    assert(st.get.windows == 1 && st.get.mean == 3.0)
    // steady windows -> no anomaly, mean tracks
    val w2 = classify(Thresholds())("h", Iterator(WindowCount("h", 60, 3), WindowCount("h", 120, 3)), st).toSeq
    assert(w2.isEmpty)
    assert(st.get.windows == 3 && math.abs(st.get.mean - 3.0) < 1e-9)
    // burst: 3 + 2.5*max(1.5, sqrt(3)) = 3 + 4.33 = 7.33 -> 12 flags
    val w3 = classify(Thresholds())("h", Iterator(WindowCount("h", 180, 12)), st).toSeq
    assert(w3.map(_.anomaly_type) == Seq("frequency"))
    assert(w3.head.baseline_mean.contains(3.0))
    // single-occurrence new hash -> below novelty floor
    val st2 = freshState()
    assert(classify(Thresholds())("x", Iterator(WindowCount("x", 0, 1)), st2).isEmpty)
  }

  test("detect() runs the windowed stateful plan (batch mode)") {
    import spark.implicits._
    // hash 'steady': 3/window for 5 windows; hash 'burst': quiet then 15
    val steady = for (w <- 0 until 5; i <- 0 until 3)
      yield ("steady", 1700000000L + w * 60 + i * 7)
    val quiet = for (w <- 0 until 4; i <- 0 until 2)
      yield ("burst", 1700000000L + w * 60 + i * 11)
    val burst = (0 until 15).map(i => ("burst", 1700000240L + i % 50))
    val df = (steady ++ quiet ++ burst).toDF("rhythm_hash", "ts_sec")
    val out = detect(df).collect()
    val byHash = out.groupBy(_.rhythm_hash)
    // both hashes are novel in their first window (count >= 2)
    assert(byHash("steady").exists(_.anomaly_type == "novelty"))
    // burst window flags frequency against the folded baseline of 2/window
    val freq = byHash("burst").filter(_.anomaly_type == "frequency")
    assert(freq.map(_.n).toSeq == Seq(15L), s"got: ${byHash("burst").toSeq}")
    assert(freq.head.baseline_mean.contains(2.0))
    // steady hash never flags frequency
    assert(!byHash("steady").exists(_.anomaly_type == "frequency"))
  }
}
