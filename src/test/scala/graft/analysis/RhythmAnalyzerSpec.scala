package graft.analysis

import graft.SparkSpec

class RhythmAnalyzerSpec extends SparkSpec {

  private val w = 1000L // window start

  private def ev(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("rhythm_hash", "ts_sec")
  }

  test("novelty: unseen hash needs count >= 2") {
    val rows = Seq.tabulate(50)(i => ("base", w - 100 + i % 50)) ++
      Seq(("new2", w + 1), ("new2", w + 2), ("new1", w + 3))
    val out = RhythmAnalyzer.detect(ev(rows), w, 60).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.contains(("new2", "novelty")))
    assert(!out.exists(_._1 == "new1"), "single occurrence below novelty floor")
  }

  test("frequency: burst must clear mean + 2.5*std and count >= 3") {
    // baseline sample spans ts w-100..w-10 (duration 90): normalized mean
    // = 10*(60/90) = 6.6667, std = max(1.5, sqrt(6.6667)) = 2.582
    val hist = Seq.tabulate(10)(i => ("h", w - 100 + i * 10)) ++
      Seq.tabulate(10)(i => ("other", w - 100 + i * 10))
    val quiet = Seq.tabulate(8)(i => ("h", w + i))   // 8 < 6.67+2.5*2.582 ~ 13.1
    val burst = Seq.tabulate(20)(i => ("h", w + i % 50))
    val outQuiet = RhythmAnalyzer.detect(ev(hist ++ quiet), w, 60).collect()
      .filter(_.getString(0) == "h")
    assert(outQuiet.isEmpty, s"8 hits within tolerance: ${outQuiet.toSeq}")
    val outBurst = RhythmAnalyzer.detect(ev(hist ++ burst), w, 60).collect()
      .filter(_.getString(0) == "h")
    assert(outBurst.nonEmpty && outBurst.head.getString(1) == "frequency")
    assert(outBurst.head.getAs[Double]("baseline_mean") == 6.6667)
  }

  test("<2 baseline points -> no stats, recent hashes all classify novelty") {
    // reference guard (rhythm_analysis_service.py:42-46): a 1-point
    // baseline returns {}, so even a hash PRESENT in it flags as novelty
    val rows = Seq(("h", w - 50L)) ++ Seq(("h", w + 1), ("h", w + 2))
    val out = RhythmAnalyzer.detect(ev(rows), w, 60).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("h", "novelty")))
  }

  test("zero-span baseline survives ANSI mode (span floored at 1s)") {
    // all baseline points share one epoch second: raw span = 0 -> the
    // unguarded mean would be DIVIDE_BY_ZERO under ANSI; floor makes it
    // hist_n * windowSec / 1
    val hist = Seq.tabulate(5)(_ => ("h", w - 10L))
    val recent = Seq.tabulate(4)(i => ("h", w + i.toLong))
    val out = RhythmAnalyzer.detect(ev(hist ++ recent), w, 60).collect()
    // mean = 5*60/1 = 300 -> 4 recent hits are way below: no anomaly, no crash
    assert(out.isEmpty)
  }

  test("historical sample cap bounds the baseline (T3)") {
    // 30 old points for 'cap' but sample limited to the 10 newest overall
    val old = Seq.tabulate(30)(i => ("cap", w - 1000 + i)) // ts 0..29
    val fresh = Seq.tabulate(10)(i => ("fresh", w - 10 + i)) // newest pre-window
    val recent = Seq(("cap", w + 1), ("cap", w + 2))
    val out = RhythmAnalyzer.detect(ev(old ++ fresh ++ recent), w, 60,
      histSample = 10).collect().map(r => (r.getString(0), r.getString(1)))
    // with only the 10 freshest sampled, 'cap' is absent from baseline -> novelty
    assert(out.contains(("cap", "novelty")))
  }
}
