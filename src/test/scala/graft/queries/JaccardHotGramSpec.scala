package graft.queries

import graft.{ObservedMetrics, SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** jaccard_capped under hot grams: a stop-phrase present in EVERY document
  * must be excluded from pair formation by the df-cap (the 100 TB skew
  * guard), and the remaining pair scores must equal a brute-force capped
  * Jaccard recomputed in plain Scala. The census aggregate saturates hot
  * grams at O(cap) state (BoundedCollectSet) — this spec pins the
  * SEMANTICS under that load shape. */
class JaccardHotGramSpec extends SparkSpec {

  test("df-cap drops the universal stop-phrase; scores match brute force") {
    import spark.implicits._
    val hot = "alpha beta gamma delta epsilon"   // in every doc → df = 60
    // 60 docs: every one carries the hot phrase; each trio (i/3) shares a
    // phrase with df = 3 <= cap, the only legitimate pair evidence
    val docs = (0 until 60).map { i =>
      val g = i / 3
      val rare = s"shared$g phrase$g tokens$g joint$g here$g"
      val filler = s"filler$i token$i word$i extra$i more$i"
      (i.toLong, s"$hot $rare $filler", "en", "synth", 0L)
    }
    val dir = java.nio.file.Files.createTempDirectory("hotgram").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("jaccard_capped")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // brute force: distinct 4-grams per doc, drop df > cap, exact jaccard
    def grams(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
    }
    val all = docs.map { case (id, t, _, _, _) => id -> grams(t) }
    val df = all.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val kept = all.map { case (id, gs) =>
      id -> gs.filter(g => df(g) <= TextOps.JaccardDfCap)
    }.toMap
    // the hot phrase's grams must be df=60, hence dropped everywhere
    grams(hot).foreach(g => assert(df(g) == 60 && kept.values.forall(!_.contains(g))))
    val expected = (for {
      (a, ga) <- kept.toSeq; (b, gb) <- kept.toSeq if a < b
      i = (ga & gb).size if i > 0
    } yield (a, b, (BigDecimal(i) / BigDecimal(ga.size + gb.size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (a, b, j) => (-j, a, b) }.take(50)

    assert(got.length == expected.length, s"${got.length} vs ${expected.length}")
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
    // and the hot phrase really formed no pair: every surviving pair is
    // within one trio (rare-phrase evidence), never across trios (which
    // share ONLY the capped hot phrase)
    assert(got.nonEmpty, "trio pairs must survive the cap")
    assert(got.forall { case (a, b, _) => a / 3 == b / 3 })
  }

  test("jaccard_pairs: capped candidates, EXACT full-set verification") {
    import spark.implicits._
    val hot = "alpha beta gamma delta epsilon"
    val docs = (0 until 60).map { i =>
      val g = i / 3
      val rare = s"shared$g phrase$g tokens$g joint$g here$g"
      val filler = s"filler$i token$i word$i extra$i more$i"
      (i.toLong, s"$hot $rare $filler", "en", "synth", 0L)
    }
    val dir = java.nio.file.Files.createTempDirectory("hotgram2").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("jaccard_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    def grams(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
    }
    val all = docs.map { case (id, t, _, _, _) => id -> grams(t) }.toMap
    val df = all.values.flatten.groupBy(identity).view.mapValues(_.size)
    // candidates share >=1 discriminative gram (2 <= df <= cap); the score
    // is the EXACT Jaccard over the FULL gram sets, hot grams included
    val expected = (for {
      (a, ga) <- all.toSeq; (b, gb) <- all.toSeq if a < b
      if (ga & gb).exists(g =>
        df(g) >= 2 && df(g) <= TextOps.JaccardDfCap)
      i = (ga & gb).size
    } yield (a, b, (BigDecimal(i) / BigDecimal(ga.size + gb.size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (a, b, j) => (-j, a, b) }.take(50)

    assert(got.length == expected.length, s"${got.length} vs ${expected.length}")
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
    // cross-trio pairs share ONLY the above-cap hot phrase -> never formed;
    // within-trio scores COUNT the hot grams (exact, not post-cap, Jaccard)
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, _) => a / 3 == b / 3 })
    val capped = SparkEntry.queries("jaccard_capped")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.toSeq.map(t => (t._1, t._2)).toSet ==
      capped.map(t => (t._1, t._2)).toSet)
    assert(got.toSeq != capped, "exact scores must differ from post-cap scores")
  }

  test("cap telemetry: both jaccard queries report the df-cap's exclusions") {
    import spark.implicits._
    val hot = "alpha beta gamma delta epsilon"
    val docs = (0 until 60).map { i =>
      val g = i / 3
      (i.toLong,
        s"$hot shared$g phrase$g tokens$g joint$g here$g " +
          s"filler$i token$i word$i extra$i more$i",
        "en", "synth", 0L)
    }
    val dir = java.nio.file.Files.createTempDirectory("hotgram3").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.parquet(s"$dir/documents.parquet")

    // brute-force expectation: grams with df > cap, and their memberships
    def grams(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
    }
    val df = docs.flatMap(d => grams(d._2)).groupBy(identity).view.mapValues(_.size)
    val overGrams = df.values.count(_ > TextOps.JaccardDfCap).toLong
    val overRows = df.values.filter(_ > TextOps.JaccardDfCap).map(_.toLong).sum
    assert(overGrams > 0, "fixture must contain hot grams")

    for (q <- Seq("jaccard_pairs", "jaccard_capped")) {
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains(s"CollectMetrics ${q}_cap"),
        s"$q must surface its cap telemetry in the plan:\n${plan.take(800)}")
      val m = ObservedMetrics.capture(spark, Set(s"${q}_cap")) {
        SparkEntry.queries(q)(spark, dir).collect()
      }
      val row = m.getOrElse(s"${q}_cap", fail(s"no ${q}_cap metrics in $m"))
      assert(row.getAs[Int]("over_cap_groups").toLong == overGrams,
        s"$q over_cap_groups: ${row} vs $overGrams")
      assert(row.getAs[Long]("over_cap_rows") == overRows,
        s"$q over_cap_rows: ${row} vs $overRows")
    }
  }
}
