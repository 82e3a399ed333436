package graft.queries

import graft.{SparkSpec, Tables}

/** Independent (non-Spark) recomputes of the event-time operators on the
  * sf0.001 fixture: plain Scala timeline walks over collected rows, so a
  * window-spec mistake (wrong frame, wrong ordering, wrong gap compare)
  * cannot pass by matching itself. */
class SessionOpsSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def rawEvents() =
    Tables.events(spark, SfDir)
      .selectExpr("event_id", "user_id", "ts_us",
        "ts_sec", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getDouble(5)))

  test("sessionize matches a plain per-user timeline walk") {
    val events = rawEvents()
    // brute force: walk each user's microsecond-ordered timeline
    case class Sess(var n: Long, var start: Long, var end: Long, var cents: Long)
    val expected = events.groupBy(_._2).flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(_._3)
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Sess]
      var lastSec = Long.MinValue
      ordered.foreach { e =>
        val sec = e._4
        val cents = math.round(e._6 * 100)
        if (sessions.isEmpty || sec - lastSec > SessionOps.SessionGapSec)
          sessions += Sess(1, sec, sec, cents)
        else {
          val s = sessions.last
          s.n += 1; s.end = sec max s.end; s.cents += cents
        }
        lastSec = sec
      }
      sessions.zipWithIndex.map { case (s, i) =>
        (uid, i + 1L) -> ((s.n, s.start, s.end,
          BigDecimal(s.cents / 100.0).setScale(2,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    val got = SparkEntryQueries("sessionize").collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    }.toMap
    assert(got.size == expected.size,
      s"session count ${got.size} != ${expected.size}")
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"session $k: ${got(k)} != $v")
    }
    // invariant: within-session gaps <= gap, cross-session gaps > gap, is
    // implied by the walk above matching exactly
  }

  test("asof_join matches a scan-back over each user's timeline") {
    val events = rawEvents()
    val byUser = events.filter(e => e._5 == "click" || e._5 == "error")
      .groupBy(_._2).view.mapValues(_.sortBy(_._3)).toMap
    val expected = byUser.values.flatMap { tl =>
      var lastErr = Option.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
      tl.foreach { e =>
        if (e._5 == "error") lastErr = Some(e._3)
        else out += (e._1 -> lastErr.map(e._3 - _))
      }
      out
    }.toMap
    val got = SparkEntryQueries("asof_join").collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, gap) =>
      assert(got(id) == gap, s"click $id: gap ${got(id)} != $gap")
    }
    // left as-of: clicks before any error must be present with NULL gap
    assert(got.values.exists(_.isEmpty),
      "fixture should contain clicks with no prior error (NULL gap)")
  }

  test("range_join matches a brute-force neighborhood count") {
    val events = rawEvents()
    val errs = events.filter(_._5 == "error")
    val oth = events.filter(_._5 != "error").groupBy(_._2)
    val expected = errs.map { e =>
      val n = oth.getOrElse(e._2, Array.empty).count(o =>
        math.abs(o._4 - e._4) <= SessionOps.RangeBandSec)
      e._1 -> n.toLong
    }.toMap
    val got = SparkEntryQueries("range_join").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, n) =>
      assert(got(id) == n, s"error $id: n_nearby ${got(id)} != $n")
    }
    // the banding must not lose far-band neighbors: some count must be > 0
    // and zero-neighbor errors must survive the left join
    assert(got.values.exists(_ > 0) && got.values.exists(_ == 0))
  }

  test("lm_score matches an exact-count surprisal recompute") {
    val docs = Tables.documents(spark, SfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String): Array[String] =
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val all = docs.flatMap(d => toks(d._2))
    val cnt = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = all.length.toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.map { case (id, t) =>
      val ts = toks(t)
      val s = ts.map(tok => r6(-math.log(cnt(tok) / n))).sum
      id -> ((ts.length.toLong, r4(s / ts.length)))
    }.toMap
    val got = SparkEntryQueries("lm_score").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, v) =>
      assert(got(id)._1 == v._1, s"doc $id token count")
      assert(math.abs(got(id)._2 - v._2) <= 1e-4 + 1e-9,
        s"doc $id: avg_nll ${got(id)._2} != ${v._2}")
    }
  }

  private def SparkEntryQueries(name: String) =
    Registry.all.find(_.name == name).get.fn(spark, SfDir)
}
