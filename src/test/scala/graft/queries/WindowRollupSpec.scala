package graft.queries

import graft.{SparkSpec, Tables}

/** Independent recomputes of the grouping-sets and running-window
  * operators: plain Scala folds over collected rows (every rollup level
  * rebuilt by hand, every frame walked sequentially), so a frame or
  * grouping-level mistake cannot pass by matching itself. */
class WindowRollupSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def query(name: String) =
    Registry.all.find(_.name == name).get.fn(spark, SfDir)

  private def money2(micros: Long): Double =
    math.floor((micros + 5000L).toDouble / 10000.0) / 100.0

  test("rollup_pricing rebuilds all three grouping levels by hand") {
    val rows = Tables.lineitem(spark, SfDir)
      .selectExpr("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    def agg(grp: Array[(String, String, Double, Double)]) = (
      grp.length.toLong,
      grp.map(_._3).sum,
      money2(grp.map(x => math.floor(x._4 * 1000000.0 + 0.5).toLong).sum))
    val detail = rows.groupBy(r => (Option(r._1), Option(r._2)))
      .map { case (k, g) => k -> agg(g) }
    val flag = rows.groupBy(r => (Option(r._1), Option.empty[String]))
      .map { case (k, g) => k -> agg(g) }
    val total = Map((Option.empty[String], Option.empty[String]) -> agg(rows))
    val expected = detail ++ flag ++ total
    val got = query("rollup_pricing").collect().map { r =>
      (Option(r.getString(0)), Option(r.getString(1))) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))
    }.toMap
    assert(got.size == expected.size,
      s"rollup level count ${got.size} != ${expected.size}")
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"group $k: ${got(k)} != $v")
    }
  }

  test("percentile_stats matches a hand-sorted interpolation") {
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Tables.lineitem(spark, SfDir)
      .selectExpr("l_returnflag", "CAST(round(l_extendedprice * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def contP(sorted: Array[Long], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = pos.toInt
      if (lo == sorted.length - 1) sorted(lo).toDouble
      else sorted(lo) + (sorted(lo + 1) - sorted(lo)) * (pos - lo)
    }
    def discP(sorted: Array[Long], p: Double): Long =
      // SQL-standard: smallest value whose cume_dist >= p
      sorted(math.ceil(p * sorted.length).toInt - 1)
    val expected = rows.groupBy(_._1).map { case (flag, g) =>
      val s = g.map(_._2).sorted
      flag -> ((r4(contP(s, 0.5)), r4(contP(s, 0.9)), r4(contP(s, 0.99)),
        discP(s, 0.5)))
    }
    val got = query("percentile_stats").collect().map(r =>
      r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (flag, (p50, p90, p99, d50)) =>
      val (g50, g90, g99, gd) = got(flag)
      assert(math.abs(g50 - p50) < 1e-6 && math.abs(g90 - p90) < 1e-6 &&
        math.abs(g99 - p99) < 1e-6 && gd == d50,
        s"flag $flag: ${got(flag)} != ${(p50, p90, p99, d50)}")
    }
  }

  test("above_avg_orders matches a per-customer margin recompute") {
    val rows = Tables.orders(spark, SfDir)
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCust = rows.groupBy(_._2)
    val expected = rows.flatMap { case (ok, ck, c) =>
      val grp = byCust(ck)
      val margin = grp.length * c - grp.map(_._3).sum
      if (margin > 0) Some((ok, ck, c / 100.0, margin)) else None
    }.sortBy(x => (-x._4, x._1)).take(50).toSeq
    val got = query("above_avg_orders").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == expected, s"\n got=${got.take(5)}\n exp=${expected.take(5)}")
    assert(got.nonEmpty)
  }

  test("running_totals matches a sequential per-user frame walk") {
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val events = Tables.events(spark, SfDir)
      .selectExpr("event_id", "user_id", "ts_us", "value")
      .collect()
      .map(e => (e.getLong(0), e.getLong(1), e.getLong(2), e.getDouble(3)))
    val expected = events.groupBy(_._2).values.flatMap { evs =>
      val tl = evs.sortBy(_._3)
      var cum = 0L
      tl.zipWithIndex.map { case (e, i) =>
        val cents = math.round(e._4 * 100)
        cum += cents
        val frame = tl.slice(math.max(0, i - 2), i + 1)
          .map(x => math.round(x._4 * 100))
        e._1 -> ((r(cum / 100.0, 2),
          r(frame.sum.toDouble / frame.length / 100.0, 4)))
      }
    }.toMap
    val got = query("running_totals").collect()
      .map(x => x.getLong(0) -> ((x.getDouble(2), x.getDouble(3)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, v) =>
      assert(math.abs(got(id)._1 - v._1) < 1e-9 &&
        math.abs(got(id)._2 - v._2) < 1e-9,
        s"event $id: ${got(id)} != $v")
    }
  }

  test("small_qty_revenue matches a per-part threshold walk") {
    val rows = Tables.lineitem(spark, SfDir)
      .selectExpr("l_partkey", "CAST(l_quantity AS BIGINT) AS qty",
        "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brand = Tables.part(spark, SfDir)
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stats = rows.groupBy(_._1).map { case (pk, ls) =>
      pk -> ((ls.length.toLong, ls.map(_._2).sum))
    }
    val small = rows.filter { case (pk, qty, _) =>
      val (cnt, sumq) = stats(pk); 5L * qty * cnt < sumq
    }
    val expected = small.groupBy(t => brand(t._1)).map { case (b, ls) =>
      val micros = ls.map(t => math.floor(t._3 * 1000000.0 + 0.5).toLong).sum
      b -> ((ls.length.toLong, money2(micros)))
    }
    val got = query("small_qty_revenue").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == expected.size, s"${got.size} brands vs ${expected.size}")
    expected.foreach { case (b, v) =>
      assert(got(b) == v, s"brand $b: ${got(b)} != $v")
    }
  }
}
