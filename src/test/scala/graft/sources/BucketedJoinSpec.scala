package graft.sources

import graft.{SparkSpec, Tables}

/** The two warehouse-scale join accelerations, proven on real plans:
  * bucketed co-located joins (zero Exchange) and runtime bloom-filter
  * semi-join reduction (the shuffle-join regime where dims no longer
  * broadcast). Both are layout/optimizer levers — the query code is the
  * same declarative join either way. */
class BucketedJoinSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("same-key bucketed tables join with zero exchange") {
    val s = spark
    import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("bucketwh").toString
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Layout.writeBucketed(
        Tables.orders(s, SfDir).select($"o_orderkey", $"o_custkey"),
        "b_orders", "o_orderkey", 4)
      Layout.writeBucketed(
        Tables.lineitem(s, SfDir)
          .select($"l_orderkey".as("o_orderkey"), $"l_quantity"),
        "b_lineitem", "o_orderkey", 4)
      // force the shuffle-join regime: at warehouse scale neither fact
      // side broadcasts, which is exactly when bucketing pays
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.colocatedJoin(s, "b_orders", "b_lineitem", "o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(1200))
      assert(!p.contains("Exchange"),
        s"bucketed layout must make the join exchange-free:\n${p.take(1200)}")
      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables.lineitem(s, SfDir)
        .join(Tables.orders(s, SfDir),
          $"l_orderkey" === $"o_orderkey").count()
      assert(n == expected, s"$n != $expected")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("q5/q7 over orderkey-bucketed facts: fact side never reshuffles (<=3 shuffle exchanges)") {
    val s = spark
    import s.implicits._
    try {
      Layout.writeBucketed(Tables.lineitem(s, SfDir), "q_lineitem", "l_orderkey", 4)
      Layout.writeBucketed(Tables.orders(s, SfDir), "q_orders", "o_orderkey", 4)
      def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
        df.write.format("noop").mode("overwrite").save()
        // AQE plan strings append the pre-adaptive "Initial Plan" — count
        // only the final section or every exchange double-counts
        df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0).linesIterator.count(l =>
          l.contains("Exchange") && !l.contains("BroadcastExchange")
            && !l.contains("ReusedExchange"))
      }
      val q5b = graft.queries.Relational.q5Plan(
        s.table("q_lineitem"), s.table("q_orders"),
        Tables.customer(s, SfDir), Tables.supplier(s, SfDir),
        Tables.nation(s, SfDir), Tables.region(s, SfDir))
      val q7b = graft.queries.Relational.q7Plan(
        s.table("q_lineitem"), s.table("q_orders"),
        Tables.customer(s, SfDir), Tables.supplier(s, SfDir),
        Tables.nation(s, SfDir))
      // row parity with the flat layout first
      val q5f = graft.queries.Relational.q5Plan(
        Tables.lineitem(s, SfDir), Tables.orders(s, SfDir),
        Tables.customer(s, SfDir), Tables.supplier(s, SfDir),
        Tables.nation(s, SfDir), Tables.region(s, SfDir))
      assert(q5b.collect().map(_.toString).toSeq ==
        q5f.collect().map(_.toString).toSeq, "q5 bucketed result diverged")
      // the VERDICT r15 done-bar: co-bucketed facts + stats-gated dim
      // broadcasts leave only the final aggregate (+ sort) exchanges
      val s5 = shuffles(q5b)
      val s7 = shuffles(q7b)
      assert(s5 <= 3, s"q5 bucketed plan has $s5 shuffle exchanges:\n" +
        q5b.queryExecution.executedPlan.toString.take(8000))
      assert(s7 <= 3, s"q7 bucketed plan has $s7 shuffle exchanges:\n" +
        q7b.queryExecution.executedPlan.toString.take(8000))
    } finally {
      s.sql("DROP TABLE IF EXISTS q_lineitem")
      s.sql("DROP TABLE IF EXISTS q_orders")
    }
  }

  test("selective joins stay bloom-filter eligible when dims outgrow broadcast") {
    val s = spark
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // 0 disables the stats-gated dim hint — this test exercises the
      // regime where dims have outgrown broadcast range entirely
      "spark.graft.dimBroadcastBytes" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB")
    val prev = conf.keys.map(k => k -> s.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => s.conf.set(k, v) }
      // q3 (selective dim filter on customer) and q7 (selective nation
      // dims): the optimizer must inject a bloom semi-join reduction on
      // the fact side — proof our join shapes don't block runtime
      // filtering in the no-broadcast regime
      Seq("q3_topk", "q7_flow").foreach { name =>
        val q = graft.queries.Registry.all.find(_.name == name).get
        val p = q.fn(s, SfDir).queryExecution.optimizedPlan.toString.toLowerCase
        assert(p.contains("bloom"),
          s"$name: expected an injected runtime bloom filter:\n${p.take(1200)}")
      }
    } finally {
      prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
  }
}
