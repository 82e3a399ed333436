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

  test("selective joins stay bloom-filter eligible when dims outgrow broadcast") {
    val s = spark
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB")
    val prev = conf.keys.map(k => k -> s.conf.get(k)).toMap
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
      prev.foreach { case (k, v) => s.conf.set(k, v) }
    }
  }
}
