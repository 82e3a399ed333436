package graft.queries

import graft.SparkSpec

/** Property-style tests for the curation math on RANDOM corpora (not the
  * fixture): packing invariants and the TopKPerGroup/window equivalence
  * must hold for any input shape, including empty shards, one-token docs
  * and docs larger than the whole budget. Trials are seeded, so failures
  * reproduce. */
class CurationPropertySpec extends SparkSpec {

  test("pack ids: monotone per shard, budget rule, collision-free (10 seeded trials)") {
    import spark.implicits._
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 80).map(_ => rnd.nextLong(500L))
        .distinct
        .map(id => (id, ("w " * rnd.nextInt(5000)).trim))
      val out = CurationOps.packColumns(
          docs.toDF("doc_id", "text").repartition(3))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
          r.getAs[Long]("n_tok"), r.getAs[Long]("pack_id")))
      assert(out.length == docs.length)
      // every row's pack id recomputes from its shard's running total
      out.groupBy(_._2).foreach { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).foreach { case (id, _, n, pid) =>
          assert(pid == shard * CurationOps.PackIdBase +
            cum / CurationOps.PackBudget, s"seed $seed doc $id")
          cum += n
        }
      }
      val byPack = out.groupBy(_._4)
      // pack ids never collide across shards
      byPack.foreach { case (_, ds) => assert(ds.map(_._2).distinct.length == 1) }
      // a pack's pre-overflow total stays under budget (overflow only by
      // the final doc — first-fill-then-advance)
      byPack.foreach { case (pid, ds) =>
        val last = ds.maxBy(_._1)
        assert(ds.map(_._3).sum - last._3 < CurationOps.PackBudget ||
          ds.exists(_._3 >= CurationOps.PackBudget), s"seed $seed pack $pid")
      }
    }
  }

  test("components: driver and distributed tiers agree on random corpora") {
    import spark.implicits._
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      // random near-dup groups: members share a 30-word base with tiny
      // tails, so LSH links most of each group; group sizes 1-3 make
      // singletons, pairs and chains all appear
      val docs = (0 until 12).flatMap { g =>
        val words = (0 until 30).map(_ => s"w${rnd.nextInt(50)}").mkString(" ")
        (0 until 1 + rnd.nextInt(3)).map(m => (g * 10L + m, s"$words tail$m"))
      }.toDF("doc_id", "text")
      def run(): Seq[(Long, Long)] =
        CurationOps.connectedComponents(docs).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val driver = run()
      val dist =
        try {
          spark.conf.set("spark.graft.cc.driverMaxPairs", "0")
          run()
        } finally spark.conf.unset("spark.graft.cc.driverMaxPairs")
      assert(driver == dist, s"tier divergence at seed $seed")
      assert(driver.map(_._1) == docs.select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq, s"coverage at seed $seed")
    }
  }

  test("TopKPerGroup == window top-k on random grouped data (10 seeded trials)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val rows = (0 until 120).map(i =>
        (s"g${rnd.nextInt(8)}", rnd.nextLong(30L) * 1000 + i,
          rnd.nextInt(201).toDouble - 100))
      val df = rows.toDF("grp", "id", "score")
      val got = graft.plans.TopKPerGroup(df, Seq("grp"),
          Seq(("score", false), ("id", true)), 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted
      val want = df.withColumn("rn", row_number().over(
          Window.partitionBy($"grp").orderBy($"score".desc, $"id")))
        .filter($"rn" <= 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(got.sameElements(want), s"seed $seed")
    }
  }
}
