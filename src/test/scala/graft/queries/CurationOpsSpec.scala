package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Curation operators verified against independent in-JVM recomputations
  * (plain Scala union-find / greedy packing / MessageDigest hashing — no
  * Spark expressions), on the sf0.001 fixture. The DuckDB oracle is the
  * cross-engine check; these specs are the cross-IMPLEMENTATION check.
  */
class CurationOpsSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  /** Reference md5-prefix hash, computed with java.security directly. */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("dedup_clusters equals a plain union-find over the lsh pair graph") {
    val pairs = SparkEntry.queries("lsh_pairs")(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = SparkEntry.queries("dedup_clusters")(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    // independent union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = got.keys.groupBy(find)
    members.foreach { case (_, ids) =>
      val expectedLbl = ids.min
      ids.foreach { id =>
        assert(got(id) == expectedLbl,
          s"doc $id: got cluster ${got(id)}, union-find says $expectedLbl")
      }
    }
    assert(got.size == members.values.map(_.size).sum)
    // sanity: the fixture actually exercises non-trivial clusters
    assert(pairs.nonEmpty, "fixture produced no LSH pairs — spec is vacuous")
    assert(got.values.toSet.size < got.size, "no doc ever clustered")
  }

  test("components: all three adaptive tiers produce identical labelings") {
    // same fixture, three plans: driver union-find (the default at this
    // scale), distributed fixpoint over checkpointed edges, distributed
    // fixpoint over the src-partitioned persisted edges (the sf10 form) —
    // forced via the session conf gates
    def run(): Array[(Long, Long)] =
      SparkEntry.queries("dedup_clusters")(spark, SfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val driver = run()
    val checkpointed =
      try {
        spark.conf.set("spark.graft.cc.driverMaxPairs", "0")
        run()
      } finally spark.conf.unset("spark.graft.cc.driverMaxPairs")
    val partitioned =
      try {
        spark.conf.set("spark.graft.cc.driverMaxPairs", "0")
        spark.conf.set("spark.graft.cc.edgeCheckpointMaxRows", "0")
        run()
      } finally {
        spark.conf.unset("spark.graft.cc.driverMaxPairs")
        spark.conf.unset("spark.graft.cc.edgeCheckpointMaxRows")
      }
    assert(driver.sameElements(checkpointed),
      "driver union-find diverged from the checkpointed fixpoint")
    assert(driver.sameElements(partitioned),
      "driver union-find diverged from the partitioned fixpoint")
    assert(driver.map(_._2).distinct.length < driver.length,
      "fixture never clustered — parity is vacuous")
  }

  test("pack_sequences matches greedy per-shard packing recomputed in Scala") {
    val rows = SparkEntry.queries("pack_sequences")(spark, SfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // shard must be the reference hash
    rows.foreach { case (id, shard, _, _) =>
      assert(shard == hash60("pack:" + id) % CurationOps.PackShards,
        s"doc $id landed in shard $shard")
    }
    // recompute pack ids: per shard, docs in id order, running total
    rows.groupBy(_._2).foreach { case (shard, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, nTok, packId) =>
        val expected = shard * CurationOps.PackIdBase + cum / CurationOps.PackBudget
        assert(packId == expected, s"doc $id: pack $packId, expected $expected")
        cum += nTok
      }
    }
    // budget semantics: a pack's post-fill total overruns its boundary by
    // at most one document (first-fill-then-advance), never two
    rows.groupBy(_._4).foreach { case (packId, docs) =>
      val tokens = docs.map(_._3).sum
      val allButLast = tokens - docs.maxBy(_._1)._3
      assert(docs.map(_._3).exists(_ >= CurationOps.PackBudget) ||
        allButLast < CurationOps.PackBudget,
        s"pack $packId closed late: $tokens tokens")
    }
  }

  test("sample_topk_stratified == smallest-k hashes per lang recomputed in Scala") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, SfDir)
      .select($"doc_id", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs
      .map { case (id, lang) => (id, lang, hash60("strat:" + id)) }
      .groupBy(_._2).values
      .flatMap(_.sortBy(t => (t._3, t._1)).take(CurationOps.StratTopK))
      .map(_._1).toSet
    val got = SparkEntry.queries("sample_topk_stratified")(spark, SfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
  }

  test("decontaminate == Scala set-intersection of eval/train n-grams") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, SfDir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      toks.sliding(CurationOps.DecontamN)
        .filter(_.length == CurationOps.DecontamN)
        .map(_.mkString(" ")).toSet
    }
    val evalGrams = docs.filter(_._1 % CurationOps.DecontamEvalMod == 0)
      .flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(_._1 % CurationOps.DecontamEvalMod != 0)
      .map { case (id, t) => (id, grams(t).count(evalGrams.contains).toLong) }
      .filter(_._2 > 0).toMap
    val got = SparkEntry.queries("decontaminate")(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("repetition_score == Scala sliding-window recompute, and flags repeats") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, SfDir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val toks = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val total = toks.length - 2
      val rep = if (toks.length <= 2) 0.0
        else {
          val d = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet.size
          // exact-rational rounding, matching the query's integer form
          (BigDecimal(total - d) / BigDecimal(total))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      id -> rep
    }.toMap
    val got = SparkEntry.queries("repetition_score")(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(got == expected)
    // sanity on constructed input: a looping doc scores high
    val loop = spark.createDataFrame(Seq((1L, ("spam ham eggs " * 20).trim)))
      .toDF("doc_id", "text")
    val nd = loop.select(org.apache.spark.sql.functions.size(
      graft.GraftFunctions.columnOf(graft.functions.WordNgrams(
        graft.GraftFunctions.exprOf($"text"), 3)))).collect().head.getInt(0)
    assert(nd == 3, "a 3-word loop has exactly 3 distinct 3-grams")
  }

  test("sample_stratified keeps exactly the hash-selected members per stratum") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, SfDir)
      .select($"doc_id", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rates = CurationOps.StratRates.toMap
    val expected = docs.filter { case (id, lang) =>
      hash60("strat:" + id) % 1000 < rates.getOrElse(lang, 0L)
    }.map(_._1).toSet
    val got = SparkEntry.queries("sample_stratified")(spark, SfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"membership drift: extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    assert(got.nonEmpty && got.size < docs.length,
      "sample should be a proper non-empty subset")
  }
}
