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
        val expected = shard * 1000000L + cum / CurationOps.PackBudget
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
