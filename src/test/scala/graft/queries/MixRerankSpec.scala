package graft.queries

import graft.{SparkSpec, Tables}

/** Independent plain-Scala recomputes of `mix_sources`,
  * `weighted_sample`, and `rerank_topk` on the sf0.001 fixture — own
  * md5 hashing, own integer-division rate math, own quality arithmetic,
  * own two-stage ranking — so neither the Spark plan nor the shared
  * DuckDB-declared arithmetic can vouch for itself. */
class MixRerankSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  /** Same 60-bit salted hash as CurationOps.hash60, recomputed from
    * scratch via java.security. */
  private def hash60(salt: String, id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + id.toString).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("mix_sources matches an integer-arithmetic recompute and the target mixture") {
    val docs = Tables.documents(spark, SfDir)
      .selectExpr("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val targets = CurationOps.MixTargets.toMap
    val listed = docs.filter(d => targets.contains(d._2))
    val ns = listed.groupBy(_._2).map { case (s, d) => s -> d.length.toLong }
    val nout = ns.map { case (s, n) => n * 1000L / targets(s) }.min
    val rates = ns.map { case (s, n) =>
      s -> (targets(s) * nout / 1000L) * 1000L / n
    }
    val expected = listed.filter { case (id, s) =>
      hash60("mix:", id) % 1000L < rates(s)
    }.map(_._1).sorted
    val got = SparkEntryQueries("mix_sources").collect().map(_.getLong(0))
    assert(got.sameElements(expected),
      s"${got.length} kept vs expected ${expected.length}")
    // dropped sources stay dropped; binding source keeps everything
    assert(!got.exists(id => !targets.contains(docs.find(_._1 == id).get._2)))
  }

  test("weighted_sample matches an independent quality recompute") {
    val stop = graft.functions.TextFunctions.Stopwords.toSet
    val docs = Tables.documents(spark, SfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def quality(text: String): Double = {
      val nChars = text.length.toDouble
      val toks = tokensOf(text)
      val nToks = math.max(toks.length.toDouble, 1.0)
      val nStop = toks.count(stop).toDouble
      val punct = text.count(c => !c.isLetterOrDigit && !c.isWhitespace).toDouble
      val lenScore = math.min(nChars / 500.0, 1.0)
      val stopScore = math.min(nStop / nToks * 3.0, 1.0)
      val punctPen = math.min(punct / math.max(nChars, 1.0) * 5.0, 1.0)
      round6(lenScore * 0.4 + stopScore * 0.4 + (1.0 - punctPen) * 0.2)
    }
    val expected = docs.filter { case (id, t) =>
      hash60("wq:", id) % 1000000L < math.floor(quality(t) * 1000000.0)
    }.map(_._1).sorted
    val got = SparkEntryQueries("weighted_sample").collect().map(_.getLong(0))
    assert(got.sameElements(expected),
      s"${got.length} kept vs expected ${expected.length}")
    // kept set is quality-biased: mean quality of kept >= mean of all
    val q = docs.map { case (_, t) => quality(t) }
    val keptQ = docs.filter(d => expected.contains(d._1))
      .map { case (_, t) => quality(t) }
    assert(keptQ.sum / keptQ.length >= q.sum / q.length)
  }

  test("rerank_topk matches a plain two-stage walk and refines the projected order") {
    val vecs = Tables.embeddings(spark, SfDir)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cosineTo(v: Array[Double], q: Seq[Double]): Double = {
      val d = q.indices.foldLeft(0.0)((a, i) => a + v(i) * q(i))
      val nv = math.sqrt(v.map(x => x * x).sum)
      val nq = math.sqrt(q.map(x => x * x).sum)
      if (nv == 0.0) 0.0 else round6(d / (nv * nq))
    }
    def proj(v: Array[Double]): Array[Double] =
      VectorOps.RpRows.map(row =>
        row.indices.foldLeft(0.0)((a, i) => a + row(i) * v(i))).toArray
    val qp = proj(VectorOps.Q.toArray).toSeq
    val shortlist = vecs
      .map { case (id, v) => (id, v, cosineTo(proj(v), qp)) }
      .sortBy { case (id, _, s) => (-s, id) }
      .take(VectorOps.RerankShortlist)
    val expected = shortlist
      .map { case (id, v, _) => (id, cosineTo(v, VectorOps.Q)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(10)
    val got = SparkEntryQueries("rerank_topk").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1, s"rank order: $g != $e")
      assert(math.abs(g._2 - e._2) <= 1e-6 + 1e-9)
    }
  }


  test("ann_rerank matches a plain three-stage walk: prune, shortlist, rerank") {
    val vecs = Tables.embeddings(spark, SfDir)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cosineTo(v: Array[Double], q: Seq[Double]): Double = {
      val d = q.indices.foldLeft(0.0)((a, i) => a + v(i) * q(i))
      val nv = math.sqrt(v.map(x => x * x).sum)
      val nq = math.sqrt(q.map(x => x * x).sum)
      if (nv == 0.0) 0.0 else round6(d / (nv * nq))
    }
    def proj(v: Array[Double]): Array[Double] =
      VectorOps.RpRows.map(row =>
        row.indices.foldLeft(0.0)((a, i) => a + row(i) * v(i))).toArray
    def bucketOf(v: Array[Double]): Long =
      (0 until VectorOps.AnnBits)
        .foldLeft(0L)((acc, i) => if (v(i) > 0) acc | (1L << i) else acc)
    val qBucket = bucketOf(VectorOps.Q.toArray)
    val probes = (qBucket +: (0 until VectorOps.AnnBits)
      .map(b => qBucket ^ (1L << b))).toSet
    val qp = proj(VectorOps.Q.toArray).toSeq
    val pruned = vecs.filter { case (_, v) => probes(bucketOf(v)) }
    assert(pruned.length < vecs.length,
      "the bucket probe must actually prune the fixture corpus")
    val shortlist = pruned
      .map { case (id, v) => (id, v, cosineTo(proj(v), qp)) }
      .sortBy { case (id, _, s) => (-s, id) }
      .take(VectorOps.RerankShortlist)
    val expected = shortlist
      .map { case (id, v, _) => (id, cosineTo(v, VectorOps.Q)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(VectorOps.AnnK)
    val got = SparkEntryQueries("ann_rerank").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1, s"rank order: $g != $e")
      assert(math.abs(g._2 - e._2) <= 1e-6 + 1e-9)
    }
  }

  test("mmr_topk matches an independent greedy walk and diversifies") {
    val vecs = Tables.embeddings(spark, SfDir)
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until n).foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      if (na == 0.0 || nb == 0.0) 0.0
      else round6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    val q = VectorOps.Q.toArray
    val shortlist = vecs.map { case (id, lab, v) => (id, lab, v, cos6(v, q)) }
      .sortBy { case (id, _, _, rel) => (-rel, id) }
      .take(VectorOps.MmrShortlist)
    // greedy walk, written independently of MmrSelect
    var selected = Vector.empty[(Long, Int, Double, Int)]
    var selVecs = Vector.empty[Array[Double]]
    var remaining = shortlist.toVector
    (1 to VectorOps.MmrK).foreach { rank =>
      val scored = remaining.map { case c @ (id, _, v, rel) =>
        val red = if (selVecs.isEmpty) 0.0 else selVecs.map(s => cos6(v, s)).max
        val score = if (rank == 1) rel
          else VectorOps.MmrLambda * rel - (1.0 - VectorOps.MmrLambda) * red
        (c, score)
      }
      val best = scored.minBy { case ((id, _, _, _), s) => (-s, id) }
      selected :+= ((best._1._1, best._1._2, best._1._4, rank))
      selVecs :+= best._1._3
      remaining = remaining.filterNot(_._1 == best._1._1)
    }
    val got = SparkEntryQueries("mmr_topk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == selected.length)
    got.zip(selected).foreach { case (g, e) =>
      assert(g == e, s"mmr selection: $g != $e")
    }
    // diversification is real: MMR's tail differs from pure relevance
    val pureTop = shortlist.take(VectorOps.MmrK).map(_._1).toSeq
    assert(got.map(_._1).toSeq != pureTop,
      "MMR must reorder vs pure relevance on this fixture")
  }

  private def SparkEntryQueries(name: String) =
    Registry.all.find(_.name == name).get.fn(spark, SfDir)
}
