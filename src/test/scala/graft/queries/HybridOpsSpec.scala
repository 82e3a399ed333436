package graft.queries

import graft.{SparkEntry, SparkSpec}

/** `hybrid_rrf` verified against a plain-Scala recompute of both legs and
  * the fusion (no Spark expressions): tokenize + BM25 with full-corpus
  * stats, cosine vs the fixed query vector, per-leg ranks, RRF. The DuckDB
  * oracle is the cross-engine check; this is the cross-IMPLEMENTATION one.
  */
class HybridOpsSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hybrid_rrf matches a plain-Scala RRF over recomputed legs") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, SfDir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val embs = graft.Tables.embeddings(spark, SfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    def toks(text: String): Array[String] =
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

    // sparse leg: BM25, stats over the FULL corpus, candidates = docs
    // containing the MatchText term
    val tokenized = docs.map { case (id, t) => (id, toks(t)) }
    val n = tokenized.length.toDouble
    val avgdl = tokenized.map(_._2.length).sum.toDouble / n
    val terms = TextOps.QueryTerms
    val dfs = terms.map(t => t -> tokenized.count(_._2.contains(t)).toDouble).toMap
    def bm25(ts: Array[String]): Double = {
      val dl = ts.length.toDouble
      round6(terms.map { t =>
        val tf = ts.count(_ == t).toDouble
        val idf = math.log((n - dfs(t) + 0.5) / (dfs(t) + 0.5) + 1.0)
        idf * (tf * (TextOps.Bm25K1 + 1.0)) /
          (tf + TextOps.Bm25K1 * (1.0 - TextOps.Bm25B + TextOps.Bm25B * dl / avgdl))
      }.sum)
    }
    val candidates = tokenized.filter(_._2.contains(HybridOps.MatchQuery))
    val sRank = candidates
      .map { case (id, ts) => (id, bm25(ts)) }
      .filter(_._2 > 0)
      .sortBy { case (id, s) => (-s, id) }
      .take(HybridOps.LegN)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap

    // dense leg: cosine vs VectorOps.Q over the candidates' embeddings
    val q = VectorOps.Q.toArray
    val qn = math.sqrt(q.map(x => x * x).sum)
    val candIds = candidates.map(_._1).toSet
    val dRank = embs.filter(e => candIds.contains(e._1))
      .map { case (id, v) =>
        val nv = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
        val dot = v.zip(q).map { case (a, b) => a.toDouble * b }.sum
        (id, round6(if (nv * qn == 0) 0.0 else dot / (nv * qn)))
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(HybridOps.LegN)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap

    val expected = (sRank.keySet ++ dRank.keySet).toSeq
      .map { id =>
        val rrf = dRank.get(id).map(r => 1.0 / (HybridOps.RrfK + r)).getOrElse(0.0) +
          sRank.get(id).map(r => 1.0 / (HybridOps.RrfK + r)).getOrElse(0.0)
        (id, dRank.get(id), sRank.get(id), round6(rrf))
      }
      .sortBy { case (id, _, _, rrf) => (-rrf, id) }
      .take(20)

    val got = SparkEntry.queries("hybrid_rrf")(spark, SfDir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3)))

    assert(got.toSeq == expected,
      s"hybrid mismatch:\n got=${got.toSeq}\n exp=$expected")
    // vacuity guards: both legs ranked something, and the fused ordering is
    // not just one leg's ordering (the fixture genuinely exercises fusion)
    assert(sRank.nonEmpty && dRank.nonEmpty)
    assert(expected.map(_._1) != sRank.toSeq.sortBy(_._2).map(_._1).take(20))
    assert(expected.map(_._1) != dRank.toSeq.sortBy(_._2).map(_._1).take(20))
  }
}
