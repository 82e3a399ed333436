package graft.queries

import graft.Tables
import graft.functions.TextFunctions.matchText
import graft.functions.VectorFunctions.cosineToConst
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid dense + sparse retrieval with reciprocal-rank fusion — the one
  * reference capability claim (QDRANT-FEATURES.md:21-23: "a single query
  * can leverage a dense vector, a sparse BM25 vector, and a MatchText
  * filter") whose fused form the reference stores the legs for
  * (qdrant_service.py:124-129 writes both vectors) but never executes.
  *
  * Semantics: a MatchText pre-filter restricts the CANDIDATE set, each leg
  * ranks its top-[[LegN]] candidates independently (dense = exact cosine
  * vs the fixed query vector [[VectorOps.Q]]; sparse = BM25 of the fixed
  * [[TextOps.QueryTerms]] query with FULL-corpus IDF — the filter narrows
  * candidates, never the stats model), and RRF fuses:
  * `score(d) = Σ_leg 1/(k + rank_leg(d))` with the standard k=[[RrfK]],
  * absent-from-a-leg contributing 0.
  *
  * Scale shape: each leg is scan → codegen'd scoring expression →
  * TakeOrderedAndProject (distributed top-N, never a global sort); the
  * rank windows and the fusion join touch only the two ≤[[LegN]]-row
  * shortlists, so the single-partition window is a bounded constant, not
  * a data-scale funnel. The embedding side joins the candidate ids with a
  * semi-join that AQE will broadcast whenever the MatchText survivor set
  * is small.
  */
object HybridOps {

  def queries: Seq[QueryDef] = Seq(hybridRrf)

  /** Standard RRF smoothing constant (Cormack et al., SIGIR 2009). */
  val RrfK = 60

  /** Per-leg shortlist depth. */
  val LegN = 50

  /** MatchText pre-filter: candidates must contain this token. A single
    * term of the sparse query, so the filter is a superset of the BM25
    * hits and genuinely gates the dense leg. */
  val MatchQuery = "filter"

  private val hybridRrf = QueryDef(
    "hybrid_rrf",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val candidates = docs.filter(matchText($"text", MatchQuery))
        .select($"doc_id")
      // sparse leg: full-corpus BM25 stats, candidates only, top-N
      val sparseLeg = TextOps.bm25Scores(docs)
        .join(candidates, Seq("doc_id"), "left_semi")
        .filter($"bm25" > 0)
        .orderBy($"bm25".desc, $"doc_id")
        .limit(LegN)
      val sRank = sparseLeg.withColumn("s_rank",
        row_number().over(Window.orderBy($"bm25".desc, $"doc_id")).cast("long"))
      // dense leg: exact cosine over the candidates' embeddings, top-N
      val denseLeg = Tables.embeddings(s, dir)
        .join(candidates.select($"doc_id".as("vec_id")), Seq("vec_id"), "left_semi")
        .select($"vec_id".as("doc_id"),
          round(cosineToConst($"embedding", VectorOps.Q), 6).as("dscore"))
        .orderBy($"dscore".desc, $"doc_id")
        .limit(LegN)
      val dRank = denseLeg.withColumn("d_rank",
        row_number().over(Window.orderBy($"dscore".desc, $"doc_id")).cast("long"))
      dRank.select($"doc_id", $"d_rank")
        .join(sRank.select($"doc_id", $"s_rank"), Seq("doc_id"), "full_outer")
        .select($"doc_id", $"d_rank", $"s_rank",
          round(coalesce(lit(1.0) / (lit(RrfK) + $"d_rank"), lit(0.0))
            + coalesce(lit(1.0) / (lit(RrfK) + $"s_rank"), lit(0.0)), 6).as("rrf"))
        .orderBy($"rrf".desc, $"doc_id")
        .limit(20)
    },
    Some {
      import TextOps.{Bm25B, Bm25K1, QueryTerms}
      val toks = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)"
      val tfCols = QueryTerms.map(t =>
        s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf_$t").mkString(",\n          ")
      val dfCols = QueryTerms.map(t =>
        s"sum(CASE WHEN tf_$t > 0 THEN 1.0 ELSE 0.0 END) OVER () AS df_$t").mkString(",\n          ")
      val scoreExpr = QueryTerms.map { t =>
        s"""(ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0)
           * (tf_$t * ($Bm25K1 + 1.0))
           / (tf_$t + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * dl / avgdl)))"""
      }.mkString(" + ")
      val qv = VectorOps.QSql
      val qn = VectorOps.QNorm
      s"""
      WITH d AS (
        SELECT doc_id, $toks AS toks FROM documents),
      d2 AS (
        SELECT doc_id, len(toks)::DOUBLE AS dl,
          list_contains(toks, '$MatchQuery') AS m,
          $tfCols
        FROM d),
      st AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM d2),
      d3 AS (
        SELECT *,
          $dfCols
        FROM d2, st),
      sleg AS (
        SELECT doc_id, round($scoreExpr, 6) AS bm25
        FROM d3
        WHERE m AND round($scoreExpr, 6) > 0
        ORDER BY bm25 DESC, doc_id
        LIMIT $LegN),
      sr AS (
        SELECT doc_id,
          row_number() OVER (ORDER BY bm25 DESC, doc_id) AS s_rank
        FROM sleg),
      e AS (
        SELECT vec_id, embedding,
          sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nv
        FROM embeddings
        WHERE vec_id IN (SELECT doc_id FROM d2 WHERE m)),
      dleg AS (
        SELECT vec_id AS doc_id,
          round(CASE WHEN nv * $qn = 0 THEN 0.0
            ELSE list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * $qv[i])) / (nv * $qn)
            END, 6) AS dscore
        FROM e
        ORDER BY dscore DESC, doc_id
        LIMIT $LegN),
      dr AS (
        SELECT doc_id,
          row_number() OVER (ORDER BY dscore DESC, doc_id) AS d_rank
        FROM dleg)
      SELECT coalesce(dr.doc_id, sr.doc_id) AS doc_id, d_rank, s_rank,
        round(coalesce(1.0::DOUBLE / ($RrfK + d_rank), 0.0)
          + coalesce(1.0::DOUBLE / ($RrfK + s_rank), 0.0), 6) AS rrf
      FROM dr
      FULL OUTER JOIN sr ON dr.doc_id = sr.doc_id
      ORDER BY rrf DESC, doc_id
      LIMIT 20
    """
    })
}
