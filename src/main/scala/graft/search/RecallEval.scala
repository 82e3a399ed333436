package graft.search

import graft.functions.VectorFunctions.{cosine, matVec, packSignBits}
import graft.queries.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation for the ANN pruning family: recall@k of
  * each approximate method against the exact cosine ranking, over a
  * SAMPLE of query vectors — the measurement the single-query gate rows
  * cannot provide (they prove determinism for ONE pinned query; this
  * quantifies what the pruning gives up across many).
  *
  * Every method evaluates ALL queries in ONE Spark job: the query sample
  * rides as a broadcast relation (n rows — never corpus-sized) and each
  * method's per-query candidate generation is expressed as the SAME
  * restriction its gate query applies (bucket equi-join for sign-LSH,
  * probed-centroid join for IVF, ADC lookup join for PQ, probe → JL
  * shortlist → exact rerank for the composition), followed by a
  * per-query top-k window over the scored candidates. Recall@k then
  * falls out of one (qid, vec_id) equi-join against the exact top-k —
  * total shuffle volume O(n·k), corpus touched once per method.
  *
  * RecallSpec pins per-method floors on seeded samples; SCALE.md records
  * the measured values. */
object RecallEval {

  /** Deterministic query sample: `n` seeded uniform [-1,1)^64 vectors.
    * Uniform random queries are the ADVERSARIAL case for sign-bucket LSH
    * (no cluster structure to exploit), so floors pinned on this sample
    * are conservative. */
  def queryVectors(n: Int, seed: Long = 42L): Seq[(Long, Seq[Double])] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(q => q.toLong -> Seq.fill(64)(rng.nextDouble() * 2 - 1))
  }

  /** Query-sample relation (qid, qvec, probe buckets, JL projection) —
    * broadcast-sized, one row per query. */
  def queriesDf(spark: SparkSession, qs: Seq[(Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    qs.map { case (qid, v) =>
      (qid, v, AnnIndex.probeBuckets(v),
        VectorOps.RpRows.map(r => r.indices.foldLeft(0.0)((a, i) => a + r(i) * v(i))))
    }.toDF("qid", "qvec", "probes", "qproj")
  }

  /** Per-query top-k by a score column over (qid, vec_id, score) rows.
    * Ascending=false ⇒ higher is better; ties break to smaller vec_id
    * (every gate query's rule). */
  private def topKPerQuery(scored: DataFrame, k: Int, asc: Boolean): DataFrame = {
    val ord = if (asc) Seq(col("score").asc, col("vec_id").asc)
              else Seq(col("score").desc, col("vec_id").asc)
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(ord: _*)))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
  }

  /** Exact cosine top-k per query — the recall-100 ground truth. */
  def exactTopK(emb: DataFrame, qs: DataFrame, k: Int): DataFrame =
    topKPerQuery(
      emb.crossJoin(broadcast(qs.select(col("qid"), col("qvec"))))
        .select(col("qid"), col("vec_id"),
          round(cosine(col("embedding"), col("qvec")), 6).as("score")),
      k, asc = false)

  /** Sign-bucket LSH with 1-bit multi-probe (the `ann_lsh` restriction):
    * candidates = vectors whose bucket is in the query's probe set,
    * via a bucket equi-join (probes exploded query-side). */
  def lshTopK(emb: DataFrame, qs: DataFrame, k: Int): DataFrame = {
    val probes = qs.select(col("qid"), col("qvec"),
      explode(col("probes")).as("bucket"))
    topKPerQuery(
      emb.withColumn("bucket", packSignBits(col("embedding"), VectorOps.AnnBits))
        .join(broadcast(probes), Seq("bucket"))
        .select(col("qid"), col("vec_id"),
          round(cosine(col("embedding"), col("qvec")), 6).as("score")),
      k, asc = false)
  }

  /** IVF with nprobe probed centroids (the `ann_ivf` restriction):
    * corpus assigned to nearest centroid once; each query scores only
    * vectors in its nprobe nearest centroids' partitions. */
  def ivfTopK(emb: DataFrame, qs: DataFrame, k: Int,
      nprobe: Int = VectorOps.IvfNprobe,
      centroids: Option[DataFrame] = None): DataFrame = {
    import emb.sparkSession.implicits._
    val cents = centroids.getOrElse(
      emb.filter($"vec_id".isin(VectorOps.IvfCentroids: _*))
        .select($"vec_id".as("cid"), $"embedding".as("cvec")))
    val assigned = emb.select($"vec_id", $"embedding")
      .crossJoin(broadcast(cents))
      .withColumn("cs", cosine($"embedding", $"cvec"))
      .groupBy($"vec_id")
      .agg(graft.GraftFunctions.maxByPrim(struct($"cid"), struct(coalesce($"cs", lit(-2d)), -$"cid")).getField("cid").as("cid"))
    val qProbes = topKPerQuery(
      qs.select($"qid", $"qvec").crossJoin(broadcast(cents))
        .select($"qid", $"cid".as("vec_id"), cosine($"cvec", $"qvec").as("score")),
      nprobe, asc = false)
      .select($"qid", $"vec_id".as("cid"))
    topKPerQuery(
      emb.join(assigned, "vec_id")
        .join(broadcast(qProbes), Seq("cid"))
        .join(broadcast(qs.select($"qid", $"qvec")), Seq("qid"))
        .select($"qid", $"vec_id",
          round(cosine($"embedding", $"qvec"), 6).as("score")),
      k, asc = false)
  }

  /** PQ/ADC (the `pq_topk` restriction): corpus encoded once as m
    * sub-centroid codes; each query scores every vector as the sum of m
    * table lookups — approximation error comes from quantization, not
    * candidate pruning. */
  def pqTopK(emb: DataFrame, qs: DataFrame, k: Int): DataFrame = {
    import emb.sparkSession.implicits._
    val m = VectorOps.PqM
    val sub = VectorOps.PqSub
    def l2 = "(acc, i) -> acc + (CAST(element_at(svec, i) AS DOUBLE) - CAST(element_at(cvec, i) AS DOUBLE)) * (CAST(element_at(svec, i) AS DOUBLE) - CAST(element_at(cvec, i) AS DOUBLE))"
    val subCents = emb.filter($"vec_id".isin(VectorOps.SemCentroids: _*))
      .select($"vec_id".as("cid"), explode(expr(
        s"transform(sequence(0, ${m - 1}), j -> struct(j AS j, slice(embedding, j*$sub+1, $sub) AS cvec))")).as("s"))
      .select($"cid", $"s.j".as("j"), $"s.cvec".as("cvec"))
    val ev = emb.select($"vec_id", explode(expr(
      s"transform(sequence(0, ${m - 1}), j -> struct(j AS j, slice(embedding, j*$sub+1, $sub) AS svec))")).as("s"))
      .select($"vec_id", $"s.j".as("j"), $"s.svec".as("svec"))
    val codes = ev.join(broadcast(subCents), Seq("j"))
      .withColumn("dist", expr(s"aggregate(sequence(1, $sub), 0D, $l2)"))
      .groupBy($"vec_id", $"j")
      .agg(min_by($"cid", struct($"dist", $"cid")).as("code"))
    val qTab = qs.select($"qid", $"qvec").crossJoin(broadcast(subCents))
      .withColumn("qd", round(expr(
        s"""aggregate(sequence(1, $sub), 0D,
            (acc, i) -> acc + (element_at(qvec, j*$sub+i) - CAST(element_at(cvec, i) AS DOUBLE)) * (element_at(qvec, j*$sub+i) - CAST(element_at(cvec, i) AS DOUBLE)))"""), 6))
      .select($"qid", $"j".as("qj"), $"cid".as("qcid"), $"qd")
    topKPerQuery(
      codes.join(broadcast(qTab), $"j" === $"qj" && $"code" === $"qcid")
        .groupBy($"qid", $"vec_id")
        .agg(round(sum($"qd"), 4).as("score")),
      k, asc = true)
  }

  /** Prune → JL shortlist → exact rerank (the `ann_rerank` composition):
    * LSH candidates, shortlisted by projected cosine, reranked exact. */
  def rerankTopK(emb: DataFrame, qs: DataFrame, k: Int,
      shortlistN: Int = VectorOps.RerankShortlist): DataFrame = {
    import emb.sparkSession.implicits._
    val probes = qs.select($"qid", $"qvec", $"qproj",
      explode($"probes").as("bucket"))
    val pruned = emb
      .withColumn("bucket", packSignBits($"embedding", VectorOps.AnnBits))
      .join(broadcast(probes), Seq("bucket"))
    val shortlist = topKPerQuery(
      pruned.select($"qid", $"vec_id",
        round(cosine(matVec($"embedding", VectorOps.RpRows), $"qproj"), 6)
          .as("score")),
      shortlistN, asc = false)
    topKPerQuery(
      shortlist
        .join(emb.select($"vec_id", $"embedding"), Seq("vec_id"))
        .join(broadcast(qs.select($"qid", $"qvec")), Seq("qid"))
        .select($"qid", $"vec_id",
          round(cosine($"embedding", $"qvec"), 6).as("score")),
      k, asc = false)
  }

  /** recall@k of `method` against `exact` — both (qid, vec_id) top-k
    * relations over the same query sample. */
  def recallAt(method: DataFrame, exact: DataFrame): Double = {
    val hits = method.join(exact, Seq("qid", "vec_id"), "left_semi").count()
    hits.toDouble / exact.count()
  }
}
