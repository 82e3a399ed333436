package graft.search

import graft.{SparkSpec, Tables}
import graft.search.RecallEval._

/** Quantified retrieval quality for the ANN pruning family — the recall
  * gate the single-query correctness rows cannot provide. Two seeded
  * query samples, 100 queries each:
  *
  *  - UNIFORM sample: random [-1,1)^64 queries over the synthetic
  *    corpus — the ADVERSARIAL case (no cluster structure for the
  *    pruning to exploit). The floors here are deliberately modest and
  *    what they pin is the LIFT over blind pruning: sign-LSH multi-probe
  *    scans (1+8)/256 ≈ 3.5% of the corpus, so recall ≈ 0.035 would
  *    mean the bucketing is no better than random file-skipping;
  *    measured ≈ 0.12 (3.5× lift). IVF at nprobe=2/16 scans ~12.5%;
  *    measured ≈ 0.28 (2.2× lift). Measured values (seed 42):
  *    lsh 0.122, ivf 0.279, pq 0.135, rerank 0.122.
  *
  *  - PERTURBED sample: corpus vectors + small noise — the near-dup
  *    lookup a retrieval/dedup user actually runs. recall@1 (does the
  *    method find the source vector?) is the guarantee that matters and
  *    it is ≈ perfect: lsh/rerank/ivf 1.00, pq 0.95 (seed 7).
  *
  *  - The recall KNOB must work: raising IVF nprobe 2 → 8 must raise
  *    uniform recall@10 substantially (measured 0.279 → 0.722) — this is
  *    the lever SCALE.md tells a 100 TB operator to turn.
  */
class RecallSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private val K = 10
  private val N = 100

  private lazy val emb = Tables.embeddings(spark, SfDir)
  private lazy val qsUniform = queriesDf(spark, queryVectors(N, seed = 42L))
  private lazy val exactUniform = {
    val e = exactTopK(emb, qsUniform, K).cache(); e.count(); e
  }

  test("uniform sample: every method beats blind pruning with margin") {
    val lsh = recallAt(lshTopK(emb, qsUniform, K), exactUniform)
    val ivf = recallAt(ivfTopK(emb, qsUniform, K), exactUniform)
    val pq = recallAt(pqTopK(emb, qsUniform, K), exactUniform)
    val rr = recallAt(rerankTopK(emb, qsUniform, K), exactUniform)
    // floors = measured - margin; the lift assertions are the real gate
    assert(lsh >= 0.10, s"lsh recall@10 $lsh < 0.10")
    assert(ivf >= 0.25, s"ivf recall@10 $ivf < 0.25")
    assert(pq >= 0.10, s"pq recall@10 $pq < 0.10")
    assert(rr >= 0.10, s"rerank recall@10 $rr < 0.10")
    // lift over the scanned-fraction baseline (blind pruning recall ==
    // fraction of corpus scanned): lsh multi-probe scans ~3.5%, ivf
    // nprobe/nlist = 12.5%
    assert(lsh >= 2.5 * (1.0 + graft.queries.VectorOps.AnnBits) / 256.0,
      s"lsh recall@10 $lsh shows no lift over blind 3.5% pruning")
    assert(ivf >= 1.8 * graft.queries.VectorOps.IvfNprobe / 16.0,
      s"ivf recall@10 $ivf shows no lift over blind 12.5% pruning")
    // the rerank composition may not beat its own candidate generator
    // (same LSH prune), but must not fall below it by more than the JL
    // shortlist can drop (shortlist >> k, so: equal here)
    assert(rr >= lsh - 0.02, s"rerank $rr fell below its lsh prune $lsh")
  }

  test("perturbed-corpus sample: near-dup lookup recall@1 is ~perfect") {
    import org.apache.spark.sql.Row
    val base = emb.select("vec_id", "embedding").collect()
      .map { r: Row => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq }
      .toMap
    val rng = new scala.util.Random(7)
    val ids = base.keys.toSeq.sorted
    val qsB = queriesDf(spark, (0 until N).map { i =>
      val src = ids(rng.nextInt(ids.size))
      i.toLong -> base(src).map(x => x + (rng.nextDouble() - 0.5) * 0.02)
    })
    val exactB = exactTopK(emb, qsB, 1).cache(); exactB.count()
    assert(recallAt(lshTopK(emb, qsB, 1), exactB) >= 0.95)
    assert(recallAt(rerankTopK(emb, qsB, 1), exactB) >= 0.95)
    assert(recallAt(ivfTopK(emb, qsB, 1), exactB) >= 0.95)
    assert(recallAt(pqTopK(emb, qsB, 1), exactB) >= 0.90)
  }

  test("trained centroids buy recall at every nprobe (the r8 gap)") {
    // measured (seed 42): seed-row 0.279/0.436/0.722 at nprobe 2/4/8;
    // trained 0.368/0.564/0.804 — floors carry ~0.03 margin for float
    // summation order in the training combine
    val cdf = KMeans.train(emb, k = 16).toDf(spark)
    val floors = Seq(2 -> 0.33, 4 -> 0.50, 8 -> 0.75)
    floors.foreach { case (np, floor) =>
      val seed = recallAt(ivfTopK(emb, qsUniform, K, nprobe = np), exactUniform)
      val trained = recallAt(
        ivfTopK(emb, qsUniform, K, nprobe = np, centroids = Some(cdf)),
        exactUniform)
      assert(trained >= floor, s"nprobe=$np trained recall $trained < $floor")
      assert(trained > seed + 0.03,
        s"nprobe=$np training bought no recall: seed $seed trained $trained")
    }
  }

  test("the recall knob works: IVF nprobe 2 -> 8 buys recall") {
    val r2 = recallAt(ivfTopK(emb, qsUniform, K, nprobe = 2), exactUniform)
    val r8 = recallAt(ivfTopK(emb, qsUniform, K, nprobe = 8), exactUniform)
    assert(r8 >= 0.60, s"nprobe=8 recall $r8 < 0.60")
    assert(r8 > r2 + 0.2, s"nprobe 2->8 lifted recall only $r2 -> $r8")
  }
}
