package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Quantified candidate recall for the MinHash LSH banding behind
  * `lsh_pairs` / `dedup_incremental` / the DedupIndex probes — the dedup
  * analogue of RecallSpec's ANN gates: the band join is a probabilistic
  * candidate generator, and this spec measures what it actually
  * surfaces against the banding theory.
  *
  * For shingle-Jaccard similarity s, a (r=4, b=4) banding surfaces a
  * pair with probability 1−(1−s⁴)⁴ (the S-curve). The fixture plants
  * near-dup pairs across mutation rates (2–20% token replacement →
  * similarities spread over the curve), computes each pair's EXACT
  * 5-char-shingle Jaccard in plain Scala, and asserts:
  *
  *  - measured recall over all planted pairs ≥ the pair-wise S-curve
  *    expectation minus a 0.15 concentration margin;
  *  - the high-similarity band (s ≥ 0.8, the dedup-relevant zone) is
  *    ≥ 0.85 (theory ≥ 0.93 there);
  *  - near-identical pairs (s ≥ 0.95) are NEVER missed — the contract
  *    exact-dup escalation relies on.
  */
class BandingRecallSpec extends SparkSpec {

  test("band-join candidate recall tracks the (4,4) S-curve on planted near-dups") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = (0 until 800).map(i => s"w$i")
    def baseDoc(): Seq[String] = Seq.fill(60)(vocab(rnd.nextInt(vocab.size)))
    def mutate(toks: Seq[String], p: Double): Seq[String] =
      toks.map(t => if (rnd.nextDouble() < p) vocab(rnd.nextInt(vocab.size)) else t)

    val rates = Seq(0.02, 0.05, 0.10, 0.20)
    val planted = (0 until 160).map { i =>
      val base = baseDoc()
      val rate = rates(i % rates.size)
      (i, base.mkString(" "), mutate(base, rate).mkString(" "))
    }
    // ids: base = 2i, mutated = 2i+1; planted pair = (2i, 2i+1)
    val docs = planted.flatMap { case (i, a, b) =>
      Seq((2L * i, a), (2L * i + 1, b))
    }.toDF("doc_id", "text")

    // exact truth: distinct 5-char shingles of the normalized text (the
    // same normalization ShingleHashes applies)
    def shingles(t: String): Set[String] = {
      val norm = t.toLowerCase.replaceAll("\\s+", " ")
      (0 to norm.length - 5).map(i => norm.substring(i, i + 5)).toSet
    }
    val sims = planted.map { case (i, a, b) =>
      val sa = shingles(a); val sb = shingles(b)
      val inter = (sa & sb).size.toDouble
      (2L * i, 2L * i + 1, inter / (sa.size + sb.size - inter))
    }

    // engine candidates: the lsh_pairs band-join shape
    val bands = TextOps.bandRelation(docs)
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val hits = sims.map { case (x, y, s) => (s, cands.contains((x, y))) }
    val recall = hits.count(_._2).toDouble / hits.size
    val expected = sims.map { case (_, _, s) =>
      1.0 - math.pow(1.0 - math.pow(s, 4), 4)
    }.sum / sims.size
    info(f"overall recall $recall%.3f vs S-curve expectation $expected%.3f")
    assert(recall >= expected - 0.15,
      f"banding recall $recall%.3f fell below S-curve expectation $expected%.3f - 0.15")

    val high = hits.collect { case (s, hit) if s >= 0.8 => hit }
    assert(high.nonEmpty, "fixture must plant high-similarity pairs")
    val highRecall = high.count(identity).toDouble / high.size
    info(f"s>=0.8 recall $highRecall%.3f over ${high.size} pairs")
    assert(highRecall >= 0.85,
      f"s>=0.8 recall $highRecall%.3f < 0.85 (theory >= 0.93)")

    val nearIdent = hits.collect { case (s, hit) if s >= 0.95 => hit }
    assert(nearIdent.nonEmpty && nearIdent.forall(identity),
      s"missed ${nearIdent.count(!_)} of ${nearIdent.size} near-identical pairs")
  }
}
