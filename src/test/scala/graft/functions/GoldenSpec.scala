package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pinned literal goldens (SURVEY §5): exact fingerprints/vectors for the
  * three non-SQL-oracle functions. Persisted Tier-1/Tier-2 data depends on
  * these values — if a change here is intentional, it is a store-format
  * break and must bump a version, not silently re-pin. */
class GoldenSpec extends AnyFunSuite {

  test("simhash64 golden fingerprints") {
    val goldens = Seq(
      "" -> -3162216497309240828L,
      "abc" -> -8070080442485551184L,
      "connection timeout from host" -> 5138199454816733214L,
      "user * logged in from *" -> 8522077287210991952L,
      "Payment failed for order *: card declined" -> 4672618216778920398L)
    goldens.foreach { case (in, want) =>
      assert(Simhash64.computeString(in) == want, s"input: '$in'")
    }
  }

  test("embed_text golden buckets") {
    def firstNonZero(s: String, k: Int): Seq[(Int, Float)] =
      EmbedText.embedString(s).zipWithIndex.filter(_._1 != 0f).take(k)
        .map { case (x, i) => (i, x) }.toSeq
    assert(firstNonZero("hello world", 5) == Seq(
      (156, -0.33333334f), (179, 0.33333334f), (186, 0.33333334f),
      (224, -0.33333334f), (249, 0.33333334f)))
    assert(firstNonZero("database connection timeout", 5) == Seq(
      (34, 0.18257418f), (43, -0.18257418f), (55, -0.18257418f),
      (64, -0.18257418f), (105, 0.18257418f)))
  }

  test("bm25_sparse golden buckets and weights") {
    val r = Bm25Sparse.compute(UTF8String.fromString("the cat sat on the mat"))
    val idx = r.getArray(0)
    val vals = r.getArray(1)
    assert((0 until idx.numElements()).map(idx.getInt) ==
      Seq(8411, 11433, 17090, 25611, 28248))
    val got = (0 until vals.numElements()).map(i => vals.getFloat(i))
    val want = Seq(1.6652868f, 1.895658f, 1.6652868f, 1.6652868f, 1.6652868f)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-6f) }
  }
}
