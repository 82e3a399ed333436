package graft.functions

import graft.{GraftFunctions, SparkSpec}
import org.apache.spark.sql.functions.col

class Bm25SparseSpec extends SparkSpec {

  private def sparseOf(text: String): (Seq[Int], Seq[Float]) = {
    import spark.implicits._
    val r = Seq(text).toDF("t")
      .select(GraftFunctions.columnOf(
        Bm25Sparse(GraftFunctions.exprOf(col("t")))).as("s"))
      .select("s.idx", "s.val").collect().head
    (r.getSeq[Int](0).toList, r.getSeq[Float](1).toList)
  }

  test("indices ascending, one entry per distinct term, deterministic") {
    val (idx, vals) = sparseOf("the cat sat on the mat the cat")
    assert(idx == idx.sorted && idx.distinct == idx)
    assert(idx.length == 5, "the/cat/sat/on/mat -> 5 buckets")
    assert(idx.forall(i => i >= 0 && i < Bm25Sparse.Dim))
    assert(sparseOf("the cat sat on the mat the cat") == ((idx, vals)))
  }

  test("independent pin: buckets and TF weights recomputed outside the JVM") {
    // Expected values come from an INDEPENDENT Python reimplementation of
    // the murmur bucketing and the BM25 TF formula (ADVICE r3: sparse
    // golden rows previously pinned only engine output). Buckets are
    // exact; weights allow 1e-6 for float32 representation.
    val (idx, vals) = sparseOf("hello world hello")
    assert(idx == List(13783, 22937), s"buckets drifted: $idx")
    // avgdl=256 default: tf=2 -> 1.9043111, tf=1 -> 1.6786885
    assert(math.abs(vals(0) - 1.9043111f) < 1e-6f, s"vals=$vals")
    assert(math.abs(vals(1) - 1.6786885f) < 1e-6f, s"vals=$vals")
    // corpus-avgdl form (Bm25SparseDl semantics): avgdl = dl = 3 collapses
    // the length normalization -> 1.375 / 1.0 exactly
    val r = Bm25Sparse.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world hello"), 3.0)
    val dlVals = (0 until r.getArray(1).numElements())
      .map(i => r.getArray(1).getFloat(i))
    assert(math.abs(dlVals(0) - 1.375f) < 1e-6f && math.abs(dlVals(1) - 1.0f) < 1e-6f,
      s"corpus-avgdl weights drifted: $dlVals")
  }

  test("TF saturation: repeated term weighs more but sub-linearly") {
    def weightOf(text: String, term: String): Float = {
      val h = scala.util.hashing.MurmurHash3.stringHash(term, 0x5bd1e995)
      val bucket = ((h % Bm25Sparse.Dim) + Bm25Sparse.Dim) % Bm25Sparse.Dim
      val (idx, vals) = sparseOf(text)
      vals(idx.indexOf(bucket))
    }
    val w1 = weightOf("cat dog", "cat")
    val w2 = weightOf("cat cat dog", "cat")
    val w4 = weightOf("cat cat cat cat dog", "cat")
    assert(w1 < w2 && w2 < w4)
    assert((w4 - w2) < (w2 - w1), "saturating TF curve")
  }

  test("sparse dot scores shared-vocabulary docs higher") {
    val (ai, av) = sparseOf("database connection refused by primary")
    val (bi, bv) = sparseOf("database connection refused by replica")
    val (ci, cv) = sparseOf("zebra lighthouse quantum")
    val near = Bm25Sparse.dot(ai.toArray, av.toArray, bi.toArray, bv.toArray)
    val far = Bm25Sparse.dot(ai.toArray, av.toArray, ci.toArray, cv.toArray)
    assert(near > far && far == 0.0)
  }

  test("empty text -> empty vector") {
    val (idx, vals) = sparseOf("")
    assert(idx.isEmpty && vals.isEmpty)
  }
}
