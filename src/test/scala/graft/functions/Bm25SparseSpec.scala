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
