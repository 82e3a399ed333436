package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** V4 write-side — the sparse BM25 document vector stored alongside the
  * dense vector in Tier-2, mirroring the reference's named sparse vector
  * (`Qdrant/bm25` with server-side IDF; `/root/reference/app/services/
  * qdrant_service.py:23, 80, 124-129`, doc `QDRANT-FEATURES.md:17-19`).
  *
  * Per document: word-tokenize (lowercase, non-alphanumeric split), hash
  * each distinct term to a bucket in [0, dim), weight it with the BM25 TF
  * part `tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl))` using declared
  * constants (k1=1.2, b=0.75, avgdl=256 — the write side cannot know the
  * corpus average in a streaming append, same trade-off the reference's
  * embedder makes). IDF is applied at query time from corpus stats (see
  * `queries/TextOps.bm25Score` for the full scoring form).
  *
  * Output: struct(idx: array<int> ascending, val: array<float>).
  */
case class Bm25Sparse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bm25_sparse requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("idx", ArrayType(IntegerType, containsNull = false)),
    StructField("val", ArrayType(FloatType, containsNull = false))))

  override def prettyName: String = "bm25_sparse"

  override protected def nullSafeEval(input: Any): Any =
    Bm25Sparse.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bm25Sparse.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Bm25Sparse =
    copy(child = newChild)
}

object Bm25Sparse {
  val Dim = 30000
  val K1 = 1.2
  val B = 0.75
  val AvgDl = 256.0
  private val Seed = 0x5bd1e995

  def compute(input: UTF8String): InternalRow = {
    val toks = input.toString.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val dl = toks.length.toDouble
    val tf = new java.util.TreeMap[Int, Int]()
    toks.foreach { t =>
      val h = scala.util.hashing.MurmurHash3.stringHash(t, Seed)
      val bucket = ((h % Dim) + Dim) % Dim
      tf.merge(bucket, 1, (a, b) => a + b)
    }
    val n = tf.size()
    val idx = new Array[Int](n)
    val vals = new Array[Float](n)
    val it = tf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      idx(i) = e.getKey
      val f = e.getValue.toDouble
      vals(i) = (f * (K1 + 1.0) / (f + K1 * (1.0 - B + B * dl / AvgDl))).toFloat
      i += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(idx), new GenericArrayData(vals)))
  }

  /** Sparse dot product for query-time scoring (both sides ascending). */
  def dot(aIdx: Array[Int], aVal: Array[Float], bIdx: Array[Int], bVal: Array[Float]): Double = {
    var i = 0; var j = 0; var s = 0.0
    while (i < aIdx.length && j < bIdx.length) {
      if (aIdx(i) == bIdx(j)) { s += aVal(i).toDouble * bVal(j); i += 1; j += 1 }
      else if (aIdx(i) < bIdx(j)) i += 1
      else j += 1
    }
    s
  }

  /** ArrayData form of [[dot]] — called from generated code with the
    * stored struct's arrays, no per-row copies. */
  def dotRow(row: InternalRow, qIdx: Array[Int], qVal: Array[Float]): Double = {
    val aIdx = row.getArray(0)
    val aVal = row.getArray(1)
    var i = 0; var j = 0; var s = 0.0
    val n = aIdx.numElements()
    while (i < n && j < qIdx.length) {
      val ai = aIdx.getInt(i)
      if (ai == qIdx(j)) { s += aVal.getFloat(i).toDouble * qVal(j); i += 1; j += 1 }
      else if (ai < qIdx(j)) i += 1
      else j += 1
    }
    s
  }
}

/** Dot product of a stored sparse vector (struct(idx,val), indices
  * ascending) against a CONSTANT query sparse vector — the native,
  * codegen'd form of the query-time sparse scoring path (the Scala-UDF
  * version deserialized both arrays per row; this reads the unsafe struct
  * in place, per the repo's no-UDFs-in-the-hot-path doctrine). */
case class SparseDotConst(child: Expression, qIdx: Array[Int], qVal: Array[Float])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(fields) if fields.length == 2 &&
      fields(0).dataType.isInstanceOf[ArrayType] &&
      fields(0).dataType.asInstanceOf[ArrayType].elementType == IntegerType &&
      fields(1).dataType.isInstanceOf[ArrayType] &&
      fields(1).dataType.asInstanceOf[ArrayType].elementType == FloatType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sparse_dot_const requires struct<idx:array<int>,val:array<float>>, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_dot_const"

  override protected def nullSafeEval(input: Any): Any =
    Bm25Sparse.dotRow(input.asInstanceOf[InternalRow], qIdx, qVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qi = ctx.addReferenceObj("sparseQIdx", qIdx, "int[]")
    val qv = ctx.addReferenceObj("sparseQVal", qVal, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Bm25Sparse.dotRow($c, $qi, $qv)")
  }

  override protected def withNewChildInternal(newChild: Expression): SparseDotConst =
    copy(child = newChild)
}
