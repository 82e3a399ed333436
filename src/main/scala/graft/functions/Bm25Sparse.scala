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

  def compute(input: UTF8String): InternalRow = compute(input, AvgDl)

  def compute(input: UTF8String, avgDl: Double): InternalRow = {
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
      vals(i) = (f * (K1 + 1.0) / (f + K1 * (1.0 - B + B * dl / avgDl))).toFloat
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

/** [[Bm25Sparse]] with a CORPUS average document length (reference
  * fidelity: Qdrant computes BM25 stats server-side over the real corpus,
  * `qdrant_service.py:23,80` — the fixed `AvgDl = 256` base form is the
  * streaming-append trade-off, this is the stats-pass variant). `avgDl`
  * is a scalar column (broadcast corpus aggregate), not a literal, so the
  * two-pass query stays one declarative plan with no driver collect. */
case class Bm25SparseDl(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bm25_sparse_dl requires (string, double), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = StructType(Seq(
    StructField("idx", ArrayType(IntegerType, containsNull = false)),
    StructField("val", ArrayType(FloatType, containsNull = false))))

  override def prettyName: String = "bm25_sparse_dl"

  override protected def nullSafeEval(text: Any, avgDl: Any): Any =
    Bm25Sparse.compute(text.asInstanceOf[UTF8String],
      avgDl.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, a) =>
      s"graft.functions.Bm25Sparse.compute($t, $a)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Bm25SparseDl =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two sparse-vector struct columns (indices ascending) —
  * the stored-vs-query scoring path when BOTH sides are computed in the
  * plan (e.g. corpus-avgdl BM25, where the query vector depends on the
  * stats pass and cannot be a driver-side constant). */
case class SparseDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def isSparse(t: DataType): Boolean = t match {
    case StructType(fields) => fields.length == 2 &&
      fields(0).dataType.isInstanceOf[ArrayType] &&
      fields(0).dataType.asInstanceOf[ArrayType].elementType == IntegerType &&
      fields(1).dataType.isInstanceOf[ArrayType] &&
      fields(1).dataType.asInstanceOf[ArrayType].elementType == FloatType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isSparse(left.dataType) && isSparse(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sparse_dot requires two struct<idx:array<int>,val:array<float>>, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SparseDot.dotRows(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SparseDot.dotRows($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SparseDot =
    copy(left = newLeft, right = newRight)
}

object SparseDot {
  def dotRows(a: InternalRow, b: InternalRow): Double = {
    val aIdx = a.getArray(0); val aVal = a.getArray(1)
    val bIdx = b.getArray(0); val bVal = b.getArray(1)
    var i = 0; var j = 0; var s = 0.0
    val n = aIdx.numElements(); val m = bIdx.numElements()
    while (i < n && j < m) {
      val ai = aIdx.getInt(i); val bj = bIdx.getInt(j)
      if (ai == bj) { s += aVal.getFloat(i).toDouble * bVal.getFloat(j); i += 1; j += 1 }
      else if (ai < bj) i += 1
      else j += 1
    }
    s
  }
}
