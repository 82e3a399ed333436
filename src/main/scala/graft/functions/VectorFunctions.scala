package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector / similarity operators (SURVEY §2.5) as pure `Column` expressions.
  *
  * All of these compose Spark built-ins (`zip_with`, `aggregate`,
  * `bit_count`, ...) so they run inside WholeStageCodegen with no UDF
  * serialization cost, and scale linearly with partitioning: a cosine top-k
  * over 100 TB of embeddings is scan → per-row score → TakeOrderedAndProject
  * (no shuffle except the final k-row merge on the driver).
  *
  * Reference semantics:
  *  - dense cosine KNN: `/root/reference/app/services/forensic_analysis_service.py:30-53`
  *  - 64-d binary DOT / Hamming: `/root/reference/app/services/qdrant_service.py:49-58`
  *  - recommend (avg-vector strategy): `forensic_analysis_service.py:75-96`
  */
object VectorFunctions {

  /** Dot product of two float/double array columns (element-wise, summed in
    * index order — deterministic, matches a sequential-loop oracle). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; 0.0 when either vector has zero norm (declared
    * semantics for the reference's zero-vector search — SURVEY §7.5.3).
    * Native one-pass kernel ([[CosineSimExpr]]) — the `zip_with` +
    * `aggregate` HOF form computes the identical sequential fold but
    * evaluates its lambdas interpreted per element. */
  def cosine(a: Column, b: Column): Column =
    graft.GraftFunctions.columnOf(CosineSimExpr(
      graft.GraftFunctions.exprOf(a), graft.GraftFunctions.exprOf(b)))

  /** Cosine against a constant query vector, with norms constant-folded
    * (native kernel, [[CosineConstExpr]]). */
  def cosineToConst(v: Column, q: Seq[Double]): Column = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    if (qn == 0.0) lit(0.0)
    else graft.GraftFunctions.columnOf(CosineConstExpr(
      graft.GraftFunctions.exprOf(v), q))
  }

  /** Pack the sign pattern of the first 63 dims of a float vector into a
    * non-negative LongType bitset (bit i set iff v[i] > 0). This is the
    * engine's "binary quantization": exact, 8 bytes/vector, always-RAM —
    * the Spark analogue of Tier-1's 64-bit fingerprints. 63 bits keeps the
    * value in signed-positive range for cross-engine (DuckDB) parity. */
  def packSignBits63(v: Column): Column = packSignBits(v, 63)

  /** Sign-bit packing of the first `bits` dims (LSH bucket key when small).
    * Native kernel, [[PackSignBitsExpr]] — identical values to the
    * zip_with+pow HOF form it replaced. */
  def packSignBits(v: Column, bits: Int): Column =
    graft.GraftFunctions.columnOf(PackSignBitsExpr(
      graft.GraftFunctions.exprOf(v), bits))

  /** Hamming distance between two packed bitsets. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Binary DOT similarity (count of shared set bits). */
  def bitDot(a: Column, b: Column): Column = bit_count(a.bitwiseAND(b))

  /** Element-wise average of an array column as an aggregate expression
    * producing array<double>; dim must be statically known (64 here, 384 for
    * Tier-2). Expands to dim scalar `avg`s — partial-aggregated map-side, so
    * the shuffle carries one dim-length row per partition, not the data. */
  def avgVector(v: Column, dim: Int): Column =
    array((1 to dim).map(i => avg(element_at(v, i).cast("double"))): _*)

  /** Dense matrix·vector against a CONSTANT matrix (native kernel,
    * [[MatVecExpr]]): y_j = Σ_i rows(j)(i)·v(i), each row summed in
    * ascending index order so a `list_sum(list_transform(range...))`
    * oracle folds the identical sequence. NULL on dimension mismatch. */
  def matVec(v: Column, rows: Seq[Seq[Double]]): Column =
    graft.GraftFunctions.columnOf(MatVecExpr(
      graft.GraftFunctions.exprOf(v), rows))

  /** Per-cluster SemDeDup verdicts in one kernel call
    * ([[SemPairDropExpr]]): members array in, (vec_id, kept) array out. */
  def semPairDrop(members: Column, tau: Double): Column =
    graft.GraftFunctions.columnOf(SemPairDropExpr(
      graft.GraftFunctions.exprOf(members), tau))
}

/** Shared element accessor: float or double arrays score identically
  * (every element is widened to double exactly, as `cast("double")` did
  * in the HOF form). */
private[functions] object VecElems {
  def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType
}

/** Native pairwise cosine over two float/double array columns — identical
  * sequential-fold arithmetic to the zip_with+aggregate form, one
  * codegen'd call per row. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecElems.isVec(left.dataType) && VecElems.isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<float|double>, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // null on dimension mismatch (mirrors the zip_with+aggregate HOF form
  // this kernel replaced: zip_with null-pads and the fold propagates null)
  override def nullable: Boolean = true

  private lazy val aFloat = VecElems.isFloat(left.dataType)
  private lazy val bFloat = VecElems.isFloat(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]; val bv = b.asInstanceOf[ArrayData]
    if (av.numElements() != bv.numElements()) null
    else CosineSimExpr.compute(av, aFloat, bv, bFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CosineSimExpr.compute($a, $aFloat, $b, $bFloat);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val sna = math.sqrt(na); val snb = math.sqrt(nb)
    if (sna == 0.0 || snb == 0.0) 0.0 else d / (sna * snb)
  }
}

/** Native cosine against a CONSTANT query vector (query norm folded at
  * plan time — same arithmetic as the HOF cosineToConst form). */
case class CosineConstExpr(child: Expression, q: Seq[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecElems.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_const requires array<float|double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_const"
  // null on dimension mismatch, matching the HOF form's null-pad semantics
  override def nullable: Boolean = true

  @transient private lazy val qArr: Array[Double] = q.toArray
  @transient private lazy val qNorm: Double = math.sqrt(q.map(x => x * x).sum)
  private lazy val vFloat = VecElems.isFloat(child.dataType)

  override protected def nullSafeEval(v: Any): Any = {
    val vv = v.asInstanceOf[ArrayData]
    if (vv.numElements() != qArr.length) null
    else CosineConstExpr.compute(vv, vFloat, qArr, qNorm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("cosineQ", qArr, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() != $qRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.CosineConstExpr.compute($v, $vFloat, $qRef, $qNorm);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CosineConstExpr =
    copy(child = newChild)
}

object CosineConstExpr {
  def compute(v: ArrayData, vFloat: Boolean, q: Array[Double], qNorm: Double): Double = {
    val n = math.min(v.numElements(), q.length)
    var d = 0.0; var nv = 0.0
    var i = 0
    while (i < n) {
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      d += x * q(i); nv += x * x
      i += 1
    }
    val snv = math.sqrt(nv)
    if (snv == 0.0) 0.0 else d / (snv * qNorm)
  }
}

/** Native sign-bit packing (bit i set iff v[i] > 0, first `bits` dims) —
  * identical values to the zip_with(slice, sequence) + pow HOF form. */
case class PackSignBitsExpr(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecElems.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pack_sign_bits requires array<float|double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "pack_sign_bits"

  private lazy val vFloat = VecElems.isFloat(child.dataType)

  override protected def nullSafeEval(v: Any): Any =
    PackSignBitsExpr.compute(v.asInstanceOf[ArrayData], vFloat, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.PackSignBitsExpr.compute($v, $vFloat, $bits)")

  override protected def withNewChildInternal(newChild: Expression): PackSignBitsExpr =
    copy(child = newChild)
}

object PackSignBitsExpr {
  def compute(v: ArrayData, vFloat: Boolean, bits: Int): Long = {
    val n = math.min(v.numElements(), bits)
    var out = 0L
    var i = 0
    while (i < n) {
      val pos = if (vFloat) v.getFloat(i) > 0f else v.getDouble(i) > 0.0
      if (pos) out |= (1L << i)
      i += 1
    }
    out
  }
}

/** Native matrix·vector against a constant row-major matrix — the
  * Johnson–Lindenstrauss projection kernel. Each output element is a
  * sequential ascending-index fold over the input (so the DuckDB
  * `list_sum(list_transform(range(...)))` mirror folds the identical
  * sequence); NULL when the input dimension differs from the matrix
  * width, matching the library's mismatch contract. */
case class MatVecExpr(child: Expression, rows: Seq[Seq[Double]])
    extends UnaryExpression {

  require(rows.nonEmpty && rows.forall(_.length == rows.head.length),
    "matVec requires a non-empty rectangular matrix")

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecElems.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mat_vec requires array<float|double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"
  override def nullable: Boolean = true

  @transient private lazy val mat: Array[Array[Double]] =
    rows.map(_.toArray).toArray
  private lazy val vFloat = VecElems.isFloat(child.dataType)

  override protected def nullSafeEval(v: Any): Any = {
    val vv = v.asInstanceOf[ArrayData]
    if (vv.numElements() != mat(0).length) null
    else MatVecExpr.compute(vv, vFloat, mat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matVecM", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() != $mRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.MatVecExpr.compute($v, $vFloat, $mRef);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecExpr =
    copy(child = newChild)
}

object MatVecExpr {
  def compute(v: ArrayData, vFloat: Boolean,
      mat: Array[Array[Double]]): ArrayData = {
    val m = mat.length
    val n = mat(0).length
    val out = new Array[Double](m)
    var j = 0
    while (j < m) {
      val row = mat(j)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += row(i) * x
        i += 1
      }
      out(j) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}
