package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** V7 — INT8 scalar quantization of float vectors, the storage-side
  * compression the reference applies to Tier-2 dense vectors
  * (`/root/reference/app/services/qdrant_service.py:84-90`: scalar INT8,
  * quantile 0.99, on-disk). 4× smaller vectors; scoring on the quantized
  * form is integer arithmetic.
  *
  * Declared deviation: scale = per-vector max-|x| (quantile 1.0) rather
  * than a corpus-level 0.99 quantile — keeps quantization a pure per-row
  * expression (no corpus pass) with zero clipping; documented in SURVEY
  * §8. Built from Spark built-in column functions only, so the DuckDB
  * oracle mirrors the math term for term.
  *
  * Encoding: `q_i = round(x_i * 127 / scale)` as TINYINT, plus the DOUBLE
  * `scale` carried alongside. Dot products on (q, scale) pairs
  * reconstruct: `dot ≈ Σ qa_i*qb_i * (sa*sb)/(127*127)`.
  */
object QuantizeInt8 {

  /** Per-vector scale: max absolute component (0 for the zero vector). */
  def scaleOf(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** Quantize to array<tinyint> given the scale column. */
  def quantize(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0))
        .otherwise(round(x.cast("double") * 127.0 / scale))
        .cast("tinyint"))

  /** Integer dot product of two quantized vectors (exact int math). */
  def qdot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Cosine on quantized vectors: scales cancel, so this is the integer
    * dot normalized by integer norms — no float reconstruction needed. */
  def qcosine(qa: Column, qb: Column): Column = {
    val na = sqrt(qdot(qa, qa).cast("double"))
    val nb = sqrt(qdot(qb, qb).cast("double"))
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(qdot(qa, qb).cast("double") / (na * nb))
  }
}

/** Corpus-bound INT8 cosine in ONE native pass: quantizes the stored
  * vector AND the constant query vector with the (runtime, broadcast)
  * corpus bound — `clamp(round_half_away_from_zero(x*127/bound), ±127)` —
  * then scores integer cosine. Replaces a transform()+aggregate() HOF
  * pipeline that evaluated ~13M interpreted lambdas (with per-element
  * BigDecimal rounds) per bench run; values are IDENTICAL (half-up ==
  * half-away-from-zero for BigDecimal/DuckDB alike, mirrored in the
  * oracle SQL). */
case class Int8QuantCosine(left: Expression, right: Expression, q: Seq[Double])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int8_quant_cosine requires (array<float>, double), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_quant_cosine"
  // null on dimension mismatch — same contract as CosineSimExpr /
  // CosineConstExpr, so a mismatched stored vector surfaces as NULL in
  // every cosine path instead of silently scoring in the int8 one
  override def nullable: Boolean = true

  @transient private lazy val qArr: Array[Double] = q.toArray

  override protected def nullSafeEval(vec: Any, bound: Any): Any = {
    val vv = vec.asInstanceOf[ArrayData]
    if (vv.numElements() != qArr.length) null
    else Int8QuantCosine.compute(vv, bound.asInstanceOf[Double], qArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("int8Query", qArr, "double[]")
    nullSafeCodeGen(ctx, ev, (v, b) =>
      s"""
         |if ($v.numElements() != $qRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Int8QuantCosine.compute($v, $b, $qRef);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8QuantCosine =
    copy(left = newLeft, right = newRight)
}

object Int8QuantCosine {
  /** round half away from zero then clamp to [-127, 127]. */
  private def q127(x: Double, bound: Double): Long = {
    val scaled = x * 127.0 / bound
    val r = if (scaled >= 0) math.floor(scaled + 0.5) else math.ceil(scaled - 0.5)
    math.max(-127.0, math.min(127.0, r)).toLong
  }

  def compute(vec: ArrayData, bound: Double, q: Array[Double]): Double = {
    // callers guarantee vec.numElements() == q.length (mismatch → NULL at
    // the expression layer, same contract as the float cosine kernels)
    val n = q.length
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val a = q127(vec.getFloat(i).toDouble, bound)
      val b = q127(q(i), bound)
      dot += a * b; na += a * a; nb += b * b
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }
}
