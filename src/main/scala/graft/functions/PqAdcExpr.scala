package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization encode + asymmetric-distance lookup in ONE native
  * pass: for each of `m` subspaces, find the nearest sub-centroid of the
  * row's slice (sequential-fold L2², tie → the LOWEST cid — centroids are
  * iterated in ascending-cid order with strictly-less updates) and sum
  * that code's PRE-COMPUTED query distance from `qd`; the result is the
  * ADC distance rounded at 4 dp (HALF_UP — the same BigDecimal path as
  * Spark's `round`).
  *
  * This fuses what the relational form of `pq_topk` spreads over an
  * m-way explode, a broadcast centroid join, an argmin aggregate, and an
  * ADC lookup join — 4 jobs collapse into scan → project →
  * TakeOrderedAndProject. The codebook and query table ride along as
  * reference objects: they are INDEX METADATA (m·k sub-vectors + m·k
  * rounded doubles, collected once per plan — the same bounded
  * control-plane read as `IvfIndex.probe`'s nprobe centroid ids), never
  * corpus data. Arithmetic is fold-order-identical to the relational
  * form and the DuckDB oracle, so gate hashes are unchanged.
  *
  * `cids` must be sorted ascending; `cb(i)` is the FULL vector of
  * centroid `cids(i)` (widened to double exactly as `cast("double")`
  * does); `qd(j)(i)` is the 6-dp-rounded L2² of the query's subspace j
  * against centroid i's subspace j. NULL on dimension mismatch. */
case class PqAdcExpr(
    child: Expression,
    cids: Seq[Long],
    cb: Seq[Seq[Double]],
    qd: Seq[Seq[Double]],
    m: Int,
    sub: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires array<float|double>, got ${t.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  @transient private lazy val cbArr: Array[Array[Double]] = cb.map(_.toArray).toArray
  @transient private lazy val qdArr: Array[Array[Double]] = qd.map(_.toArray).toArray
  private lazy val vFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val vv = v.asInstanceOf[ArrayData]
    if (vv.numElements() != m * sub) null
    else PqAdcExpr.compute(vv, vFloat, cbArr, qdArr, m, sub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cbArr, "double[][]")
    val qdRef = ctx.addReferenceObj("pqQd", qdArr, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |if ($v.numElements() != ${m * sub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.PqAdcExpr.compute($v, $vFloat, $cbRef, $qdRef, $m, $sub);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcExpr =
    copy(child = newChild)
}

object PqAdcExpr {
  def compute(v: ArrayData, vFloat: Boolean, cb: Array[Array[Double]],
      qd: Array[Array[Double]], m: Int, sub: Int): Double = {
    var adist = 0.0
    var j = 0
    while (j < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cv = cb(c)
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val x = if (vFloat) v.getFloat(j * sub + i).toDouble
                  else v.getDouble(j * sub + i)
          val d = x - cv(j * sub + i)
          acc += d * d
          i += 1
        }
        // strictly-less + ascending-cid iteration == min_by(struct(dist, cid))
        if (acc < bestDist) { bestDist = acc; best = c }
        c += 1
      }
      adist += qd(j)(best)
      j += 1
    }
    BigDecimal(adist).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}
