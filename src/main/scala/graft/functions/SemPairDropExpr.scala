package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native per-cluster SemDeDup verdict kernel: given one cluster's
  * members as `array<struct<vec_id, embedding>>`, emit
  * `array<struct<vec_id, kept>>` where a member is dropped iff an
  * EARLIER member (lower vec_id) of the same cluster has
  * `round(cosine, 6) >= tau` against it — the exact drop rule of the
  * relational pair-join + distinct + left-join plan this fuses away
  * (same [[CosineSimExpr]] fold arithmetic, same HALF_UP
  * `Double.toString` rounding as Spark's `round`, SemdedupSpec's
  * independent recompute unchanged).
  *
  * Scale shape: one kernel call per cluster, after a single
  * `groupBy(cid).collect_list` exchange moves each vector ONCE — the
  * relational form moved them once per join side and then paid a pair
  * distinct and a corpus-wide verdict join on top. Per-task state is
  * bounded by the cluster cap the caller enforces BEFORE collecting
  * (over-cap clusters never reach this kernel); the pair loop
  * early-exits per member on the first dropping mate, so duplicate-heavy
  * clusters cost far less than the all-pairs worst case. */
case class SemPairDropExpr(child: Expression, tau: Double)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
        s(0).dataType == LongType && VecElems.isVec(s(1).dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sem_pair_drop requires array<struct<bigint, array<float|double>>>, " +
        s"got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("kept", BooleanType, nullable = false))), containsNull = false)
  override def prettyName: String = "sem_pair_drop"
  override def nullable: Boolean = child.nullable

  private lazy val vFloat = child.dataType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType](1)
    .dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    SemPairDropExpr.compute(v.asInstanceOf[ArrayData], vFloat, tau)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SemPairDropExpr.compute($v, $vFloat, $tau);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SemPairDropExpr {
  def compute(members: ArrayData, vFloat: Boolean, tau: Double): ArrayData = {
    val n = members.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val row = members.getStruct(i, 2)
      ids(i) = row.getLong(0)
      vecs(i) = row.getArray(1)
      i += 1
    }
    // deterministic order: collect_list order is arbitrary, the drop
    // rule ("an earlier member") is by ascending vec_id
    val order = Array.range(0, n).sortBy(ids(_))
    // norms once (same ascending fold as CosineSimExpr, so
    // dot/(na*nb) below is bit-identical to its single-pass form)
    val norms = new Array[Double](n)
    i = 0
    while (i < n) {
      val v = vecs(i); val m = v.numElements()
      var s = 0.0; var j = 0
      while (j < m) {
        val x = if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)
        s += x * x; j += 1
      }
      norms(i) = math.sqrt(s)
      i += 1
    }
    val out = new Array[Any](n)
    var bi = 0
    while (bi < n) {
      val b = order(bi)
      var dropped = false
      var ai = 0
      while (ai < bi && !dropped) { // early exit on the first mate
        val a = order(ai)
        val va = vecs(a); val vb = vecs(b)
        val m = math.min(va.numElements(), vb.numElements())
        var d = 0.0; var j = 0
        while (j < m) {
          val x = if (vFloat) va.getFloat(j).toDouble else va.getDouble(j)
          val y = if (vFloat) vb.getFloat(j).toDouble else vb.getDouble(j)
          d += x * y; j += 1
        }
        val cos = if (norms(a) == 0.0 || norms(b) == 0.0) 0.0
                  else d / (norms(a) * norms(b))
        // exact replica of Spark's round(cos, 6): shortest-decimal
        // HALF_UP (BigDecimal.valueOf goes through Double.toString)
        val r6 = java.math.BigDecimal.valueOf(cos)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        if (r6 >= tau) dropped = true
        ai += 1
      }
      out(bi) = InternalRow(ids(b), !dropped)
      bi += 1
    }
    new GenericArrayData(out)
  }
}
