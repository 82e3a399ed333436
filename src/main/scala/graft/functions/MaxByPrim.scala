package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** `max_by(payload, ordering)` for FIXED-WIDTH payloads as a
  * [[DeclarativeAggregate]] — the fully-codegen, `HashAggregateExec`
  * top-1-per-group.
  *
  * The ladder this sits on top of: the built-in
  * `max_by(struct, struct)` plans `SortAggregateExec` (struct agg
  * buffers are not hash-eligible — two full-input sorts around the
  * exchange); [[MaxByOrd]] restores `ObjectHashAggregateExec` but pays
  * an INTERPRETED path per input row (ordering-struct eval, boxed
  * compare, copied buffer values — the row loop leaves whole-stage
  * codegen). When every payload and ordering field is a fixed-width
  * primitive, nothing forces either cost: this aggregate flattens the
  * two structs into one flat buffer of mutable primitive slots
  * (`seen`, the two ordering fields, the payload fields), every
  * update/merge is a pure Catalyst `If`/comparison expression, and the
  * whole group-by compiles into `HashAggregateExec`'s generated update
  * loop — UnsafeRow-mutable buffer, map-side combine, zero per-row
  * allocation beyond the input structs themselves.
  *
  * Ordering is the two-field lexicographic struct ordering the built-in
  * resolves to — `GreaterThan`/`EqualTo` on field 0 then field 1, which
  * under Spark's comparison semantics (NaN greatest and self-equal,
  * -0.0 == 0.0) matches `TypeUtils.getInterpretedOrdering` on the same
  * struct, so values are identical to [[MaxByOrd]] and to the built-in
  * whenever the ordering key is unique per group (every call site
  * tie-breaks on a unique id; MaxByPrimSpec pins three-way parity).
  *
  * CONTRACT (the one semantic narrowing vs [[MaxByOrd]]): rows whose
  * ordering fields contain a NULL are skipped, where the struct
  * orderings would rank them nulls-first. Call sites order by non-null
  * source columns (a score and an id), where the two behaviors are
  * indistinguishable; a nullable ordering needs [[MaxByOrd]].
  *
  * Output type and field names are the payload struct's, so
  * `.getField(...)` call sites are interchangeable across the ladder.
  * Payloads with variable-width fields (strings, arrays) stay on
  * [[MaxByOrd]] — a var-width buffer slot would evict the whole
  * aggregate from `HashAggregateExec` anyway, which is this class's
  * entire point.
  */
case class MaxByPrim(payload: Expression, ordering: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = payload
  override def right: Expression = ordering

  override def dataType: DataType = payload.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "max_by_prim"

  override def checkInputDataTypes(): TypeCheckResult =
    (payload.dataType, ordering.dataType) match {
      case (p: StructType, o: StructType) if o.length == 2 =>
        val wide = (p.fields ++ o.fields)
          .filterNot(f => UnsafeRow.isMutable(f.dataType))
        val unord = o.fields.filterNot(f => RowOrdering.isOrderable(f.dataType))
        if (wide.nonEmpty) TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs fixed-width primitive fields but got " +
            s"${wide.map(f => s"${f.name}: ${f.dataType.catalogString}")
              .mkString(", ")} — use max_by_ord for variable-width payloads")
        else if (unord.nonEmpty) TypeCheckResult.TypeCheckFailure(
          s"$prettyName ordering fields must be orderable; got " +
            unord.map(_.dataType.catalogString).mkString(", "))
        else TypeCheckResult.TypeCheckSuccess
      case (p, o) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes (struct payload, two-field struct ordering); " +
          s"got (${p.catalogString}, ${o.catalogString})")
    }

  private def payStruct = payload.dataType.asInstanceOf[StructType]
  private def ordStruct = ordering.dataType.asInstanceOf[StructType]

  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()
  private lazy val bo = ordStruct.fields.zipWithIndex.map { case (f, i) =>
    AttributeReference(s"ord$i", f.dataType)()
  }.toSeq
  private lazy val bp = payStruct.fields.zipWithIndex.map { case (f, i) =>
    AttributeReference(s"pay$i", f.dataType)()
  }.toSeq

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    seen +: (bo ++ bp)

  override lazy val initialValues: Seq[Expression] =
    Literal(false) +: (bo ++ bp).map(a => Literal.create(null, a.dataType))

  private def ordIn(i: Int) = GetStructField(ordering, i)
  private def payIn(i: Int) = GetStructField(payload, i)

  // candidate beats the buffer: lexicographic (field0, field1), computed
  // against non-null buffer slots (seen == true implies both are set, so
  // the Or short-circuits every null case away — `better` is never null)
  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(ordIn(0)), IsNotNull(ordIn(1)))
    val gt = Or(GreaterThan(ordIn(0), bo(0)),
      And(EqualTo(ordIn(0), bo(0)), GreaterThan(ordIn(1), bo(1))))
    val better = And(valid, Or(Not(seen), gt))
    Or(seen, better) +:
      (Seq(If(better, ordIn(0), bo(0)), If(better, ordIn(1), bo(1))) ++
        bp.indices.map(i => If(better, payIn(i), bp(i))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val gt = Or(GreaterThan(bo(0).right, bo(0).left),
      And(EqualTo(bo(0).right, bo(0).left), GreaterThan(bo(1).right, bo(1).left)))
    val better = And(seen.right, Or(Not(seen.left), gt))
    Or(seen.left, seen.right) +:
      (Seq(If(better, bo(0).right, bo(0).left), If(better, bo(1).right, bo(1).left)) ++
        bp.map(a => If(better, a.right, a.left)))
  }

  override lazy val evaluateExpression: Expression =
    If(seen,
      CreateNamedStruct(payStruct.fields.zipWithIndex.flatMap { case (f, i) =>
        Seq(Literal(f.name), bp(i))
      }.toSeq),
      Literal.create(null, dataType))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxByPrim =
    copy(payload = newLeft, ordering = newRight)
}
