package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** A5 hardening — whole-operator top-k-per-group as a custom Catalyst
  * operator (SURVEY §4 "group-by pushdown into the index" stretch goal):
  * logical node + planner strategy + physical exec, registered through
  * `GraftExtensions` / `spark.experimental.extraStrategies`.
  *
  * Why not window/row_number or max_by? The window form sorts every
  * partition; the max_by form only handles k=1 and builds struct agg
  * buffers. This operator keeps a bounded k-row buffer per group per
  * partition — O(n·log k) with no sort and no struct churn — which is the
  * shape Qdrant's `search_groups(group_size=k)` wants at warehouse scale.
  *
  * Semantics: for each distinct value of `groupExprs`, emit the first k
  * rows of the group under `ordering` (ties broken by the ordering
  * itself — give it a total order for deterministic output). Output rows
  * are unordered across groups (append a final orderBy for presentation).
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(group, order, k, child) =>
      TopKPerGroupExec(group, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** All rows of one group must land in one partition (the shuffle the
    * planner inserts here is the operator's only exchange). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = ordering
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord = RowOrdering.create(orderE, childOutput)
      // group key -> k best rows, kept sorted ascending by `ord` (element
      // 0 = best); insertion keeps the buffer bounded at k
      val buffers = new java.util.HashMap[UnsafeRow, java.util.ArrayList[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var buf = buffers.get(key)
        if (buf == null) {
          buf = new java.util.ArrayList[InternalRow](limit)
          buffers.put(key.copy(), buf)
        }
        if (buf.size() < limit || ord.compare(row, buf.get(buf.size() - 1)) < 0) {
          val copy = row.copy()
          var i = buf.size()
          if (buf.size() == limit) { buf.remove(limit - 1); i = limit - 1 }
          while (i > 0 && ord.compare(copy, buf.get(i - 1)) < 0) i -= 1
          buf.add(i, copy)
        }
      }
      import scala.jdk.CollectionConverters._
      buffers.values().asScala.iterator.flatMap(_.asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {

  /** DataFrame API: top `k` rows per group of `groupCols`, best-first
    * under `orderCols` (`(name, ascending)`). Attributes are resolved
    * against the child's analyzed output up front, so the custom node
    * enters planning fully resolved. */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    // make the strategy available even without the extensions config
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$name' in ${child.output.map(_.name).mkString(", ")}"))
    val sortOrders = orderCols.map { case (n, asc) =>
      SortOrder(attr(n),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr), sortOrders, k, child))
  }
}
