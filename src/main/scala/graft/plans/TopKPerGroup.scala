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
  /** Set to `true` to plan the sort-based exec (O(k) memory per partition,
    * sort spill handled by Spark's external sorter) instead of the default
    * hash exec (no sort, memory ∝ groups-per-partition). */
  val SortBasedKey = "spark.graft.topKPerGroup.sortBased"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(group, order, k, child) =>
      val sortBased = org.apache.spark.sql.SparkSession.getActiveSession
        .exists(_.conf.get(SortBasedKey, "false").toBoolean)
      TopKPerGroupExec(group, order, k, planLater(child), sortBased) :: Nil
    case _ => Nil
  }
}

/** MEMORY CONTRACT: the default (hash) mode holds at most
  * k · |distinct groups in the partition| row copies plus one UnsafeRow
  * key per group — NOT proportional to input rows. That is the right
  * trade for the engine's group domains (rhythm hashes, day buckets:
  * ≤ millions of groups ⇒ tens of MB at k≤10). For ultra-high-cardinality
  * group keys set [[TopKPerGroupStrategy.SortBasedKey]]: the planner then
  * requires a child sort on the group key (Spark's external sorter spills
  * it to disk) and this exec streams one group at a time with O(k) memory.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    sortBased: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** All rows of one group must land in one partition (the shuffle the
    * planner inserts here is the operator's only exchange). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  /** Sort-based mode additionally asks for group-key order, making the
    * per-group scan streaming (spillable sort instead of a hash map). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (sortBased)
      Seq(groupExprs.map(SortOrder(_,
        org.apache.spark.sql.catalyst.expressions.Ascending)))
    else Seq(Nil)

  override protected def doExecute(): RDD[InternalRow] = {
    import TopKPerGroupExec.insert
    val groupE = groupExprs
    val orderE = ordering
    val limit = k
    val childOutput = child.output
    val sorted = sortBased
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord = RowOrdering.create(orderE, childOutput)
      import scala.jdk.CollectionConverters._
      if (sorted) {
        // child is sorted by group key: stream group runs, O(k) memory
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = _
          private val buf = new java.util.ArrayList[InternalRow](limit)
          private var out: Iterator[InternalRow] = Iterator.empty
          private def advance(): Unit = {
            while (!out.hasNext && iter.hasNext) {
              val row = iter.next()
              val key = keyProj(row)
              if (curKey == null) curKey = key.copy()
              else if (key != curKey) {
                out = new java.util.ArrayList(buf).asScala.iterator
                buf.clear()
                curKey = key.copy()
              }
              insert(buf, row, ord, limit)
            }
            if (!out.hasNext && !iter.hasNext && !buf.isEmpty) {
              out = new java.util.ArrayList(buf).asScala.iterator
              buf.clear()
            }
          }
          override def hasNext: Boolean = { advance(); out.hasNext }
          override def next(): InternalRow = { advance(); out.next() }
        }
      } else {
        // group key -> k best rows; bounded at k rows per DISTINCT group
        // in this partition (see the class-level memory contract)
        val buffers = new java.util.HashMap[UnsafeRow, java.util.ArrayList[InternalRow]]()
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          var buf = buffers.get(key)
          if (buf == null) {
            buf = new java.util.ArrayList[InternalRow](limit)
            buffers.put(key.copy(), buf)
          }
          insert(buf, row, ord, limit)
        }
        buffers.values().asScala.iterator.flatMap(_.asScala)
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Insert `row` into the bounded best-k buffer (ascending by `ord`).
    * Static so task closures don't capture the exec node. */
  private def insert(buf: java.util.ArrayList[InternalRow], row: InternalRow,
      ord: Ordering[InternalRow], limit: Int): Unit = {
    if (buf.size() < limit || ord.compare(row, buf.get(buf.size() - 1)) < 0) {
      val copy = row.copy()
      var i = buf.size()
      if (buf.size() == limit) { buf.remove(limit - 1); i = limit - 1 }
      while (i > 0 && ord.compare(copy, buf.get(i - 1)) < 0) i -= 1
      buf.add(i, copy)
    }
  }
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
