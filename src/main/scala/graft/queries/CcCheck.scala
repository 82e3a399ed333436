package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Independent validator for a `dedup_clusters` assignment: checks the
  * OUTPUT against the properties that define a min-label connected-
  * components labeling, without re-running the fixpoint loop. Exists for
  * scales where the DuckDB recursive-CTE oracle is unaffordable (it
  * exceeded the 300 s sweep ceiling at sf1 while the Spark side finished)
  * — the oracle gate stays authoritative at sf0.01/sf0.1; this proves the
  * same contract where the oracle cannot follow.
  *
  * Checked properties (each returned as a violation count):
  *  - `coverage`: the assignment is a bijection on `docs.doc_id`
  *    (every document labeled exactly once, no extras);
  *  - `label_bound`: `cluster_id <= doc_id` (labels are component MINIMA,
  *    so no doc may carry a label above its own id);
  *  - `root`: every cluster_id labels ITSELF with itself (the component
  *    minimum is a real document and is its own root);
  *  - `edge_split`: no re-derived LSH candidate edge crosses two labels —
  *    equivalently one more neighbor-min propagation round would change
  *    nothing, i.e. the labeling is a true fixpoint (rules out
  *    under-merging and premature convergence).
  *
  * Over-merging (two components sharing a label) is impossible by
  * construction — every propagation step only moves labels along edges —
  * and is additionally bounded here by `root`+`label_bound`: a label must
  * be a real doc that keeps itself, so distinct components could only
  * share a label if an edge path linked them.
  */
object CcCheck {

  /** Violation counts per property (all zero == valid labeling). */
  def violations(docs: DataFrame, assign: DataFrame): Map[String, Long] = {
    import docs.sparkSession.implicits._
    val a = assign.select($"doc_id", $"cluster_id").cache()
    try {
      val docIds = docs.select($"doc_id")
      val coverage =
        a.groupBy($"doc_id").count().filter($"count" =!= 1).count() +
          a.select($"doc_id").join(docIds, Seq("doc_id"), "left_anti").count() +
          docIds.join(a, Seq("doc_id"), "left_anti").count()
      val labelBound = a.filter($"cluster_id" > $"doc_id").count()
      val roots = a.filter($"doc_id" === $"cluster_id").select($"cluster_id")
      val root = a.select($"cluster_id").distinct()
        .join(roots, Seq("cluster_id"), "left_anti")
        .count()
      val buckets = TextOps.minhashBuckets(docs)
      val pairs = TextOps.pairsFromBuckets(buckets)
      val edgeSplit = pairs
        .join(a.select($"doc_id".as("a_id"), $"cluster_id".as("la")), "a_id")
        .join(a.select($"doc_id".as("b_id"), $"cluster_id".as("lb")), "b_id")
        .filter($"la" =!= $"lb")
        .count()
      buckets.unpersist()
      Map("coverage" -> coverage, "label_bound" -> labelBound,
        "root" -> root, "edge_split" -> edgeSplit)
    } finally a.unpersist()
  }
}
