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
  *    under-merging and premature convergence);
  *  - `stray`: a doc labeled by a FOREIGN id must touch at least one
  *    candidate edge — an edgeless doc can only ever self-label, so a
  *    relabeled singleton (one over-merge shape) is caught here.
  *
  * The remaining over-merge shape — an entire edge-CONNECTED group
  * relabeled to another component's root — passes all five distributed
  * properties (its internal edges agree, the foreign root self-roots).
  * [[exactMismatch]] closes that hole where validation runs: it
  * recomputes ground-truth components with an INDEPENDENT algorithm
  * (driver-side union-find over the collected edge list — candidate
  * edges are band-bounded, millions at sf1, so the collect is
  * validation-affordable) and compares the PARTITIONS, so any assignment
  * that merges or splits components disagrees regardless of which label
  * values it picked.
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
      val endpoints = pairs.select($"a_id".as("doc_id"))
        .union(pairs.select($"b_id".as("doc_id"))).distinct()
      val stray = a.filter($"doc_id" =!= $"cluster_id")
        .join(endpoints, Seq("doc_id"), "left_anti")
        .count()
      buckets.unpersist()
      Map("coverage" -> coverage, "label_bound" -> labelBound,
        "root" -> root, "edge_split" -> edgeSplit, "stray" -> stray)
    } finally a.unpersist()
  }

  /** Number of docs whose assignment partition disagrees with
    * ground-truth components from an independent driver-side union-find
    * over the collected candidate-edge list. Catches the over-merge
    * shapes the distributed properties cannot (see object doc). Use at
    * validation scale only — the edge list is collected to the driver
    * (band-bounded; ~2M pairs at sf1). */
  def exactMismatch(docs: DataFrame, assign: DataFrame): Long = {
    import docs.sparkSession.implicits._
    val buckets = TextOps.minhashBuckets(docs)
    // STREAM the edge list — union-find state is node-sized, but the
    // edge list is pair-count sized and pair counts grow quadratically
    // with duplication (215M pairs at the sf10 sweep, where a collect()
    // was multi-GB of driver tuples); toLocalIterator holds one
    // partition at a time and the union-find consumes it incrementally
    import scala.jdk.CollectionConverters._
    val edgeIter = TextOps.pairsFromBuckets(buckets)
      .as[(Long, Long)].toLocalIterator().asScala
    val find = unionFind(edgeIter)
    buckets.unpersist()
    // ground truth label = component min (find() roots at the min because
    // unions always point the larger root at the smaller)
    val got = assign.select($"doc_id", $"cluster_id")
      .as[(Long, Long)].collect()
    got.count { case (id, lbl) => find(id) != lbl }
  }

  /** Consume an undirected edge stream into a min-rooted union-find and
    * return its `find`: ids that never appeared root at themselves, any
    * other id at its component MINIMUM (unions always point the larger
    * root at the smaller). State is node-sized; edges stream through.
    * Shared by [[exactMismatch]] and the driver-sized tier of
    * [[CurationOps.connectedComponents]] — validator and engine agreeing
    * by construction is fine there because the gate oracle (DuckDB
    * recursive CTE) stays fully independent. */
  private[queries] def unionFind(edges: Iterator[(Long, Long)]): Long => Long = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val n = parent.getOrElse(c, c); parent(c) = r; c = n
      }
      r
    }
    while (edges.hasNext) {
      val (u, v) = edges.next()
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    find
  }

  /** All ids the union-find has seen, labeled (id → component min). */
  private[queries] def labeledNodes(edges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val find = unionFind(edges.iterator)
    edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet.toSeq.sorted
      .map(id => (id, find(id)))
  }
}
