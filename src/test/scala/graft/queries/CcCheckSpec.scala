package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** CcCheck must accept the engine's own clustering and reject corrupted
  * labelings — it is the sf1 sweep's stand-in oracle for dedup_clusters,
  * so its discriminating power needs its own proof. */
class CcCheckSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("accepts connectedComponents output (all violation counts zero)") {
    val docs = Tables.documents(spark, SfDir)
    val assign = CurationOps.connectedComponents(docs)
    val v = CcCheck.violations(docs, assign)
    assert(v.values.sum == 0, v.toString)
  }

  test("rejects corrupted labelings, one property per corruption") {
    import spark.implicits._
    val docs = Tables.documents(spark, SfDir)
    val good = CurationOps.connectedComponents(docs).cache()

    // pick a doc from a non-singleton cluster (label != id ⇒ an edge
    // binds it to its root); relabeling it must split an edge
    val merged = good.filter($"cluster_id" =!= $"doc_id").head()
    val victim = merged.getLong(0)

    val split = good.withColumn("cluster_id",
      when($"doc_id" === victim, $"doc_id").otherwise($"cluster_id"))
    assert(CcCheck.violations(docs, split)("edge_split") > 0)

    val above = good.withColumn("cluster_id",
      when($"doc_id" === victim, $"doc_id" + 1).otherwise($"cluster_id"))
    assert(CcCheck.violations(docs, above)("label_bound") > 0)

    // point the victim's ROOT at a label whose root doesn't keep itself
    val root = merged.getLong(1)
    val noRoot = good.withColumn("cluster_id",
      when($"doc_id" === root, victim).otherwise($"cluster_id"))
    assert(CcCheck.violations(docs, noRoot)("root") > 0)

    val dropped = good.filter($"doc_id" =!= victim)
    assert(CcCheck.violations(docs, dropped)("coverage") > 0)

    good.unpersist()
  }

  test("exactMismatch catches whole-component over-merge the properties miss") {
    import spark.implicits._
    val docs = Tables.documents(spark, SfDir)
    val good = CurationOps.connectedComponents(docs).cache()
    assert(CcCheck.exactMismatch(docs, good) == 0L)

    // merge one whole non-singleton component into another component's
    // root: internal edges still agree, the foreign root self-roots, and
    // the label is below every member id — all five distributed
    // properties pass; only the independent union-find sees it
    val roots = good.filter($"cluster_id" =!= $"doc_id")
      .select($"cluster_id").distinct().orderBy($"cluster_id")
      .as[Long].collect()
    assume(roots.length >= 2, "fixture needs two non-singleton components")
    val (keep, victim) = (roots(0), roots(1))
    val merged = good.withColumn("cluster_id",
      when($"cluster_id" === victim, keep).otherwise($"cluster_id"))
    assert(CcCheck.violations(docs, merged).values.sum == 0L,
      "the distributed properties are expected to MISS this corruption")
    assert(CcCheck.exactMismatch(docs, merged) > 0L)

    good.unpersist()
  }
}
