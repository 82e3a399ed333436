package graft.search

import graft.{SparkSpec, Tables}
import graft.queries.VectorOps
import org.apache.spark.sql.functions._

/** The k-means trainer must converge to a balanced fixpoint,
  * deterministically, and the index built on its centroids must probe
  * correctly while still pruning partitions. (What the training BUYS —
  * recall — is measured in RecallSpec.) */
class KMeansSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, SfDir)

  test("training converges to a balanced fixpoint, deterministically") {
    val t = KMeans.train(emb, k = 16)
    assert(t.iters < KMeans.MaxIters,
      s"hit the iteration cap (${t.iters}) without converging")
    assert(t.finalShift <= 1e-6, s"final drift ${t.finalShift} > tol")
    assert(t.centroids.forall(c =>
      math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9),
      "centroids must be unit-norm")

    // balance: Lloyd's on this corpus must not collapse clusters — the
    // seed-row quantizer's whole recall problem is unbalanced cells
    import spark.implicits._
    val sizes = emb.select($"vec_id",
        graft.functions.VectorFunctions.matVec($"embedding",
          t.centroids.map(_.toSeq)).as("cs"))
      .withColumn("cid", array_position($"cs", array_max($"cs")) - 1)
      .groupBy($"cid").count()
      .select($"count").as[Long].collect()
    assert(sizes.length == 16, s"empty clusters: only ${sizes.length} of 16 used")
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.max <= 2 * mean,
      s"unbalanced: max cell ${sizes.max} > 2x mean $mean " +
        s"(sizes ${sizes.sorted.reverse.mkString(",")})")

    val t2 = KMeans.train(emb, k = 16)
    assert(t2.centroids == t.centroids, "retraining must be deterministic")
  }

  test("buildTrained: probe == trained-centroid restriction, still pruned") {
    val path = java.nio.file.Files.createTempDirectory("ivftr").toString + "/idx"
    val t = IvfIndex.buildTrained(emb, path)

    val probed = IvfIndex.probe(spark, path)
    probed.collect()
    val got = probed.collect().map(_.getLong(0)).toSeq

    // independent recompute: the same restriction via RecallEval over a
    // one-query sample (qid 0 = the pinned gate query vector)
    val qs = RecallEval.queriesDf(spark, Seq(0L -> VectorOps.Q))
    val want = RecallEval.ivfTopK(emb, qs, VectorOps.IvfK,
        centroids = Some(t.toDf(spark)))
      .collect().map(_.getLong(1)).toSeq
    assert(got.toSet == want.toSet,
      s"probe ids $got != trained inline restriction $want")

    // the trained index must prune exactly like the seed index: literal
    // cid predicate → partition filter → nprobe files listed
    val probeIds = spark.read.parquet(s"$path/centroids")
      .select(col("cid"), graft.functions.VectorFunctions
        .cosineToConst(col("cvec"), VectorOps.Q).as("qs"))
      .orderBy(col("qs").desc, col("cid")).limit(VectorOps.IvfNprobe)
      .collect().map(_.getLong(0))
    val plain = spark.read.parquet(s"$path/index")
      .filter(col("cid").isin(probeIds: _*))
      .select(col("vec_id"))
    plain.collect()
    val scan = plain.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no scan in pruning plan"))
    assert(scan.metrics("numFiles").value == VectorOps.IvfNprobe,
      s"expected ${VectorOps.IvfNprobe} files, got ${scan.metrics("numFiles").value}")
  }
}
