package graft.queries

import graft.{ObservedMetrics, SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The vector-dedup recall caps ([[VectorOps.SemClusterCap]],
  * [[VectorOps.NeardupBucketCap]]) silently skip pair formation for
  * over-full groups — at 100 TB an operator must be able to READ what a
  * cap cost on their corpus instead of guessing. These specs pin the
  * `observe` telemetry: exact over-cap group and row counts on planted
  * over-cap fixtures, zeros on the under-cap gate corpus, and the
  * CollectMetrics node surfaced in the gate queries' plans. */
class CapMetricsSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  /** deterministic 64-d vector, first 8 dims' signs pinned by `bucket` */
  private def vec(bucket: Int, seed: Int): Seq[Float] = {
    val r = new scala.util.Random(seed)
    (0 until 64).map { i =>
      val mag = (r.nextDouble() * 0.9 + 0.1).toFloat
      if (i < 8) { if (((bucket >> i) & 1) == 1) mag else -mag }
      else if (r.nextBoolean()) mag else -mag
    }
  }

  test("neardup_cosine reports the bucket cap's exclusions exactly") {
    import spark.implicits._
    val cap = VectorOps.NeardupBucketCap
    // bucket 3: cap+37 rows (over); buckets 5 and 9: 4 rows each (under)
    val rows =
      (0 until cap + 37).map(i => (i.toLong, vec(3, i))) ++
        (0 until 4).map(i => (10000L + i, vec(5, 7000 + i))) ++
        (0 until 4).map(i => (20000L + i, vec(9, 8000 + i)))
    val dir = java.nio.file.Files.createTempDirectory("neardupcap").toString
    rows.toDF("vec_id", "embedding")
      .repartition(3).write.parquet(s"$dir/embeddings.parquet")

    val q = SparkEntry.queries("neardup_cosine")
    assert(q(spark, dir).queryExecution.optimizedPlan.toString
        .contains("CollectMetrics neardup_cap"),
      "neardup_cosine must surface its cap telemetry in the plan")
    val m = ObservedMetrics.capture(spark, Set("neardup_cap")) {
      q(spark, dir).collect() }
    val row = m.getOrElse("neardup_cap", fail(s"no neardup_cap in $m"))
    assert(row.getAs[Int]("over_cap_groups") == 1, row.toString)
    assert(row.getAs[Long]("over_cap_rows") == cap + 37, row.toString)
    // and the over-cap bucket really formed no pair: every reported pair
    // is within bucket 5 or bucket 9
    val pairs = q(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (a, b) => (a >= 10000L) && (b >= 10000L) },
      s"over-cap bucket 3 must be excluded from pairs: ${pairs.take(5).toSeq}")
  }

  test("semdedup reports the cluster cap's exclusions exactly") {
    import spark.implicits._
    val cap = VectorOps.SemClusterCap
    // seed-centroid rows must exist (SemCentroids = 1, 14, 27, ...); give
    // each a distinct far-apart direction, then plant cap+23 extra rows
    // aligned with centroid 1 so ONE cluster lands over cap
    val cents = VectorOps.SemCentroids.zipWithIndex.map { case (cid, k) =>
      (cid, vec(k * 17 % 256, 900 + k))
    }
    val c1 = cents.head._2
    val over = (0 until cap + 23).map { i =>
      // tiny deterministic jitter keeps the argmax on centroid 1
      val r = new scala.util.Random(i)
      (100000L + i, c1.map(x => x + (r.nextFloat() - 0.5f) * 0.01f))
    }
    val dir = java.nio.file.Files.createTempDirectory("semcap").toString
    (cents ++ over).toDF("vec_id", "embedding")
      .repartition(4).write.parquet(s"$dir/embeddings.parquet")

    val q = SparkEntry.queries("semdedup")
    assert(q(spark, dir).queryExecution.optimizedPlan.toString
        .contains("CollectMetrics semdedup_cap"),
      "semdedup must surface its cap telemetry in the plan")
    val m = ObservedMetrics.capture(spark, Set("semdedup_cap")) {
      q(spark, dir).collect() }
    val row = m.getOrElse("semdedup_cap", fail(s"no semdedup_cap in $m"))
    assert(row.getAs[Int]("over_cap_groups") == 1, row.toString)
    // the over-cap cluster holds its planted rows plus centroid 1 itself
    assert(row.getAs[Long]("over_cap_rows") == cap + 23 + 1, row.toString)
    // every member of the over-cap cluster is kept (pair formation skipped)
    val out = q(spark, dir).collect()
    val overIds = out.filter(_.getLong(0) >= 100000L)
    assert(overIds.nonEmpty && overIds.forall(_.getBoolean(2)),
      "over-cap cluster members must all be kept")
  }

  test("under-cap corpora report zeros (sf0.001 gate data)") {
    for ((q, name) <- Seq("neardup_cosine" -> "neardup_cap",
        "semdedup" -> "semdedup_cap")) {
      val m = ObservedMetrics.capture(spark, Set(name)) {
        SparkEntry.queries(q)(spark, SfDir).collect()
      }
      val row = m.getOrElse(name, fail(s"no $name in $m"))
      assert(row.getAs[Long]("over_cap_rows") == 0L, s"$q: $row")
      assert(row.getAs[Int]("over_cap_groups") == 0, s"$q: $row")
    }
  }
}
