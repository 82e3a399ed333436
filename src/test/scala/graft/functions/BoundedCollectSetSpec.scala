package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[BoundedCollectSet]] semantics: result size is EXACTLY
  * `min(distinct_count, max)` regardless of partitioning (saturation must
  * survive partial-aggregate merges), and below the cap the collected set
  * equals `collect_set`. These two properties are what `jaccard_pairs`
  * relies on: size in [2, cap] ⇔ df in [2, cap] with the full doc-id
  * set; size == cap+1 ⇔ df > cap (hot). */
class BoundedCollectSetSpec extends SparkSpec {

  private def bounded(max: Int) = graft.GraftFunctions.columnOf(
    BoundedCollectSet(
      graft.GraftFunctions.exprOf(col("v")), max).toAggregateExpression())

  test("size saturates at max across many partitions; exact below max") {
    import spark.implicits._
    // key k has k distinct values, spread over 16 partitions so every
    // group's state is assembled from partial-aggregate merges
    val rows = for (k <- 1 to 12; v <- 1 to k) yield (k, v.toLong)
    val df = rows.toDF("k", "v").repartition(16)
    val got = df.groupBy($"k").agg(bounded(5).as("ds"))
      .select($"k", size($"ds").as("n"), $"ds")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toSet))
      .sortBy(_._1)
    got.foreach { case (k, n, ds) =>
      assert(n == math.min(k, 5), s"key $k: size $n != min($k, 5)")
      // below the cap the set is the full distinct set, not a sample
      if (k <= 5) assert(ds == (1 to k).map(_.toLong).toSet)
      // at saturation the kept ids are a subset of the true set
      else assert(ds.subsetOf((1 to k).map(_.toLong).toSet) && ds.size == 5)
    }
  }

  test("duplicates collapse: distinct count, not row count, saturates") {
    import spark.implicits._
    // 1000 rows but only 3 distinct values — must NOT saturate at max=4
    val df = (1 to 1000).map(i => (1, (i % 3).toLong)).toDF("k", "v")
      .repartition(8)
    val got = df.groupBy($"k").agg(bounded(4).as("ds"))
      .select(size($"ds")).collect().head.getInt(0)
    assert(got == 3)
  }
}
