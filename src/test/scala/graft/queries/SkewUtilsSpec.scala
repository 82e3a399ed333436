package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewUtilsSpec extends SparkSpec {

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows, 90% on one hot key — the shape AQE cannot split further
    // when a single key exceeds a partition
    val big = spark.range(10000)
      .select($"id",
        when($"id" % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), $"id" % 7))
          .as("key"))
    val small = Seq(("hot", 1.0), ("k0", 2.0), ("k3", 3.0)).toDF("key", "w")

    val plain = big.join(small, "key").select($"id", $"w")
    val salted = SkewUtils.saltedJoin(big, small, "key", $"id", buckets = 8)
      .select($"id", $"w")

    val a = plain.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    val b = salted.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(a.length == b.length && a.sameElements(b))
  }

  test("salt actually spreads the hot key across buckets") {
    import spark.implicits._
    val big = spark.range(1000).select($"id", lit("hot").as("key"))
    val spread = big
      .withColumn("salt", pmod(hash($"id"), lit(8)))
      .groupBy("salt").count().collect().map(_.getLong(1))
    assert(spread.length == 8, "all 8 buckets hit")
    assert(spread.max < 1000 * 0.3, s"no bucket dominates: ${spread.toSeq}")
  }
}
