package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MinKLongs vs the collect_list+array_sort+slice composition it
  * replaces, on grouped random data (dup values, sub-k groups, nulls) —
  * plus a direct buffer exercise of insert/merge saturation. */
class MinKLongsSpec extends SparkSpec {

  private def minK(c: org.apache.spark.sql.Column, k: Int) =
    graft.GraftFunctions.columnOf(
      MinKLongs(graft.GraftFunctions.exprOf(c), k).toAggregateExpression())

  test("equals slice(array_sort(collect_list), 1, k) across groups") {
    import spark.implicits._
    val rng = new scala.util.Random(41L)
    val rows = (0 until 20000).map { _ =>
      val g = rng.nextInt(40)
      // duplicates likely; some groups smaller than k
      val v = if (g >= 35) rng.nextInt(3).toLong else rng.nextInt(500).toLong
      (g, v)
    }
    // force many partitions so merge() paths run
    val df = rows.toDF("g", "v").repartition(13)
    val kernel = df.groupBy($"g").agg(minK($"v", 5).as("s"))
    val builtin = df.groupBy($"g")
      .agg(slice(array_sort(collect_list($"v")), 1, 5).as("s"))
    assert(kernel.exceptAll(builtin).count() == 0)
    assert(builtin.exceptAll(kernel).count() == 0)
  }

  test("nulls are skipped; empty group yields empty array") {
    import spark.implicits._
    val df = Seq[(Int, Option[Long])]((1, Some(7L)), (1, None), (2, None))
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(minK($"v", 3).as("s"))
      .orderBy($"g").collect().map(_.getSeq[Long](1))
    assert(got(0) == Seq(7L) && got(1) == Seq.empty)
  }

  test("buffer insert/merge keep the k smallest, sorted, duplicates kept") {
    val agg = MinKLongs(org.apache.spark.sql.catalyst.expressions.Literal(0L), 3)
    val a = agg.createAggregationBuffer()
    Seq(9L, 2L, 7L, 2L, 11L).foreach { v =>
      // exercise insert via merge of singletons to avoid InternalRow setup
      val single = agg.createAggregationBuffer()
      single.add(v)
      agg.merge(a, single)
    }
    assert(agg.eval(a).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == Seq(2L, 2L, 7L))
    val b = agg.deserialize(agg.serialize(a))
    assert(agg.eval(b).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq == Seq(2L, 2L, 7L))
  }
}
