package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MaxByOrd must return exactly what the built-in
  * `max_by(payload, ordering)` returns whenever the ordering key is
  * unique per group (every engine call site tie-breaks on a unique id),
  * while planning through ObjectHashAggregateExec instead of a
  * full-input SortAggregate. */
class MaxByOrdSpec extends SparkSpec {

  import graft.GraftFunctions.maxByOrd

  private def eventsDf = {
    import spark.implicits._
    val rng = new scala.util.Random(20260815L)
    // many groups, duplicate value ties broken by unique id — the
    // grouped_search shape; 16 partitions exercise partial/merge/
    // serialize across the exchange
    (0 until 50000).map { i =>
      (s"g${rng.nextInt(300)}", i.toLong, rng.nextInt(50).toDouble,
        s"payload_$i")
    }.toDF("grp", "id", "value", "props").repartition(16)
  }

  test("parity with built-in max_by on struct payload + struct ordering") {
    import spark.implicits._
    val mine = eventsDf.groupBy($"grp")
      .agg(maxByOrd(struct($"id", $"props"),
        struct($"value", -$"id")).as("top"))
      .select($"grp", $"top.id", $"top.props")
    val builtin = eventsDf.groupBy($"grp")
      .agg(max_by(struct($"id", $"props"),
        struct($"value", -$"id")).as("top"))
      .select($"grp", $"top.id", $"top.props")
    assert(mine.exceptAll(builtin).isEmpty && builtin.exceptAll(mine).isEmpty)
  }

  test("parity on single-field payload (the IVF assignment shape)") {
    import spark.implicits._
    val mine = eventsDf.groupBy($"grp")
      .agg(maxByOrd(struct($"id"), struct($"value", -$"id"))
        .getField("id").as("best"))
    val builtin = eventsDf.groupBy($"grp")
      .agg(max_by(struct($"id"), struct($"value", -$"id"))
        .getField("id").as("best"))
    assert(mine.exceptAll(builtin).isEmpty && builtin.exceptAll(mine).isEmpty)
  }

  test("null ordering fields and all-null groups match the built-in") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long, java.lang.Double)](
      ("a", 1L, 2.0), ("a", 2L, null), ("a", 3L, 1.0),
      ("b", 4L, null), // group whose only ordering values are null
      ("c", 5L, 0.0)
    ).toDF("grp", "id", "value").repartition(4)
    // null inside a struct ordering field: pin parity with the built-in
    val mine = df.groupBy($"grp")
      .agg(maxByOrd(struct($"id"), struct($"value", $"id"))
        .getField("id").as("best")).orderBy($"grp")
    val builtin = df.groupBy($"grp")
      .agg(max_by(struct($"id"), struct($"value", $"id"))
        .getField("id").as("best")).orderBy($"grp")
    assert(mine.collect().toSeq == builtin.collect().toSeq)
  }

  test("plans through ObjectHashAggregate — no full-input sort") {
    import spark.implicits._
    val plan = eventsDf.groupBy($"grp")
      .agg(maxByOrd(struct($"id", $"props"),
        struct($"value", -$"id")).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate:\n${plan.take(1200)}")
    assert(!plan.contains("SortAggregate"),
      s"the sort-based fallback defeats the point:\n${plan.take(1200)}")
  }
}
