package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MaxByPrim must return exactly what the built-in
  * `max_by(payload, ordering)` and [[MaxByOrd]] return on all-primitive
  * payloads with non-null ordering fields (every eligible call site's
  * shape), while planning through codegen HashAggregateExec — no object
  * hash map, no full-input sort. The deliberate narrowings are pinned
  * too: null-in-ordering rows are SKIPPED, and variable-width payloads
  * are an analysis error pointing at max_by_ord. */
class MaxByPrimSpec extends SparkSpec {

  import graft.GraftFunctions.{maxByOrd, maxByPrim}

  private def eventsDf = {
    import spark.implicits._
    val rng = new scala.util.Random(20260816L)
    // many groups, duplicate value ties broken by unique id — the
    // grouped_search shape; 16 partitions exercise partial/merge across
    // the exchange
    (0 until 50000).map { i =>
      (s"g${rng.nextInt(300)}", i.toLong, rng.nextInt(50).toDouble)
    }.toDF("grp", "id", "value").repartition(16)
  }

  test("three-way parity: built-in max_by, MaxByOrd, MaxByPrim") {
    import spark.implicits._
    def top(aggCol: org.apache.spark.sql.Column) = eventsDf
      .groupBy($"grp").agg(aggCol.as("top"))
      .select($"grp", $"top.id", $"top.value")
    val prim = top(maxByPrim(struct($"id", $"value"), struct($"value", -$"id")))
    val ord = top(maxByOrd(struct($"id", $"value"), struct($"value", -$"id")))
    val builtin = top(max_by(struct($"id", $"value"), struct($"value", -$"id")))
    assert(prim.exceptAll(builtin).isEmpty && builtin.exceptAll(prim).isEmpty)
    assert(prim.exceptAll(ord).isEmpty && ord.exceptAll(prim).isEmpty)
  }

  test("parity on single-field payload (the IVF assignment shape)") {
    import spark.implicits._
    val mine = eventsDf.groupBy($"grp")
      .agg(maxByPrim(struct($"id"), struct($"value", -$"id"))
        .getField("id").as("best"))
    val builtin = eventsDf.groupBy($"grp")
      .agg(max_by(struct($"id"), struct($"value", -$"id"))
        .getField("id").as("best"))
    assert(mine.exceptAll(builtin).isEmpty && builtin.exceptAll(mine).isEmpty)
  }

  test("NaN ranks greatest and ties break like the interpreted ordering") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, Double.NaN), ("a", 3L, 2.0),
      ("b", 4L, 5.0), ("b", 5L, 5.0), // pure tie → max(-id) = min id
      ("c", 6L, -0.0), ("c", 7L, 0.0) // -0.0 == 0.0 → tie-break on id
    ).toDF("grp", "id", "value").repartition(4)
    def top(aggCol: org.apache.spark.sql.Column) = df
      .groupBy($"grp").agg(aggCol.getField("id").as("best")).orderBy($"grp")
    val prim = top(maxByPrim(struct($"id"), struct($"value", -$"id"))).collect()
    val builtin = top(max_by(struct($"id"), struct($"value", -$"id"))).collect()
    assert(prim.toSeq == builtin.toSeq)
    assert(prim.map(_.getLong(1)).toSeq == Seq(2L, 4L, 6L))
  }

  test("contract: rows with a null ordering field are skipped") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long, java.lang.Double)](
      ("a", 1L, 2.0), ("a", 2L, null), ("a", 3L, 9.0),
      ("b", 4L, null) // only null orderings → group evaluates to null
    ).toDF("grp", "id", "value").repartition(4)
    val rows = df.groupBy($"grp")
      .agg(maxByPrim(struct($"id"), struct($"value", $"id")).as("top"))
      .orderBy($"grp")
      .select($"grp", $"top.id".as("best")).collect()
    assert(rows.map(r => (r.getString(0), Option(r.get(1)))).toSeq ==
      Seq(("a", Some(3L)), ("b", None)))
  }

  test("variable-width payload is an analysis error naming max_by_ord") {
    import spark.implicits._
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      eventsDf.withColumn("props", concat(lit("p"), $"id"))
        .groupBy($"grp")
        .agg(maxByPrim(struct($"id", $"props"), struct($"value", -$"id")))
        .collect()
    }
    assert(err.getMessage.contains("max_by_ord"), err.getMessage)
  }

  test("plans through codegen HashAggregate — no object map, no sort") {
    import spark.implicits._
    val plan = eventsDf.groupBy($"grp")
      .agg(maxByPrim(struct($"id", $"value"),
        struct($"value", -$"id")).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("ObjectHashAggregate"),
      s"expected codegen HashAggregate:\n${plan.take(1200)}")
    assert(!plan.contains("SortAggregate"),
      s"the sort-based fallback defeats the point:\n${plan.take(1200)}")
  }
}
