package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** SCALE.md credits AQE's skew-join split for the stop-word tail of the
  * token-keyed census joins (`lm_score`, `bigram_surprisal`). This spec
  * turns the claim into CI — and pins its BOUNDARY, found while writing
  * it:
  *
  *  - POSITIVE: when both join inputs are plain shuffle stages — the
  *    warehouse shape, where the census is a MATERIALIZED table — a Zipf
  *    hot key ("the" carrying half of all token occurrences) produces a
  *    skew-marked join and a positive skewed-split count in the final
  *    adaptive plan.
  *  - BOUNDARY: in the FUSED single-query shape (census aggregated in
  *    the same plan), the aggregate sits between the shuffle and the
  *    join, so `OptimizeSkewedJoin` cannot re-read that side as shuffle
  *    blocks to pair with a split partition — the join is NOT skew-
  *    marked. Hot-key protection there is the broadcast census (the
  *    vocab-bounded side broadcasts at gate SFs) or
  *    [[SkewUtils.saltedJoin]] (equivalence-proved in SkewUtilsSpec).
  *
  * Thresholds are lowered so a unit-sized fixture is skew-eligible (the
  * production defaults trigger at 256 MB partitions); the plan mechanism
  * exercised is identical. */
class SkewSplitSpec extends SparkSpec {

  private val tuned = Map(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

  private def withTuned[A](body: => A): A = {
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Zipf-ish token relation: "the" carries half of 200k occurrences. */
  private def zipfToks: DataFrame = {
    import spark.implicits._
    spark.range(0, 200000).select(
      when($"id" % 2 === 0, lit("the"))
        .otherwise(concat(lit("w"), ($"id" % 5000).cast("string"))).as("tok"),
      $"id".as("pos"))
  }

  /** Every node of the finalized adaptive plan, descending into query
    * stages (QueryStageExec is a LEAF to TreeNode.collect — the join
    * lives inside the result stage). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[
      org.apache.spark.sql.execution.SparkPlan]
    def go(n: org.apache.spark.sql.execution.SparkPlan): Unit = {
      buf += n
      n match {
        case a: AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          go(q.plan)
        case _ =>
      }
      n.children.foreach(go)
    }
    go(p)
    buf.toSeq
  }

  private def skewEvidence(joined: DataFrame): (Int, Long) = {
    val nodes = allNodes(joined.queryExecution.executedPlan)
    val skewJoins = nodes.collect {
      case s: SortMergeJoinExec if s.isSkewJoin => s
      case s: ShuffledHashJoinExec if s.isSkewJoin => s
    }
    val splits = nodes.collect { case r: AQEShuffleReadExec => r }
      .flatMap(_.metrics.get("numSkewedSplits")).map(_.value).sum
    (skewJoins.size, splits)
  }

  test("materialized census join: AQE splits the hot-token partition") {
    withTuned {
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("skew").toString
      zipfToks.write.parquet(s"$tmp/toks")
      zipfToks.groupBy($"tok").agg(count(lit(1)).as("c1"))
        .write.parquet(s"$tmp/uni")
      // both sides are plain scans now → both join inputs are plain
      // shuffle stages → the skew rule can split the hot partition and
      // duplicate the matching census partition against each split
      val joined = spark.read.parquet(s"$tmp/toks")
        .join(spark.read.parquet(s"$tmp/uni"), Seq("tok"))
      // materialize THIS dataframe's own execution (count() would build
      // and adaptively plan a separate query), so the inspected plan is
      // the finalized one
      assert(joined.collect().length == 200000)
      val (skewJoins, splits) = skewEvidence(joined)
      assert(skewJoins > 0, "no skew-marked join in the final adaptive plan")
      assert(splits > 0, "AQE reported zero skewed splits")
    }
  }

  test("fused in-query census: the aggregate blocks the split (the documented boundary)") {
    withTuned {
      import spark.implicits._
      val toks = zipfToks
      val joined = toks.join(
        toks.groupBy($"tok").agg(count(lit(1)).as("c1")), Seq("tok"))
      assert(joined.collect().length == 200000)
      val (skewJoins, _) = skewEvidence(joined)
      assert(skewJoins == 0,
        "fused-census join unexpectedly skew-split — update SCALE.md: the " +
          "boundary documented there no longer holds on this Spark version")
    }
  }
}
