package graft

import org.apache.spark.sql.{Row, SparkSession}

/** Test-side reader for `Dataset.observe` cap telemetry: runs `action`
  * with a QueryExecutionListener attached and returns every named
  * observed-metrics row the execution reported. Listener delivery is
  * async, so the read polls briefly after the action completes.
  *
  * `awaitNames`: poll until ALL the named metrics have arrived (not just
  * the first row) — an action spanning multiple jobs can deliver a later
  * metric well after the first callback, and a fixed settle beat alone
  * misses it on a loaded machine. */
object ObservedMetrics {

  def capture(s: SparkSession, awaitNames: Set[String] = Set.empty)(
      action: => Unit): Map[String, Row] = {
    @volatile var seen: Map[String, Row] = Map.empty
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        if (qe.observedMetrics.nonEmpty) seen = seen ++ qe.observedMetrics
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      action
      val deadline = System.nanoTime() + 10_000_000_000L
      def satisfied =
        if (awaitNames.nonEmpty) awaitNames.subsetOf(seen.keySet)
        else seen.nonEmpty
      while (!satisfied && System.nanoTime() < deadline) Thread.sleep(50)
      // one settle beat so late-arriving sibling metrics join the map
      Thread.sleep(250)
      seen
    } finally s.listenerManager.unregister(listener)
  }
}
