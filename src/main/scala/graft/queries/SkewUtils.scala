package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers for the 100 TB path.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.*`, on by default in
  * the engine's sessions) handles most skew at runtime by splitting
  * oversized shuffle partitions. Salting is the plan-level fallback for the
  * pathological case AQE cannot fix: a single join KEY too hot for any
  * partition split (e.g. one rhythm hash producing half the anomaly rows,
  * or an LSH band bucket hit by a template storm).
  *
  * `saltedJoin(big, small, key, n)` replicates the SMALL side n× with a
  * salt column and scatters the BIG side's hot keys uniformly across the n
  * replicas with a random-free deterministic salt (`pmod(hash(...), n)` on
  * a high-cardinality companion column), so one hot key spreads over n
  * shuffle partitions. Result equals the plain inner join row-for-row.
  */
object SkewUtils {

  /** Inner-join `big ⋈ small` on `key`, spreading each big-side key over
    * `buckets` shuffle partitions.
    *
    * @param spreadBy high-cardinality big-side column driving the salt
    *                 (row identity, timestamp, …) — deterministic, so
    *                 retried tasks salt identically
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      spreadBy: Column,
      buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(spreadBy), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
