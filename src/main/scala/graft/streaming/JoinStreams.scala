package graft.streaming

import graft.queries.SessionOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The two streaming join families the batch operators mirror:
  *
  *  - '''stream–static''' enrichment: every micro-batch hash-joins
  *    against a (small) static dimension — rules, severity maps, schema
  *    registries. The dim broadcasts per batch, so the stream side never
  *    shuffles; re-reading the dim each batch is what makes slowly-
  *    changing dimensions pick up updates without restarting the query.
  *
  *  - '''stream–stream''' interval join: the in-flight analogue of the
  *    batch `range_join` — each error event pairs with the same user's
  *    other events within ±band. Both sides carry watermarks and the
  *    join condition bounds event-time distance, which together give
  *    Spark a state eviction proof: a buffered row can be dropped once
  *    the other side's watermark passes its timestamp + band. State is
  *    therefore O(rate × band), independent of stream age — the
  *    invariant that keeps the join viable on an unbounded stream.
  */
object JoinStreams {

  /** Enrich a stream with a static dimension (left join on `keys`); the
    * dim is broadcast to every micro-batch. */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys, "left")

  /** Stream–stream interval self-join over an event stream with columns
    * (`event_id` LONG, `user_id` LONG, `ts` TIMESTAMP, `event_type`
    * STRING): pairs each error with the same user's non-error events
    * within ±`bandSec`.
    *
    * `joinType = "inner"` (default) emits only errors with context;
    * `"leftOuter"` also emits each zero-context error ONCE with a NULL
    * `oth_id` — but only after the context side's watermark passes the
    * error's band end, i.e. when absence is proven, not merely unseen
    * so far. That deferred NULL is what makes the outer form the exact
    * streaming analogue of the batch `range_join`'s `n_nearby = 0`
    * rows. */
  def errorContext(events: DataFrame, bandSec: Long = SessionOps.RangeBandSec,
      watermarkDelay: String = "2 minutes",
      joinType: String = "inner"): DataFrame = {
    val err = events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("err_uid"),
        col("ts").as("err_ts"))
      .withWatermark("err_ts", watermarkDelay)
    val oth = events.filter(col("event_type") =!= "error")
      .select(col("event_id").as("oth_id"), col("user_id").as("oth_uid"),
        col("ts").as("oth_ts"))
      .withWatermark("oth_ts", watermarkDelay)
    err.join(oth, expr(
      s"""err_uid = oth_uid AND
          oth_ts >= err_ts - INTERVAL $bandSec SECONDS AND
          oth_ts <= err_ts + INTERVAL $bandSec SECONDS"""), joinType)
      .select(col("err_id"), col("oth_id"))
  }
}
