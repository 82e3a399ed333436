package graft.streaming

import graft.queries.SessionOps
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming-native gap sessionization — the in-flight analogue of the
  * batch `sessionize` operator (same gap rule, same session rollup
  * columns, same per-user ordinals), built on per-user keyed state:
  * events fold into the open session; a gap longer than `gapSec` closes
  * it; the event-time timeout closes sessions whose users simply go
  * quiet (the watermark passing `last + gap` proves no in-order event
  * can extend them).
  *
  * State is ONE open session per active user (constant size), evicted at
  * close — the property that keeps the operator viable on an unbounded
  * stream; the batch form's per-user sort window is the replay/backfill
  * path of the same semantics.
  */
object SessionStream {

  /** Typed event row. Carries the TIMESTAMP itself (not a pre-derived
    * long): converting to a plain column before the keyed op would
    * project away the watermarked attribute, and event-time timeout
    * requires the watermark to reach flatMapGroupsWithState. */
  case class Ev(userId: Long, ts: java.sql.Timestamp, cents: Long) {
    def tsUs: Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
  }
  case class OpenSession(ordinal: Long, n: Long, startSec: Long,
      lastSec: Long, cents: Long)
  case class ClosedSession(user_id: Long, session_id: Long, n_events: Long,
      start_sec: Long, end_sec: Long, sum_value: Double)

  private def close(uid: Long, o: OpenSession): ClosedSession =
    ClosedSession(uid, o.ordinal, o.n, o.startSec, o.lastSec,
      // HALF_UP at 2 dp over exact integer cents == the batch query's
      // round(sum(cents)/100.0, 2)
      BigDecimal(o.cents).bigDecimal
        .divide(new java.math.BigDecimal(100), 2, java.math.RoundingMode.HALF_UP)
        .doubleValue())

  /** Fold one batch of a user's events into the open session, closing on
    * gaps; exposed for unit testing (pure apart from `state`). Events are
    * sorted by microsecond timestamp — the same total order the batch
    * operator windows on, so ordinals agree. */
  def step(gapSec: Long)(
      key: Long,
      evs: Iterator[Ev],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(key, _)).iterator
      state.remove()
      return out
    }
    val sorted = evs.toSeq.sortBy(_.tsUs)
    var open = state.getOption
    val out = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      val sec = e.tsUs / 1000000L
      open = open match {
        case Some(o) if sec - o.lastSec <= gapSec =>
          Some(o.copy(n = o.n + 1, lastSec = math.max(o.lastSec, sec),
            cents = o.cents + e.cents))
        case Some(o) =>
          out += close(key, o)
          Some(OpenSession(o.ordinal + 1, 1L, sec, sec, e.cents))
        case None =>
          Some(OpenSession(1L, 1L, sec, sec, e.cents))
      }
    }
    open.foreach { o =>
      state.update(o)
      // fire once the watermark proves no in-order event can extend the
      // session (strictly past last + gap)
      state.setTimeoutTimestamp((o.lastSec + gapSec) * 1000L + 1L)
    }
    out.result().iterator
  }

  /** Wire the stateful sessionizer over an event stream with columns
    * (`user_id` LONG, `ts` TIMESTAMP event time, `value` DOUBLE).
    * Returns the closed-session stream (append mode). */
  def sessions(
      events: DataFrame,
      gapSec: Long = SessionOps.SessionGapSec,
      watermarkDelay: String = "2 minutes"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("userId"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[Ev]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(step(gapSec))
  }
}
