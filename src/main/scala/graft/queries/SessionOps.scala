package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` stream: gap-based sessionization
  * and the as-of join — the two time-series shapes every log/clickstream
  * warehouse query surface needs beyond plain range predicates (SURVEY
  * §2.2 P8 is the range predicate; these are its stateful/ordered
  * cousins).
  *
  * Precision contract: every cross-engine comparison here works at
  * MICROsecond precision — `Tables.events.ts_us` ≡ DuckDB `epoch_us(ts)`
  * under both parquet timestamp layouts the driver has produced — at
  * which (user_id, ts_us) is unique in the fixtures — order within a user
  * is total, making both operators deterministic.
  *
  * Scale shape (both operators): ONE shuffle on `user_id` and one
  * per-partition sort — no joins, no pair formation. Per-user event
  * volume bounds the window buffer (the sessionization invariant at
  * 100 TB: key by the entity whose timeline you session, never a global
  * sort). Monetary sums go through exact integer cents — a DOUBLE sum's
  * result depends on addition order, which a distributed engine does not
  * guarantee.
  */
object SessionOps {

  def queries: Seq[QueryDef] = Seq(sessionize, asofJoin, rangeJoin, runningTotals)

  /** Session gap: a new session starts after >10 min of inactivity. */
  val SessionGapSec = 600L

  private val SecSql = "CAST(floor(epoch(ts)) AS BIGINT)"

  /** Gap-based sessionization: per-user ordinal session ids from the
    * classic lag-then-cumulative-sum pair (both windows share one
    * (partition, order) spec, so Catalyst plans a single exchange + single
    * sort), rolled up to one row per session. */
  private val sessionize = QueryDef(
    "sessionize",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag($"ts_sec", 1).over(w)
      Tables.events(s, dir)
        .select($"user_id", $"ts_us",
          $"ts_sec",
          round($"value" * 100).cast("long").as("cents"))
        .withColumn("brk",
          when(prev.isNull || $"ts_sec" - prev > SessionGapSec, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum($"brk").over(cum))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          min($"ts_sec").as("start_sec"),
          max($"ts_sec").as("end_sec"),
          round(sum($"cents") / 100.0, 2).as("sum_value"))
        .orderBy($"user_id", $"session_id")
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, epoch_us(ts) AS ts_us, $SecSql AS ts_sec,
          CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      m AS (
        SELECT *, CASE WHEN lag(ts_sec) OVER w IS NULL
            OR ts_sec - lag(ts_sec) OVER w > $SessionGapSec
          THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      s AS (
        SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM m)
      SELECT user_id, session_id, count(*) AS n_events,
        min(ts_sec) AS start_sec, max(ts_sec) AS end_sec,
        round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS sum_value
      FROM s
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """))

  /** Range-join band width: neighbors within ±1 h count as context. */
  val RangeBandSec = 3600L

  /** Banded range join: per error event, how many of the same user's
    * OTHER events fall within ±[[RangeBandSec]] — "activity context
    * around each error". The scale form of an interval join: a raw
    * `|a.ts − b.ts| <= W` predicate has no equi-key, so engines fall back
    * to a per-user cross product; bucketing both sides by `ts div W` and
    * fanning each probe out to its 3 candidate buckets turns it into a
    * plain equi-join on (user_id, bucket) whose candidate set is bounded
    * by band occupancy. Each neighbor lives in exactly ONE bucket, so no
    * post-join dedup is needed. Zero-neighbor errors survive via the
    * final left join (coalesce 0). */
  private val rangeJoin = QueryDef(
    "range_join",
    (s, dir) => {
      import s.implicits._
      val e = Tables.events(s, dir)
        .select($"event_id", $"user_id", $"ts_sec", $"event_type")
      val err = e.filter($"event_type" === "error")
        .select($"event_id", $"user_id", $"ts_sec")
      val oth = e.filter($"event_type" =!= "error")
        .select($"user_id".as("o_uid"), $"ts_sec".as("o_sec"),
          expr(s"ts_sec div $RangeBandSec").as("o_bucket"))
      val probes = err.select($"event_id", $"user_id", $"ts_sec",
        explode(array(
          expr(s"ts_sec div $RangeBandSec - 1"),
          expr(s"ts_sec div $RangeBandSec"),
          expr(s"ts_sec div $RangeBandSec + 1"))).as("bucket"))
      val matched = probes
        .join(oth, $"user_id" === $"o_uid" && $"bucket" === $"o_bucket")
        .filter(abs($"o_sec" - $"ts_sec") <= RangeBandSec)
        .groupBy($"event_id").agg(count(lit(1)).as("n"))
      err.join(matched, Seq("event_id"), "left")
        .select($"event_id", $"user_id",
          coalesce($"n", lit(0L)).as("n_nearby"))
        .orderBy($"event_id")
    },
    Some(s"""
      WITH e AS (
        SELECT event_id, user_id, $SecSql AS ts_sec, event_type
        FROM events),
      err AS (SELECT * FROM e WHERE event_type = 'error'),
      oth AS (SELECT * FROM e WHERE event_type <> 'error')
      SELECT err.event_id, err.user_id,
        count(oth.event_id) AS n_nearby
      FROM err LEFT JOIN oth
        ON err.user_id = oth.user_id
        AND abs(err.ts_sec - oth.ts_sec) <= $RangeBandSec
      GROUP BY err.event_id, err.user_id
      ORDER BY err.event_id
    """))

  /** As-of join, expressed Spark-first: "for each click, the time since
    * the same user's most recent error at-or-before it". NOT a join at
    * all — both streams union into one per-user timeline and a running
    * `last(..., ignoreNulls)` carries the latest error timestamp forward,
    * so the plan is one shuffle + one sort, linear in the input, immune to
    * the pair blow-up a between-join would risk on busy users. The DuckDB
    * oracle states the same semantics with its native ASOF LEFT JOIN.
    * NULL gap = no prior error (left as-of). */
  private val asofJoin = QueryDef(
    "asof_join",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .filter($"event_type".isin("click", "error"))
        .select($"event_id", $"user_id", $"ts_us",
          ($"event_type" === "error").as("is_err"))
        .withColumn("last_err_us",
          last(when($"is_err", $"ts_us"), ignoreNulls = true).over(w))
        .filter(!$"is_err")
        .select($"event_id", $"user_id",
          ($"ts_us" - $"last_err_us").as("gap_us"))
        .orderBy($"event_id")
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
        FROM events
        WHERE event_type IN ('click', 'error')),
      clicks AS (SELECT * FROM e WHERE event_type = 'click'),
      errors AS (SELECT * FROM e WHERE event_type = 'error')
      SELECT c.event_id, c.user_id, c.ts_us - er.ts_us AS gap_us
      FROM clicks c ASOF LEFT JOIN errors er
        ON c.user_id = er.user_id AND c.ts_us >= er.ts_us
      ORDER BY c.event_id
    """))

  /** Running window aggregates: per-user cumulative spend and the 3-event
    * trailing moving average at every event — the frame-bounded window
    * family (`ROWS BETWEEN`) the other event-time operators don't touch.
    * Same scale contract as `sessionize`: both frames share ONE
    * (partition, order) spec → a single user_id exchange + one sort, then
    * two linear frame scans; monetary values ride exact integer cents so
    * the running sums are order-independent, and the 3-row average is
    * `(sum of ≤3 exact longs) / count` — one double division, identical
    * on both engines. */
  private val runningTotals = QueryDef(
    "running_totals",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val last3 = w.rowsBetween(-2, Window.currentRow)
      Tables.events(s, dir)
        .select($"event_id", $"user_id", $"ts_us",
          round($"value" * 100).cast("long").as("cents"))
        .select($"event_id", $"user_id",
          round(sum($"cents").over(cum) / 100.0, 2).as("cum_value"),
          round(avg($"cents").over(last3) / 100.0, 4).as("ma3"))
        .orderBy($"event_id")
    },
    Some(s"""
      WITH e AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          CAST(round(value * 100) AS BIGINT) AS cents
        FROM events)
      SELECT event_id, user_id,
        round(CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts_us
          ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100.0, 2) AS cum_value,
        round(avg(cents) OVER (PARTITION BY user_id ORDER BY ts_us
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 100.0, 4) AS ma3
      FROM e
      ORDER BY event_id
    """))
}
