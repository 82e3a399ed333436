package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** VIA log-path operators (SURVEY §2.2-§2.4, §2.7) as oracle-checked
  * queries over the driver testdata. Role mapping per FIXTURES.md §B:
  * `events` ≡ log stream (event_type ≡ rhythm hash family, props ≡ payload),
  * `documents.text` ≡ log bodies.
  *
  * All are scan → narrow project/filter → (at most one) shuffle plans:
  * filters and JSON path extraction sit directly over the parquet scan so
  * Catalyst pushes what it can into the reader; group-bys are partial-
  * aggregated; top-k is TakeOrderedAndProject (no full sort at scale).
  */
object LogOps {

  def queries: Seq[QueryDef] = Seq(
    templateHash, jsonFilter, jsonFilterKernel, tailFilter, textMatch,
    textMatchIndexed, tsWindow, severityMap, topkSort, rulesAntijoin,
    bglExtract, promoRollup, top1PerGroup, groupedSearch)

  /** DuckDB-side epoch seconds of the event timestamp; the Spark side uses
    * the exact-integer `ts_sec` column added by `Tables.events`. */
  private val SecSql = "CAST(floor(epoch(ts)) AS BIGINT)"

  /** P1+P2 — template extraction + rhythm hash over document bodies.
    * Reference: app/services/ingestion_service.py:16-28. */
  private val templateHash = QueryDef(
    "template_hash",
    (s, dir) => {
      import s.implicits._
      val t = template($"text")
      Tables.documents(s, dir)
        .select($"doc_id", t.as("template"),
          rhythmHash(t, $"source", $"lang").as("rhythm_hash"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, template,
        substr(sha256(template), 1, 16) || ':' ||
          substr(sha256(source || ':' || lang), 1, 16) AS rhythm_hash
      FROM (
        SELECT doc_id, source, lang,
          regexp_replace(regexp_replace(regexp_replace(text,
            '$UuidRe', '*', 'g'),
            '$Ipv4Re', '*', 'g'),
            '$IntRe', '*', 'g') AS template
        FROM documents)
      ORDER BY doc_id
    """))

  /** P4+P5 — JSON payload extraction + numeric cast + pushdown filter.
    * Reference: app/services/ingestion_service.py:44-53. */
  private val jsonFilter = QueryDef(
    "json_filter",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_id", $"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .filter($"k" < 10)
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, event_type,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 10
      ORDER BY event_id
    """))

  /** P4+P5 through the native [[graft.functions.JsonGetExpr]] kernel — the
    * same values as `json_filter` (kernel parity is fuzz-proven in
    * JsonGetKernelSpec), same DuckDB oracle, one-pass scanner instead of a
    * per-row Jackson parse. The built-in row stays as the cross-engine
    * check of the general API; this row is the production extraction path
    * and closes the sf1 bench's worst per-row-kernel flag (json_filter
    * 7.1 s vs DuckDB 0.2 s). */
  private val jsonFilterKernel = QueryDef(
    "json_filter_kernel",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_id", $"event_type",
          jsonGet($"props", "k").cast("long").as("k"))
        .filter($"k" < 10)
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, event_type,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 10
      ORDER BY event_id
    """))

  /** S3+P6 — log-tail read: case-insensitive substring filter, newest
    * first, limit. Reference: app/api/v1/endpoints/stream.py:12-34. */
  private val tailFilter = QueryDef(
    "tail_filter",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .filter(lower($"event_type").contains("e")) // view/error/purchase...
        .select($"event_id", $"event_type", $"ts_sec")
        .orderBy($"ts_sec".desc, $"event_id")
        .limit(100)
    },
    Some(s"""
      SELECT event_id, event_type, $SecSql AS ts_sec
      FROM events
      WHERE contains(lower(event_type), 'e')
      ORDER BY ts_sec DESC, event_id
      LIMIT 100
    """))

  /** P7 — full-text word-token match (all tokens present).
    * Reference: forensic_analysis_service.py:28; qdrant_service.py:95. */
  private val textMatch = QueryDef(
    "text_match",
    (s, dir) => {
      import s.implicits._
      Tables.documents(s, dir)
        .filter(matchText($"text", "filter window join"))
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, lang, source
      FROM (
        SELECT *, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS toks
        FROM documents)
      WHERE list_contains(toks, 'filter')
        AND list_contains(toks, 'window')
        AND list_contains(toks, 'join')
      ORDER BY doc_id
    """))

  /** P7, indexed form — the same match through the persisted inverted
    * postings index ([[graft.search.TextIndex]]): probe prunes to the
    * query tokens' hash-bucket partitions at file-listing time instead
    * of re-tokenizing the corpus, then joins the matching doc_ids back
    * for the projection. Same oracle as `text_match`; the index is built
    * once per JVM, so steady state (what the bench's min-of-N measures)
    * is probe-only. */
  private val textMatchIndexed = QueryDef(
    "text_match_indexed",
    (s, dir) => {
      import s.implicits._
      val idx = graft.search.TextIndex.indexFor(s, dir)
      Tables.documents(s, dir)
        .join(graft.search.TextIndex.probe(s, idx, "filter window join"),
          Seq("doc_id"), "left_semi")
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, lang, source
      FROM (
        SELECT *, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS toks
        FROM documents)
      WHERE list_contains(toks, 'filter')
        AND list_contains(toks, 'window')
        AND list_contains(toks, 'join')
      ORDER BY doc_id
    """))

  /** T2+A1+P8 — 60 s tumbling-window per-type counts over a time range.
    * Reference: app/worker.py:13-22; rhythm_analysis_service.py:51. */
  private val tsWindow = QueryDef(
    "ts_window",
    (s, dir) => {
      import s.implicits._
      val sc = $"ts_sec"
      Tables.events(s, dir)
        .filter(sc >= 1704067200L && sc < 1704240000L) // 2024-01-01 .. 01-03
        .groupBy((floor(sc / 60L) * 60L).as("bucket_start"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"bucket_start", $"event_type")
    },
    Some(s"""
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS bucket_start,
        event_type, count(*) AS n
      FROM events
      WHERE $SecSql >= 1704067200 AND $SecSql < 1704240000
      GROUP BY 1, 2
      ORDER BY 1, 2
    """))

  /** P9 — severity text → OTel severityNumber mapping (when-chain ≡ map
    * literal). Reference: generate_logs.py:59. */
  private val severityMap = QueryDef(
    "severity_map",
    (s, dir) => {
      import s.implicits._
      val sev = when($"event_type" === "error", 17)
        .when($"event_type" === "purchase", 13)
        .when($"event_type" === "signup", 9)
        .when($"event_type" === "click", 5)
        .otherwise(9).cast("long")
      Tables.events(s, dir)
        .groupBy($"event_type", sev.as("severity_number"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
        CAST(CASE event_type WHEN 'error' THEN 17 WHEN 'purchase' THEN 13
          WHEN 'signup' THEN 9 WHEN 'click' THEN 5 ELSE 9 END AS BIGINT)
          AS severity_number,
        count(*) AS n
      FROM events
      GROUP BY 1, 2
      ORDER BY 1
    """))

  /** A7+S3 — global top-k by score (TakeOrderedAndProject, not full sort).
    * Reference: forensic_analysis_service.py:95-96. */
  private val topkSort = QueryDef(
    "topk_sort",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_id", $"event_type", $"value")
        .orderBy($"value".desc, $"event_id")
        .limit(50)
    },
    Some("""
      SELECT event_id, event_type, value
      FROM events
      ORDER BY value DESC, event_id
      LIMIT 50
    """))

  /** J3+T4+C5+C7 — suppression/patch anti-join with TTL expiry against a
    * broadcast rules table (fixed "now" for determinism).
    * Reference: rhythm_analysis_service.py:86-87; control_service.py:89-98. */
  private val rulesAntijoin = QueryDef(
    "rules_antijoin",
    (s, dir) => {
      import s.implicits._
      val now = 1706572800L // 2024-01-30 00:00:00 UTC
      val rules = s.createDataFrame(Seq(
        ("error", Some(1706600000L)),   // suppression, unexpired -> active
        ("click", Some(1704000000L)),   // suppression, expired -> inactive
        ("signup", None: Option[Long])  // permanent patch (ALLOW_LIST)
      )).toDF("rhythm_hash", "expires_at")
        .filter($"expires_at".isNull || $"expires_at" > now)
        .select($"rhythm_hash")
      // anti-join ABOVE the aggregate, not below: the suppression
      // predicate is on the GROUP KEY, so dropping suppressed groups
      // after the count is row-for-row identical to dropping their
      // events before it — but the probe then touches #groups rows
      // (~5 here; bounded by distinct rhythm hashes at any corpus size)
      // instead of every event. Measured at sf10: the per-event BHJ
      // anti probe added ~0.7 s (~10 s CPU) on top of the 0.21 s
      // scan+agg floor — the single largest cost of the row (SCALE.md
      // r17 floor decomposition). The `n >= 0` conjunct is load-bearing:
      // PushDownLeftSemiAntiJoin pushes a semi/anti join back below an
      // aggregate whenever its condition touches only grouping columns
      // (plans/r17/rules_antijoin — the bare group-key join was silently
      // rewritten to the per-event probe), and an anti-join condition
      // cannot be split, so one conjunct on the aggregated column pins
      // the whole join above the agg. `n = count(1) >= 1 > 0` for every
      // group, so the conjunct is identically true and the kept rows are
      // exactly those of the bare key-equality anti-join.
      Tables.events(s, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"))
        .join(broadcast(rules),
          $"event_type" === $"rhythm_hash" && $"n" >= 0, "left_anti")
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n
      FROM events
      WHERE event_type NOT IN (
        SELECT rhythm_hash
        FROM (VALUES ('error', 1706600000), ('click', 1704000000),
                     ('signup', NULL)) AS rules(rhythm_hash, expires_at)
        WHERE expires_at IS NULL OR expires_at > 1706572800)
      GROUP BY event_type
      ORDER BY event_type
    """))

  /** C2 — BGL fixed-position log-line schema detection via regexp groups.
    * Reference: app/services/schema_service.py:51-64. Lines below are
    * synthetic, in the public BGL dataset's line format. */
  private val BglLines = Seq(
    "1117838570 2005.06.03 R02-M1-N0-C:J12-U11 2005-06-03-15.42.50.675872 R02-M1-N0-C:J12-U11 RAS KERNEL INFO instruction cache parity error corrected",
    "1117838571 2005.06.03 R21-M0-N3-C:J07-U01 2005-06-03-15.42.51.021341 R21-M0-N3-C:J07-U01 RAS KERNEL FATAL data TLB error interrupt",
    "1117838999 2005.06.03 R05-M1-N8-C:J02-U11 2005-06-03-15.49.12.000001 R05-M1-N8-C:J02-U11 RAS APP WARNING ciod: failed to connect")
  private val BglRe =
    "^(\\d+) (\\S+) (\\S+) (\\S+) (\\S+) RAS (\\S+) (\\S+) (.*)$"

  private val bglExtract = QueryDef(
    "bgl_extract",
    (s, dir) => {
      import s.implicits._
      BglLines.toDF("line")
        .select(
          regexp_extract($"line", BglRe, 1).cast("long").as("unix_ts"),
          regexp_extract($"line", BglRe, 3).as("node"),
          regexp_extract($"line", BglRe, 6).as("component"),
          regexp_extract($"line", BglRe, 7).as("level"),
          regexp_extract($"line", BglRe, 8).as("message"))
        .orderBy($"unix_ts")
    },
    Some(s"""
      SELECT CAST(regexp_extract(line, '$BglRe', 1) AS BIGINT) AS unix_ts,
        regexp_extract(line, '$BglRe', 3) AS node,
        regexp_extract(line, '$BglRe', 6) AS component,
        regexp_extract(line, '$BglRe', 7) AS level,
        regexp_extract(line, '$BglRe', 8) AS message
      FROM (VALUES ${BglLines.map(l => s"('$l')").mkString(", ")}) AS t(line)
      ORDER BY unix_ts
    """))

  /** A4 — promotion cluster rollup: min/max/count, earliest payload,
    * first-5 sample (joined to a string so the hash compare is
    * array-representation-agnostic). Reference: promotion_service.py:22-46. */
  private val promoRollup = QueryDef(
    "promo_rollup",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_type", $"event_id", $"props", $"ts_sec")
        .groupBy($"event_type")
        .agg(
          min($"ts_sec").as("start_ts"),
          max($"ts_sec").as("end_ts"),
          count(lit(1)).as("n"),
          min_by($"props", $"ts_sec" * lit(10000000L) + $"event_id").as("first_props"),
          // first-5 sample through the bounded MinKLongs aggregate over
          // an order-preserving (ts << 32) | id packing (exact while
          // 0 <= id < 2^32 and 0 <= ts_sec < 2^31 — true for every
          // fixture and any pre-2038 store; beyond that the pack widens
          // to two longs). The bounds are ENFORCED, not assumed: an
          // out-of-range row raises instead of silently corrupting which
          // ids get sampled (ADVICE r10). The collect_list+array_sort+
          // slice form this replaces shipped EVERY group member through
          // the exchange to keep 5 of them.
          concat_ws(",",
            transform(
              graft.GraftFunctions.columnOf(graft.functions.MinKLongs(
                graft.GraftFunctions.exprOf(
                  when($"event_id" < 0 || $"event_id" >= lit(1L << 32) ||
                      $"ts_sec" < 0 || $"ts_sec" >= lit(1L << 31),
                      raise_error(concat(
                        lit("promo_rollup sample packing out of range: " +
                          "(ts_sec, event_id) = ("),
                        $"ts_sec", lit(", "), $"event_id", lit(")")))
                        .cast("long"))
                    .otherwise(
                      shiftleft($"ts_sec", 32).bitwiseOR($"event_id"))), 5)
                .toAggregateExpression()),
              x => x.bitwiseAND(lit(0xffffffffL)).cast("string")))
            .as("sample_ids"))
        .orderBy($"event_type")
    },
    Some(s"""
      SELECT event_type,
        min(ts_sec) AS start_ts, max(ts_sec) AS end_ts, count(*) AS n,
        arg_min(props, ts_sec * 10000000 + event_id) AS first_props,
        array_to_string((list(event_id ORDER BY ts_sec, event_id))[1:5], ',')
          AS sample_ids
      FROM (SELECT event_type, event_id, props, $SecSql AS ts_sec FROM events)
      GROUP BY event_type
      ORDER BY event_type
    """))

  /** A3 — deterministic representative row per group (latest by ts).
    * Reference: rhythm_analysis_service.py:80 (nondeterministic there;
    * we declare latest-wins — SURVEY §7.5.4). Top-1 as a
    * partial-aggregable `max_by` over the (ts_sec, event_id) key — the
    * `grouped_search` shape: map-side combine keeps one row per group
    * per partition, where the window row_number()=1 form sorted the
    * whole fact per event_type first. The oracle keeps the window SQL
    * as the independent cross-engine formulation. */
  private val top1PerGroup = QueryDef(
    "top1_per_group",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_type", $"event_id", $"props", $"ts_sec")
        .groupBy($"event_type")
        .agg(graft.GraftFunctions.maxByOrd(struct($"event_id", $"props"),
          struct($"ts_sec", $"event_id")).as("top"))
        .select($"event_type", $"top.event_id".as("event_id"),
          $"top.props".as("props"))
        .orderBy($"event_type")
    },
    Some(s"""
      SELECT event_type, event_id, props
      FROM (
        SELECT event_type, event_id, props,
          row_number() OVER (PARTITION BY event_type
            ORDER BY $SecSql DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY event_type
    """))

  /** A5+A6 — grouped search: best hit per group (group_size=1), top 100
    * groups by hit score; federation over day partitions is implicit (one
    * table). Reference: forensic_analysis_service.py:45-62. */
  private val groupedSearch = QueryDef(
    "grouped_search",
    (s, dir) => {
      import s.implicits._
      // payload probe through the native JSON kernel (byte-identical to
      // get_json_object, JsonGetKernelSpec) — the DuckDB oracle remains the
      // independent cross-engine check
      val hash = concat($"event_type", lit(":"),
        jsonGet($"props", "k")).as("rhythm_hash")
      // top-1-per-group as a partial-aggregable max_by (map-side combine;
      // comparison is lexicographic (value, -event_id), -event_id gives
      // the asc tie-break) — equivalent to the window row_number()=1 plan
      // but with no per-partition sort, and all-primitive payload/ordering
      // makes it the fully-codegen MaxByPrim form (HashAggregateExec) —
      // the shape that survives 100x scale. MaxByPrim SKIPS null-ordering
      // rows, so a nullable `value` is coalesced to -Infinity: an all-null
      // group then still yields its min-event_id row (nulls-last), exactly
      // the oracle's row_number() ORDER BY value DESC [NULLS LAST] pick.
      // Contract edge: a group holding BOTH a genuine -Infinity value and
      // nulls ties at -Infinity (a double can't encode below-all-values),
      // so the pick is min-event_id across them where the oracle ranks
      // the real -Infinity first — metric values are finite here.
      Tables.events(s, dir)
        .select(hash, $"event_id", $"value")
        .groupBy($"rhythm_hash")
        .agg(graft.GraftFunctions.maxByPrim(struct($"event_id", $"value"),
          struct(coalesce($"value", lit(Double.NegativeInfinity)),
            -$"event_id")).as("top"))
        .select($"rhythm_hash", $"top.event_id".as("event_id"),
          $"top.value".as("value"))
        .orderBy($"value".desc, $"rhythm_hash")
        .limit(100)
    },
    Some("""
      SELECT rhythm_hash, event_id, value
      FROM (
        SELECT event_type || ':' || json_extract_string(props, '$.k')
            AS rhythm_hash, event_id, value,
          row_number() OVER (
            PARTITION BY event_type || ':' || json_extract_string(props, '$.k')
            ORDER BY value DESC, event_id) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY value DESC, rhythm_hash
      LIMIT 100
    """))
}
