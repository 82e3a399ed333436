package graft.control

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** C4-C7/T4/J3 — the adaptive control plane: suppressions (TTL) and
  * patches (permanent allow-list) over rhythm hashes.
  *
  * Reference (`/root/reference/app/services/control_service.py`):
  * suppress = in-memory map hash→expiry lazily evicted (`:60-64, 89-98`);
  * patch = SQLite upsert `ON CONFLICT DO UPDATE is_active=1` (`:66-87`)
  * plus an eval YAML per patch (`:37-58`); rules listing & soft-delete
  * (`:100-136`). Registry DDL: `app/db/registry.py:21-39`.
  *
  * Spark: one small parquet rules table; upsert = read-modify-overwrite
  * keyed by (rhythm_hash, rule); active-rule resolution is a filter with
  * an injected clock (deterministic tests — no current_timestamp in
  * logic); enforcement is a broadcast left_anti join, so at 100 TB the
  * rules ride along as a broadcast variable, never a shuffle.
  */
final class Rules(spark: SparkSession, path: String) {
  import Rules._

  private def empty: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Option[Long], Boolean)]
      .toDF("rhythm_hash", "rule", "expires_at", "is_active")
  }

  def load(): DataFrame =
    if (Files.exists(Paths.get(path))) spark.read.parquet(path) else empty

  /** Read-modify-overwrite upsert keyed by (rhythm_hash, rule). */
  private def upsert(row: (String, String, Option[Long], Boolean)): Unit = {
    import spark.implicits._
    val incoming = Seq(row).toDF("rhythm_hash", "rule", "expires_at", "is_active")
    val merged = load()
      .join(incoming.select("rhythm_hash", "rule"), Seq("rhythm_hash", "rule"), "left_anti")
      .unionByName(incoming)
    // small control table: collect-rewrite avoids read-path/write-path overlap
    val rows = merged.collect().toSeq
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), merged.schema)
    out.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** C4-adjacent — temporary suppression with TTL (reference `:60-64`). */
  def suppress(hash: String, ttlSec: Long, nowSec: Long): Unit =
    upsert((hash, Suppression, Some(nowSec + ttlSec), true))

  /** C4 — permanent allow-list patch; re-patching reactivates (`:66-87`). */
  def patch(hash: String): Unit =
    upsert((hash, AllowList, None, true))

  /** C7 — soft-delete a patch / drop a suppression (`:100-136`). */
  def deactivate(hash: String, rule: String): Unit =
    upsert((hash, rule, None, false))

  /** C5/C7/T4 — active rules at `nowSec`: live patches ∪ unexpired
    * suppressions (lazy TTL eviction ≡ the expiry filter). */
  def active(nowSec: Long): DataFrame =
    load().filter(col("is_active") &&
      (col("expires_at").isNull || col("expires_at") > nowSec))

  // loaded-rules memo for [[activeHashes]]: (table listing fingerprint,
  // (hash, expires_at, is_active) rows)
  private val loadedMemo = new java.util.concurrent.atomic.AtomicReference[
    (String, Seq[(String, Option[Long], Boolean)])]()

  /** Driver-side [[active]]-hash set for the serving fast path: ranking
    * an O(k) candidate set in-JVM must not pay a Spark job to re-read a
    * tiny control table per call. The loaded rows are memoized against
    * the table directory's listing fingerprint (name+size+mtime of every
    * file — every upsert rewrites the directory, so any rule change
    * invalidates); the expiry filter applies per call with the caller's
    * clock, exactly [[active]]'s semantics (RulesSpec pins the
    * equivalence). */
  def activeHashes(nowSec: Long): Set[String] = {
    val p = Paths.get(path)
    val fp =
      if (!Files.exists(p)) "absent"
      else {
        val st = Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.map { f =>
            val file = f.toFile
            s"${file.getName}:${file.length}:${file.lastModified}"
          }.toSeq.sorted.mkString("|")
        } finally st.close()
      }
    val cur = loadedMemo.get()
    val rows =
      if (cur != null && cur._1 == fp) cur._2
      else {
        val loaded = load().select("rhythm_hash", "expires_at", "is_active")
          .collect()
          .map(r => (r.getString(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getBoolean(2))).toSeq
        loadedMemo.set((fp, loaded))
        loaded
      }
    rows.iterator
      .filter(t => t._3 && t._2.forall(_ > nowSec))
      .map(_._1).toSet
  }

  /** J3 — drop rows whose rhythm hash has an active rule. */
  def enforce(df: DataFrame, nowSec: Long): DataFrame =
    df.join(broadcast(active(nowSec).select("rhythm_hash").distinct()),
      Seq("rhythm_hash"), "left_anti")

  /** [[enforce]] with a PER-ROW clock: drops rows whose hash has a rule
    * active at that row's own `nowSecCol` — the multi-window batch form
    * (a catch-up promotion trigger carries many closed windows, each with
    * its own expiry instant; one anti-join replaces a per-window loop).
    * Same lazy-TTL semantics: `enforceAt(df, lit(t))` ≡ `enforce(df, t)`. */
  def enforceAt(df: DataFrame, nowSecCol: Column): DataFrame = {
    val r = load().filter(col("is_active"))
      .select(col("rhythm_hash").as("__r_hash"), col("expires_at"))
    df.join(broadcast(r),
      df("rhythm_hash") === col("__r_hash") &&
        (col("expires_at").isNull || col("expires_at") > nowSecCol),
      "left_anti")
  }
}

object Rules {
  val Suppression = "SUPPRESSION"
  val AllowList = "ALLOW_LIST"
}
