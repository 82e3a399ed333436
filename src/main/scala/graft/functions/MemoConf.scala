package graft.functions

/** Runtime sizing for the per-thread kernel memos (VERDICT r12 item 4).
  *
  * The codegen kernels ([[EmbedText]], [[Simhash64]],
  * [[ShingleHashes]]) keep direct-mapped per-thread caches whose sizes
  * were compile-time constants (~10 MB per executor thread at the
  * defaults — SCALE.md memo-budget section). A memory-tight deployment
  * can now shrink (or effectively disable, bits = 0) each memo with a
  * Spark conf at SUBMIT time, no rebuild:
  *
  *   spark.graft.memo.embedBits    (default 16; 2^16 x 12 B = 0.8 MB/thread)
  *   spark.graft.memo.simhashBits  (default 18; 2^18 x 16 B = 4 MB/thread)
  *   spark.graft.memo.shingleBits  (default 17; 2^17 slots + cached strings)
  *
  * Values clamp to [0, 24]. Read ONCE per JVM via `SparkEnv` (present on
  * the driver and on every executor; absent in bare-JVM unit use, which
  * falls back to the default) because the thread-local caches are sized
  * at first use — set the conf in spark-submit / the session builder,
  * not via `spark.conf.set` at runtime. Memo size NEVER affects values:
  * every kernel's miss path IS the exact function, a smaller cache only
  * recomputes more (MemoConfSpec pins bits=0 parity per kernel).
  */
object MemoConf {

  private[functions] def clamp(v: Int): Int = math.max(0, math.min(24, v))

  /** Parse + clamp with an injectable lookup — the spec seam; malformed
    * values fall back to the default rather than failing a query. */
  private[functions] def bits(default: Int, lookup: => Option[String]): Int =
    clamp(
      try lookup.map(_.trim.toInt).getOrElse(default)
      catch { case _: Throwable => default })

  /** Configured size exponent for the memo behind `key`. */
  def bits(key: String, default: Int): Int =
    bits(default, {
      val env = org.apache.spark.SparkEnv.get
      if (env == null) None else env.conf.getOption(key)
    })
}
