package graft.queries

import graft.{GraftFunctions, Tables}
import graft.streaming.StatefulDetector
import org.apache.spark.sql.functions._

/** Driver-checkable forms of the streaming-side operators.
  *
  * `stateful_detect` runs the keyed-state detector (T2/T3's M7 scale
  * variant, `streaming/StatefulDetector`) in batch mode over `events` —
  * its per-hash running-baseline semantics are EXACTLY a SQL window
  * running average over preceding tumbling windows, which makes the
  * stateful operator DuckDB-checkable end to end (novelty/frequency
  * thresholds included).
  */
object StreamOps {

  def queries: Seq[QueryDef] = Seq(statefulDetect, sparseScore, sparseCorpusScore)

  /** Demo thresholds for the low-rate synthetic stream (the production
    * defaults never fire on a uniform Poisson-ish corpus — tightened here
    * so the gate exercises BOTH branches with non-empty output). */
  private val Th = StatefulDetector.Thresholds(
    noveltyMinCount = 1, freqMinCount = 2, freqSigma = 1.0, stdFloor = 0.5)

  private val statefulDetect = QueryDef(
    "stateful_detect",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_type".as("rhythm_hash"), $"ts_sec")
      StatefulDetector.detect(ev, thresholds = Th)
        .toDF()
        .select($"rhythm_hash", $"window_start", $"anomaly_type", $"n",
          $"baseline_mean")
        .orderBy($"rhythm_hash", $"window_start", $"anomaly_type")
    },
    Some(s"""
      WITH wc AS (
        SELECT event_type AS rhythm_hash,
          (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS window_start,
          count(*) AS n
        FROM events
        GROUP BY 1, 2),
      st AS (
        -- prev_mean from EXACT integer sum/count (one IEEE division), and
        -- the 4-dp baseline via integer-floor HALF_UP — identical to the
        -- detector's BigDecimal(sum)/windows; avg(n)+round(double) here
        -- drifted a ulp from the iterative fold and flipped a 4-dp
        -- boundary at the sf1 sweep
        SELECT rhythm_hash, window_start, n,
          count(*) OVER w AS prev_windows,
          CAST(sum(n) OVER w AS BIGINT) AS prev_sum,
          CAST(sum(n) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE)
            AS prev_mean
        FROM wc
        WINDOW w AS (PARTITION BY rhythm_hash ORDER BY window_start
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT rhythm_hash, window_start,
        CASE WHEN prev_windows = 0 THEN 'novelty' ELSE 'frequency' END AS anomaly_type,
        n,
        CASE WHEN prev_windows = 0 THEN NULL
          ELSE CAST((2 * 10000 * prev_sum + prev_windows)
                 // (2 * prev_windows) AS BIGINT) / 10000.0
          END AS baseline_mean
      FROM st
      WHERE (prev_windows = 0 AND n >= ${Th.noveltyMinCount})
        OR (prev_windows > 0
          AND n > prev_mean + ${Th.freqSigma}
            * greatest(${Th.stdFloor}, sqrt(prev_mean))
          AND n >= ${Th.freqMinCount})
      ORDER BY rhythm_hash, window_start, anomaly_type
    """))

  /** V4 read path over the write-side sparse vectors: score documents
    * against a query text by sparse TF dot product (IDF-free form — the
    * corpus-stats IDF variant is `bm25_score`). Murmur bucketing is not
    * expressible in portable SQL, so the oracle is a committed golden
    * parquet ([[Golden]]); values also pinned by Bm25SparseSpec/GoldenSpec. */
  private val sparseScore = QueryDef(
    "sparse_score",
    (s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      val q = graft.functions.Bm25Sparse.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("filter window join"))
      val qIdx = {
        val a = q.getArray(0); (0 until a.numElements()).map(a.getInt).toArray
      }
      val qVal = {
        val a = q.getArray(1); (0 until a.numElements()).map(i => a.getFloat(i)).toArray
      }
      val sparse = GraftFunctions.columnOf(graft.functions.Bm25Sparse(
        GraftFunctions.exprOf($"text")))
      // native codegen'd sparse dot (no Scala UDF in the scoring path)
      Tables.documents(s, dir)
        .select($"doc_id", sparse.as("sp"))
        .select($"doc_id",
          round(GraftFunctions.columnOf(graft.functions.SparseDotConst(
            GraftFunctions.exprOf($"sp"), qIdx, qVal)), 6).as("score"))
        .filter($"score" > 0)
        .orderBy($"score".desc, $"doc_id")
        .limit(30)
    },
    Some(Golden.sql("sparse_score")))

  /** V4, reference-fidelity variant: write-side sparse vectors weighted
    * with the CORPUS average document length (Qdrant computes BM25 stats
    * server-side over the real corpus, `qdrant_service.py:23,80`; the base
    * `sparse_score` uses the declared fixed avgdl=256 streaming-append
    * trade-off). The stats pass is one broadcast scalar aggregate — both
    * document AND query vectors take `avgdl` from it in-plan (native
    * [[graft.functions.Bm25SparseDl]] + [[graft.functions.SparseDot]];
    * no driver collect, no UDF). avgdl rounded to 6 dp for cross-run
    * stability. */
  private val sparseCorpusScore = QueryDef(
    "sparse_corpus_score",
    (s, dir) => {
      import s.implicits._
      import graft.functions.TextFunctions.wordTokens
      val docs = Tables.documents(s, dir)
      // corpus avgdl over the same tokenization Bm25Sparse uses
      val stats = docs.agg(
        round(avg(size(wordTokens($"text"))), 6).as("adl"))
      def sparseDl(text: org.apache.spark.sql.Column) =
        GraftFunctions.columnOf(graft.functions.Bm25SparseDl(
          GraftFunctions.exprOf(text), GraftFunctions.exprOf($"adl")))
      docs.crossJoin(broadcast(stats))
        .select($"doc_id",
          round(GraftFunctions.columnOf(graft.functions.SparseDot(
            GraftFunctions.exprOf(sparseDl($"text")),
            GraftFunctions.exprOf(sparseDl(lit("filter window join"))))), 6)
            .as("score"))
        .filter($"score" > 0)
        .orderBy($"score".desc, $"doc_id")
        .limit(30)
    },
    Some(Golden.sql("sparse_corpus_score")))
}
