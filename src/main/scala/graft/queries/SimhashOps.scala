package graft.queries

import graft.{GraftFunctions, Tables}
import org.apache.spark.sql.functions._

/** SimHash operators: the native-expression fingerprint (P3, the Tier-1
  * identity vector) and a SimHash near-dup dedup pass (training-pipeline
  * dedup family).
  *
  * `simhash_dedup` uses a 60-bit Column-expression variant of the hash
  * (distinct 4-shingles, first 15 hex chars of md5 per shingle) precisely
  * so the SAME math is expressible in the DuckDB oracle — the native
  * `Simhash64` expression is golden-file-tested instead (md5-low-64 with
  * multiplicity weights is not practical in portable SQL).
  *
  * Scale shape: signature computation is scan-parallel; the dedup join is
  * banded LSH (explode 4 bands → shuffle on the band key → pair join), so
  * pair count is bounded by band-bucket collisions, never all-pairs — the
  * standard 100 TB simhash-dedup layout.
  */
object SimhashOps {

  def queries: Seq[QueryDef] = Seq(simhashFp, simhashDedup)

  /** Bits of the oracle-parity hash (15 hex chars — keeps values in signed
    * positive range on both engines). */
  val Bits = 60
  val Bands = 4
  val BandBits: Int = Bits / Bands // 15
  val BandMask: Long = (1L << BandBits) - 1
  val HammingMax = 20

  /** P3 — native `simhash64` fingerprint per document. The md5-low-64
    * multiplicity-weighted math is not practical in portable SQL, so the
    * oracle is a committed golden parquet ([[Golden]], pinned at the
    * driver's sf0.01 verify scale; drift caught by GoldenOracleSpec). */
  private val simhashFp = QueryDef(
    "simhash_fp",
    (s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      Tables.documents(s, dir)
        .select($"doc_id", GraftFunctions.simhash64($"text").as("sh64"))
        .orderBy($"doc_id")
    },
    Some(Golden.sql("simhash_fp")))

  /** 60-bit simhash signature from distinct 4-shingles. The per-shingle
    * md5 base hashes are codegen'd built-ins; the 60-bit majority vote is
    * the one-pass native [[graft.functions.SimhashVote]] kernel (the
    * equivalent 60×filter() HOF pipeline evaluates lambdas per element —
    * 10× slower at sf0.1 — while computing the identical value). */
  private def simhash60(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import docs.sparkSession.implicits._
    val hashed = docs.select(
      $"doc_id",
      GraftFunctions.columnOf(graft.functions.ShingleHashes(
        GraftFunctions.exprOf($"text"), 4, 15)).as("hs"))
    hashed.select($"doc_id",
      GraftFunctions.columnOf(
        graft.functions.SimhashVote(GraftFunctions.exprOf($"hs"), Bits)).as("sh"))
  }

  /** SQL mirror of [[simhash60]] — term-for-term the same arithmetic. */
  private def simhash60Sql: String = {
    val sgs = "list_distinct(list_filter(list_transform(" +
      "range(1, greatest(len(norm) - 2, 1)), i -> substr(norm, i, 4)), s -> len(s) = 4))"
    val terms = (0 until Bits).map { b =>
      s"CASE WHEN 2 * len(list_filter(hs, x -> (x >> $b) & 1 = 1)) > n THEN (1::BIGINT << $b) ELSE 0 END"
    }.mkString("\n          + ")
    s"""
      WITH d AS (
        SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
        FROM documents),
      sh AS (SELECT doc_id, $sgs AS sgs FROM d),
      h AS (
        SELECT doc_id,
          list_transform(sgs, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs,
          len(sgs) AS n
        FROM sh),
      sig AS (
        SELECT doc_id,
          $terms AS sh
        FROM h)"""
  }

  /** SimHash near-dup dedup: banded LSH candidates (4x15-bit bands) →
    * exact hamming <= [[HammingMax]] → sorted pair list. */
  private val simhashDedup = QueryDef(
    "simhash_dedup",
    (s, dir) => {
      import s.implicits._
      val sig = simhash60(Tables.documents(s, dir))
      val bandKeys = array((0 until Bands).map { j =>
        lit(j.toLong << BandBits).bitwiseOR(
          shiftright($"sh", j * BandBits).bitwiseAND(lit(BandMask)))
      }: _*)
      // cached: both self-join sides (at warehouse scale the signature
      // relation is a materialized table, not recomputed per side)
      val bands = sig.select($"doc_id", $"sh", explode(bandKeys).as("bk")).cache()
      // FIRST-SHARED-BAND dedup instead of distinct(): a pair colliding
      // in k bands appears k times in the join output, and the old
      // distinct() re-shuffled every surviving pair to drop the copies
      // (965M-row exchange at sf10). Both full signatures ride the join
      // row, so "is this the smallest band the two signatures share?" is
      // pure scan-side arithmetic — the result SET is identical and the
      // dedup exchange disappears from the plan (exactly-once proof:
      // TextOps.firstSharedBand). The oracle keeps SQL DISTINCT — same
      // set, independently derived.
      val firstShared = TextOps.firstSharedBand(Bands)(j =>
        (shiftright(col("a.sh"), j * BandBits).bitwiseAND(lit(BandMask)),
          shiftright(col("b.sh"), j * BandBits).bitwiseAND(lit(BandMask))))
      val pairs = bands.as("a")
        .join(bands.as("b"),
          col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
        .filter(shiftright(col("a.bk"), BandBits) === firstShared)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming"))
        // hamming cut scan-side on the join output (function of the
        // pair, so ordering vs the band filter cannot change the set)
        .filter($"hamming" <= HammingMax)
      // The final global sort is the query's ONLY pair-cardinality
      // exchange (the band join's shuffle carries 4 rows per DOC; the
      // 965M-pair join output is produced scan-side) — at sf10 it moved
      // ~5 GB of (long,long,long) rows and dominated the row's ambient
      // variance (VERDICT r15 item 3). When the id width allows
      // (2·bits(maxDocId) + 5 ≤ 63 — half a billion docs), the triple is
      // PACKED into one long for the exchange — a_id in the high bits,
      // b_id, then hamming (≤20, 5 bits) — and unpacked above the sort.
      // (a_id, b_id) is unique (first-shared-band emits exactly once) and
      // everything is non-negative, so ordering by the packed key IS
      // ordering by (a_id, b_id): same rows, same order, ~1/3 the
      // shuffled bytes. Width probe costs one columnar max() over docs.
      val maxId = Tables.documents(s, dir).agg(max($"doc_id")).first().getLong(0)
      val idBits = math.max(64 - java.lang.Long.numberOfLeadingZeros(maxId), 1)
      if (maxId >= 0 && 2 * idBits + 5 <= 63) {
        pairs
          .select((shiftleft($"a_id", idBits + 5)
            .bitwiseOR(shiftleft($"b_id", 5))
            .bitwiseOR($"hamming")).as("pk"))
          .orderBy($"pk")
          .select(shiftright($"pk", idBits + 5).as("a_id"),
            shiftright($"pk", 5).bitwiseAND(lit((1L << idBits) - 1)).as("b_id"),
            $"pk".bitwiseAND(lit(31L)).as("hamming"))
      } else pairs.orderBy($"a_id", $"b_id")
    },
    Some {
      val bandExprs = (0 until Bands).map { j =>
        s"(${j}::BIGINT << $BandBits) | ((sh >> ${j * BandBits}) & $BandMask)"
      }.mkString(", ")
      s"""$simhash60Sql,
      bands AS (SELECT doc_id, sh, unnest([$bandExprs]) AS bk FROM sig),
      pairs AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        FROM bands a JOIN bands b
          ON a.bk = b.bk AND a.doc_id < b.doc_id)
      SELECT a_id, b_id, hamming
      FROM pairs
      WHERE hamming <= $HammingMax
      ORDER BY a_id, b_id
    """
    })
}
