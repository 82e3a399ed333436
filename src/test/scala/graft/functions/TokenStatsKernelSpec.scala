package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused token-stat kernels must agree EXACTLY with the
  * WordTokens-array compositions they replace — the quality_score,
  * gopher_quality, lang_id, repetition_score and weighted_sample gate
  * rows keep their DuckDB oracles as the independent cross-engine check,
  * so this spec pins the kernel against the previous Spark-side trees on
  * adversarial text (unicode, digits, null rows, empty docs, repeats). */
class TokenStatsKernelSpec extends SparkSpec {

  import graft.GraftFunctions.{columnOf, exprOf}

  // É lowercases to é (separator either way); K (U+212A, Kelvin) lowers
  // to ASCII 'k' — the trap case where a byte-level scan would diverge
  // from lower(); both paths here normalize through toLowerCase first.
  private val Alphabet = "abcz019 ABZ!.é_😀\t-K\nthe of is "

  private def textDf = {
    import spark.implicits._
    val rng = new scala.util.Random(20260815L)
    val docs = (0 until 4000).map { i =>
      if (i % 127 == 0) null
      else if (i % 61 == 0) "the the the of of is a1 a1 a1 a1" // heavy repeats
      else (0 until rng.nextInt(80))
        .map(_ => Alphabet(rng.nextInt(Alphabet.length))).mkString
    }
    docs.toDF("text")
  }

  private val Words = graft.functions.TextFunctions.Stopwords

  test("TokenStats (n_toks, sum_len, n_alpha, n_stop) equals the array forms") {
    val ts = columnOf(WordTokens(exprOf(col("text"))))
    val st = columnOf(TokenStats(exprOf(col("text")), Words))
    val diverged = textDf.select(
        st.getField("n_toks").as("k1"),
        size(ts).cast("long").as("b1"),
        st.getField("sum_len").as("k2"),
        columnOf(SumStrLengths(exprOf(ts))).as("b2"),
        st.getField("n_alpha").as("k3"),
        columnOf(CountAlphaTokens(exprOf(ts))).cast("long").as("b3"),
        st.getField("n_stop").as("k4"),
        columnOf(CountInSet(exprOf(ts), Words)).as("b4"))
      .filter(!(col("k1") <=> col("b1")) || !(col("k2") <=> col("b2")) ||
        !(col("k3") <=> col("b3")) || !(col("k4") <=> col("b4")))
      .count()
    assert(diverged == 0)
  }

  test("qualityScore value-identical to its pre-kernel composition") {
    val ts = columnOf(WordTokens(exprOf(col("text"))))
    val nChars = length(col("text")).cast("double")
    val nToks = greatest(size(ts).cast("double"), lit(1.0))
    val nStop = columnOf(CountInSet(exprOf(ts), Words)).cast("double")
    val punct = columnOf(CountPunctChars(exprOf(col("text")))).cast("double")
    val lenScore = least(nChars / lit(500.0), lit(1.0))
    val stopScore = least(nStop / nToks * lit(3.0), lit(1.0))
    val punctPenalty =
      least(punct / greatest(nChars, lit(1.0)) * lit(5.0), lit(1.0))
    val legacy = round(lenScore * lit(0.4) + stopScore * lit(0.4) +
      (lit(1.0) - punctPenalty) * lit(0.2), 6)
    val diverged = textDf.select(
        graft.functions.TextFunctions.qualityScore(col("text")).as("k"),
        legacy.as("b"))
      .filter(!(col("k") <=> col("b"))).count()
    assert(diverged == 0)
  }

  test("CountInSets equals one CountInSet per marker set") {
    val sets = Seq(Seq("the", "and", "of"), Seq("el", "la"), Seq("a1", "z"))
    val ts = columnOf(WordTokens(exprOf(col("text"))))
    val cs = columnOf(CountInSets(exprOf(col("text")), sets))
    val checks = sets.zipWithIndex.map { case (s, i) =>
      !(element_at(cs, i + 1) <=> columnOf(CountInSet(exprOf(ts), s)))
    }.reduce(_ || _)
    assert(textDf.filter(checks).count() == 0)
  }

  test("NgramStats equals size(WordTokens) + size(WordNgrams) for n=2,3") {
    for (n <- Seq(2, 3)) {
      val st = columnOf(NgramStats(exprOf(col("text")), n))
      val diverged = textDf.select(
          st.getField("n_toks").as("k1"),
          size(columnOf(WordTokens(exprOf(col("text"))))).cast("long").as("b1"),
          st.getField("n_distinct").as("k2"),
          size(columnOf(WordNgrams(exprOf(col("text")), n))).cast("long").as("b2"))
        .filter(!(col("k1") <=> col("b1")) || !(col("k2") <=> col("b2")))
        .count()
      assert(diverged == 0, s"n=$n")
    }
  }

  test("gopher struct signals equal the array signals") {
    val ts = columnOf(WordTokens(exprOf(col("text"))))
    val st = graft.queries.CorpusOps.gopherStats(col("text"))
    // n_toks parity on ALL rows (no division involved)
    val ntokDiverged = textDf.select(
        graft.queries.CorpusOps.gopherNWordsS(st).as("k"),
        graft.queries.CorpusOps.gopherNWords(ts).as("b"))
      .filter(!(col("k") <=> col("b"))).count()
    assert(ntokDiverged == 0)
    // ratio signals only where n_toks > 0: ANSI double-divide raises on
    // 0-token docs in BOTH the array and struct forms (pre-existing;
    // the documents corpus never produces a token-less doc)
    val diverged = textDf.filter(size(ts) > 0).select(
        graft.queries.CorpusOps.gopherNWordsS(st).as("k1"),
        graft.queries.CorpusOps.gopherNWords(ts).as("b1"),
        graft.queries.CorpusOps.gopherMeanWlenS(st).as("k2"),
        graft.queries.CorpusOps.gopherMeanWlen(ts).as("b2"),
        graft.queries.CorpusOps.gopherAlphaFracS(st).as("k3"),
        graft.queries.CorpusOps.gopherAlphaFrac(ts).as("b3"),
        graft.queries.CorpusOps.gopherNStopS(st).as("k4"),
        graft.queries.CorpusOps.gopherNStop(ts).as("b4"))
      .filter(!(col("k1") <=> col("b1")) || !(col("k2") <=> col("b2")) ||
        !(col("k3") <=> col("b3")) || !(col("k4") <=> col("b4")))
      .count()
    assert(diverged == 0)
  }

  test("NgramStats long-set path agrees with the string fallback (dense repeats)") {
    import spark.implicits._
    // hand-pinned: "a b a b a b" → 3-grams {aba, bab} → distinct 2
    val rows = Seq("a b a b a b", "x x x x", "one two", "", "q")
      .toDF("text")
      .select(columnOf(NgramStats(exprOf($"text"), 3)).as("st"))
      .select($"st.n_toks", $"st.n_distinct").collect()
    assert(rows(0).getLong(0) == 6L && rows(0).getLong(1) == 2L)
    assert(rows(1).getLong(0) == 4L && rows(1).getLong(1) == 1L)
    assert(rows(2).getLong(0) == 2L && rows(2).getLong(1) == 0L)
    assert(rows(3).getLong(0) == 0L && rows(3).getLong(1) == 0L)
    assert(rows(4).getLong(0) == 1L && rows(4).getLong(1) == 0L)
  }
}
