package graft.functions

import graft.{GraftFunctions, SparkSpec}
import graft.functions.TextFunctions.{shingles, wordTokens}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity proofs: each native kernel computes EXACTLY the value of the
  * built-in higher-order-function pipeline it replaced (the DuckDB oracle
  * mirrors are generated from the HOF math, so kernel==HOF ⇒ kernel==oracle). */
class ArrayHashExprsSpec extends SparkSpec {

  private def texts = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Seq("spark", "query", "merge", "scan", "sort", "filter", "12",
      "join", "table", "row", "group", "window", "the", "of", "a")
    ((1 to 60).map(_ =>
      (1 to rnd.nextInt(60) + 1).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")) ++ Seq("", "ab", "  spaced   out  ", "ALLCAPS TEXT"))
      .toDF("text")
  }

  private def collectCol[T](df: org.apache.spark.sql.DataFrame, c: Column): Seq[T] =
    df.select(c.as("v")).collect().toSeq.map(_.getAs[T]("v"))

  private def collectSeqs[T](df: org.apache.spark.sql.DataFrame, c: Column): Seq[Seq[T]] =
    df.select(c.as("v")).collect().toSeq.map(_.getSeq[T](0).toList)

  test("ShingleHashes == transform(shingles)->md5->conv") {
    val hof = transform(shingles(col("text"), 5),
      x => conv(substring(md5(x), 1, 7), 16, 10).cast("long"))
    val native = GraftFunctions.columnOf(
      ShingleHashes(GraftFunctions.exprOf(col("text")), 5, 7))
    val a = collectSeqs[Long](texts, hof)
    val b = collectSeqs[Long](texts, native)
    assert(a == b)
    // and the 15-hex-char variant used by simhash_dedup
    val hof15 = transform(shingles(col("text"), 4),
      x => conv(substring(md5(x), 1, 15), 16, 10).cast("long"))
    val native15 = GraftFunctions.columnOf(
      ShingleHashes(GraftFunctions.exprOf(col("text")), 4, 15))
    assert(collectSeqs[Long](texts, hof15) == collectSeqs[Long](texts, native15))
  }

  test("SimhashVote == 60 per-bit filter majority votes") {
    val hs = GraftFunctions.columnOf(
      ShingleHashes(GraftFunctions.exprOf(col("text")), 4, 15))
    val df = texts.select(hs.as("hs"), size(hs).as("n"))
    val hofSig = (0 until 60).map { b =>
      when(size(filter(col("hs"),
        h => shiftright(h, b).bitwiseAND(lit(1L)) === 1L)) * 2 > col("n"),
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val native = GraftFunctions.columnOf(
      SimhashVote(GraftFunctions.exprOf(col("hs")), 60))
    assert(collectCol[Long](df, hofSig) == collectCol[Long](df, native))
  }

  test("AffineMinhash == array_min(transform) per permutation") {
    val rng = new scala.util.Random(7)
    val a = Seq.fill(16)(1L + rng.nextInt(Int.MaxValue - 1).toLong)
    val b = Seq.fill(16)(rng.nextInt(Int.MaxValue).toLong)
    val p = 2147483647L
    val hs = GraftFunctions.columnOf(
      ShingleHashes(GraftFunctions.exprOf(col("text")), 5, 7))
    val df = texts.filter(length(col("text")) >= 5).select(hs.as("hs"))
    val native = GraftFunctions.columnOf(
      AffineMinhash(GraftFunctions.exprOf(col("hs")), a, b, p))
    val nativeVals = collectSeqs[Long](df, native)
    (0 until 16).foreach { j =>
      val hof = array_min(transform(col("hs"), h => (lit(a(j)) * h + lit(b(j))) % p))
      val hofVals = collectCol[Long](df, hof)
      assert(nativeVals.map(_(j)) == hofVals, s"permutation $j")
    }
  }

  test("WordNgrams == array_distinct(transform(sequence)) pipeline") {
    val ts = wordTokens(col("text"))
    val n = 4
    val hof = array_distinct(filter(
      transform(sequence(lit(1), greatest(size(ts) - (n - 1), lit(1))),
        i => concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*)),
      g => size(split(g, " ")) === n))
    val native = GraftFunctions.columnOf(
      WordNgrams(GraftFunctions.exprOf(col("text")), n))
    // the HOF form errors on docs with < n tokens under ANSI element_at;
    // the native kernel fixes that edge by returning [] — compare on the
    // well-defined domain and pin the short-doc behavior separately
    val longEnough = texts.filter(size(ts) >= n)
    assert(collectSeqs[String](longEnough, hof) ==
      collectSeqs[String](longEnough, native))
    val short = texts.filter(size(ts) < n)
    assert(collectSeqs[String](short, native).forall(_.isEmpty))
  }

  test("AllWordNgrams == transform(sequence)->array_join pipeline, positions kept") {
    val ts = wordTokens(col("text"))
    val n = 4
    val hof = transform(sequence(lit(1), size(ts) - (n - 1)),
      i => array_join(slice(ts, i, lit(n)), " "))
    val native = GraftFunctions.columnOf(
      AllWordNgrams(GraftFunctions.exprOf(col("text")), n))
    val longEnough = texts.filter(size(ts) >= n)
    assert(collectSeqs[String](longEnough, hof) ==
      collectSeqs[String](longEnough, native))
    val short = texts.filter(size(ts) < n)
    assert(collectSeqs[String](short, native).forall(_.isEmpty))
    // sanity: index i IS the window at token position i (duplicates kept)
    val grams = collectSeqs[String](longEnough, native)
    val toks = collectSeqs[String](longEnough, ts)
    grams.zip(toks).foreach { case (gs, tk) =>
      assert(gs.length == tk.length - n + 1)
      gs.zipWithIndex.foreach { case (g, i) =>
        assert(g == tk.slice(i, i + n).mkString(" "))
      }
    }
  }
}
