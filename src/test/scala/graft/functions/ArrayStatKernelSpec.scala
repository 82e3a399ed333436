package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The array-stat kernels must agree exactly with the built-in
  * compositions they replace (interpreted HOF lambdas / per-token rlike /
  * per-row regexp_replace) — the gopher_quality and quality_score gate
  * rows keep their DuckDB oracles as the independent cross-engine check. */
class ArrayStatKernelSpec extends SparkSpec {

  import graft.GraftFunctions.{columnOf, exprOf}

  private def tokensDf = {
    import spark.implicits._
    val rng = new scala.util.Random(20260814L)
    val alphabet = "abcz019 ABZ!.é_😀\t-"
    val docs = (0 until 3000).map { i =>
      if (i % 127 == 0) null
      else (0 until rng.nextInt(60))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }
    docs.toDF("text")
      .withColumn("ts", columnOf(WordTokens(exprOf(col("text")))))
  }

  test("SumStrLengths equals the aggregate-lambda char sum") {
    val diverged = tokensDf.select(
        columnOf(SumStrLengths(exprOf(col("ts")))).as("k"),
        aggregate(col("ts"), lit(0L), (acc, t) => acc + length(t)).as("b"))
      .filter(!(col("k") <=> col("b"))).count()
    assert(diverged == 0)
  }

  test("SumStrLengths: a null element poisons the sum to NULL, like aggregate") {
    import spark.implicits._
    val df = Seq(
      (1, Seq[String]("ab", "c")),
      (2, Seq[String]("ab", null)),
      (3, Seq[String](null)),
      (4, Seq.empty[String])
    ).toDF("id", "ts")
    val out = df.select($"id",
        columnOf(SumStrLengths(exprOf($"ts"))).as("k"),
        aggregate($"ts", lit(0L), (acc, t) => acc + length(t)).as("b"))
      .orderBy($"id").collect()
    assert(out.forall(r => r.isNullAt(1) == r.isNullAt(2) &&
      (r.isNullAt(1) || r.getLong(1) == r.getLong(2))))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1)) // null element → NULL
    assert(out(0).getLong(1) == 3L && out(3).getLong(1) == 0L)
  }

  test("CountAlphaTokens equals the rlike filter size") {
    // WordTokens yields lowercase alnum tokens; also test adversarial
    // arrays with uppercase/unicode/empty elements AND trailing line
    // terminators ($ matches before a single final terminator)
    import spark.implicits._
    val arrays = Seq(
      Seq("abc", "a1b", "xyz", "", "ABC", "é", "aé", "z"),
      Seq.empty[String],
      Seq("😀", "aaaa", "0", "az"),
      Seq("abc\n", "abc\r", "abc\r\n", "abc\n\n", "abc\nx", "\n",
        "abc", "abc ", "abc ", "abc\r\r", "a\nb")
    ).toDF("ts")
    val all = tokensDf.select(col("ts")).unionByName(arrays)
    val diverged = all.select(
        columnOf(CountAlphaTokens(exprOf(col("ts")))).as("k"),
        size(filter(col("ts"), t => t.rlike("^[a-z]+$"))).as("b"))
      .filter(!(col("k") <=> col("b"))).count()
    assert(diverged == 0)
  }

  test("CountPunctChars equals length(regexp_replace(...)) incl. unicode") {
    val diverged = tokensDf.select(
        columnOf(CountPunctChars(exprOf(col("text")))).as("k"),
        length(regexp_replace(col("text"), "[a-zA-Z0-9\\s]", "")).as("b"))
      .filter(!(col("k") <=> col("b"))).count()
    assert(diverged == 0)
  }

  test("gopher signals unchanged by the kernel swap (pinned values)") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over a lazy dog and then it sits on " +
        "the mat for a while watching the stars in the sky at night",
      "x1 y2 z3 !!!",
      "short"
    ).toDF("text")
    val ts = columnOf(WordTokens(exprOf($"text")))
    val rows = docs.select(
        graft.queries.CorpusOps.gopherNWords(ts).as("n"),
        graft.queries.CorpusOps.gopherMeanWlen(ts).as("mw"),
        graft.queries.CorpusOps.gopherAlphaFrac(ts).as("af"))
      .collect()
    assert(rows(0).getDouble(2) == 1.0)  // all alphabetic
    assert(rows(1).getLong(0) == 3L)     // x1 y2 z3 ('!!!' splits away)
    assert(rows(1).getDouble(2) == 0.0)  // none all-alpha
    assert(rows(1).getDouble(1) == 2.0)  // 6 chars / 3 tokens
    assert(rows(2).getLong(0) == 1L && rows(2).getDouble(1) == 5.0)
  }
}
