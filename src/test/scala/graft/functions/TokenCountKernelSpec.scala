package graft.functions

import java.util.regex.Pattern

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The count-only token kernels must agree exactly with the built-in
  * array-building forms they replace — java.util.regex is the engine
  * behind `split`/`regexp_extract_all`, so parity against Pattern
  * directly IS parity against the built-ins (the token_count gate row's
  * DuckDB oracle stays the independent cross-engine check). */
class TokenCountKernelSpec extends SparkSpec {

  private val ws = Pattern.compile("\\s+")
  private val sub = Pattern.compile("[a-z]{1,4}|[0-9]+|[^a-z0-9\\s]+")

  private def regexWsCount(s: String): Int =
    ws.split(s, -1).count(_.nonEmpty)
  private def regexSubCount(s: String): Int = {
    val m = sub.matcher(s); var c = 0; while (m.find()) c += 1; c
  }

  private def check(s: String): Unit = {
    assert(CountWsTokens.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)) == regexWsCount(s),
      s"ws count diverged on <$s>")
    assert(CountSubTokens.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)) == regexSubCount(s),
      s"sub count diverged on <$s>")
  }

  test("fixtures: runs, boundaries, greedy {1,4} splitting") {
    Seq(
      "", " ", "\t\n\f\r", "a", "a b", " a  b ", "abcd", "abcde",
      "abcdefgh", "abcdefghi",                    // 4+4, 4+4+1 pieces
      "a1b2", "12345", "1 2 3", "!!!", "a!b", "a !? 12b",
      "hello world", "x".repeat(17), "ab1cd!ef gh",
      "UPPER case MiXed",                          // A-Z fall in the 3rd class
      "éé café",                    // non-ASCII: 3rd class
      "aéb",                                  // letter runs broken by non-ASCII
      "tab\tsep\nline", "  leading", "trailing  ",
      "a5a5a5a5a5", "aaaa1111aaaa", "....a....",
      "\u0000x\u0000"                              // NUL is 3rd-class, not ws
    ).foreach(check)
  }

  test("25k-case random fuzz against java.util.regex") {
    val rng = new scala.util.Random(20260814L)
    val alphabet = "abcdefgz ABC 0189 \t\n!.,*é_--  "
    (0 until 25000).foreach { _ =>
      val len = rng.nextInt(50)
      check((0 until len).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    }
  }

  test("TermCounts equals explode(wordTokens) + groupBy counts") {
    import spark.implicits._
    val rng = new scala.util.Random(11L)
    val alphabet = "ab c 1 é ."
    val docs = (0 until 1500).map { i =>
      (i.toLong, (0 until rng.nextInt(60))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    val kernel = docs.select($"doc_id",
        explode(graft.GraftFunctions.columnOf(
          TermCounts(graft.GraftFunctions.exprOf($"text")))).as("tc"))
      .select($"doc_id", $"tc.tok".as("tok"), $"tc.tf".cast("long").as("tf"))
    val builtin = docs.select($"doc_id",
        explode(TextFunctions.wordTokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    assert(kernel.exceptAll(builtin).count() == 0)
    assert(builtin.exceptAll(kernel).count() == 0)
  }

  test("BigramCounts equals the zip-slice pair explode + groupBy counts") {
    import spark.implicits._
    val rng = new scala.util.Random(13L)
    val alphabet = "ab c 1 é ."
    val docs = (0 until 1500).map { i =>
      (i.toLong, (0 until rng.nextInt(40))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    val kernel = docs.select($"doc_id",
        explode(graft.GraftFunctions.columnOf(
          BigramCounts(graft.GraftFunctions.exprOf($"text")))).as("b"))
      .select($"doc_id", $"b.w1".as("w1"), $"b.w2".as("w2"),
        $"b.cnt".cast("long").as("c"))
    val builtin = docs
      .select($"doc_id", TextFunctions.wordTokens($"text").as("ts"))
      .filter(size($"ts") >= 2)
      .select($"doc_id", explode(arrays_zip(
        slice($"ts", lit(1), size($"ts") - 1).as("w1"),
        slice($"ts", lit(2), size($"ts") - 1).as("w2"))).as("bg"))
      .groupBy($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
      .agg(count(lit(1)).as("c"))
    assert(kernel.exceptAll(builtin).count() == 0)
    assert(builtin.exceptAll(kernel).count() == 0)
  }

  test("DropCoveredTokens equals the exploded-positions array_contains form") {
    import spark.implicits._
    val w = 3
    val rng = new scala.util.Random(29L)
    // tokens + removed-window starts, incl. out-of-range and overlapping
    // starts and the empty-starts row the left-join coalesce produces
    // n >= 1: the reference HOF's sequence(1, size(ts)) is descending
    // for empty arrays and errors in element_at — empty-ts behavior is
    // pinned by the kernel edge assertions below instead
    val rows = (0 until 800).map { i =>
      val n = 1 + rng.nextInt(29)
      val ts = (0 until n).map(j => s"t$j").toArray
      val starts = (0 until rng.nextInt(6))
        .map(_ => rng.nextInt(n + w + 2) - 1).toArray
      (i.toLong, ts, starts)
    }
    val df = rows.toDF("doc_id", "ts", "rem")
    val kernel = df.select($"doc_id",
      graft.GraftFunctions.columnOf(DropCoveredTokens(
        graft.GraftFunctions.exprOf($"ts"),
        graft.GraftFunctions.exprOf($"rem"), w)).as("kt"))
    val builtin = df.select($"doc_id", expr(
      s"""filter(transform(sequence(1, size(ts)),
            i -> IF(NOT exists(rem, p -> i >= p AND i <= p + ${w - 1}),
                    element_at(ts, i), NULL)),
          x -> x IS NOT NULL)""").as("kt"))
    assert(kernel.exceptAll(builtin).count() == 0)
    assert(builtin.exceptAll(kernel).count() == 0)
    // empty tokens + empty starts stay empty, full coverage drops all
    val edge = Seq((1L, Array.empty[String], Array.empty[Int]),
      (2L, Array("a", "b", "c"), Array(1))).toDF("doc_id", "ts", "rem")
    val got = edge.select(graft.GraftFunctions.columnOf(DropCoveredTokens(
        graft.GraftFunctions.exprOf($"ts"),
        graft.GraftFunctions.exprOf($"rem"), 3)).as("kt"))
      .orderBy("kt").collect().map(_.getSeq[String](0))
    assert(got(0).isEmpty && got(1).isEmpty)
  }

  test("ChunkSpans equals the explode(sequence)+slice+array_join form") {
    import spark.implicits._
    val (c, s) = (5, 3)
    val rng = new scala.util.Random(17L)
    val alphabet = "ab c 1 . é"
    val docs = (0 until 1200).map { i =>
      (i.toLong, (0 until rng.nextInt(60))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    val kernel = docs.select($"doc_id",
        explode(graft.GraftFunctions.columnOf(ChunkSpans(
          graft.GraftFunctions.exprOf($"text"), c, s))).as("ch"))
      .select($"doc_id", $"ch.chunk_id", $"ch.chunk_start",
        $"ch.n_tok", $"ch.txt")
    val builtin = docs
      .select($"doc_id", TextFunctions.wordTokens($"text").as("ts"))
      .filter(size($"ts") > 0)
      .select($"doc_id", $"ts",
        explode(sequence(lit(1), size($"ts"), lit(s))).as("start"))
      .select($"doc_id",
        ((($"start" - 1) / s) + 1).cast("long").as("chunk_id"),
        $"start".cast("long").as("chunk_start"),
        size(slice($"ts", $"start", lit(c))).cast("long").as("n_tok"),
        array_join(slice($"ts", $"start", lit(c)), " ").as("txt"))
    assert(kernel.exceptAll(builtin).count() == 0)
    assert(builtin.exceptAll(kernel).count() == 0)
  }

  test("ContainsAllTokens equals the array_contains conjunction") {
    import spark.implicits._
    val rng = new scala.util.Random(23L)
    val alphabet = "ab c 1 . é"
    val docs = (0 until 2000).map { i =>
      (i.toLong, (0 until rng.nextInt(40))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    // queries with hits, misses, multi-char terms, and repeats
    for (q <- Seq("a", "ab c", "c 1 c", "zz", "ab zz", "")) {
      val terms = q.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val kernel = docs.filter(graft.GraftFunctions.columnOf(
        ContainsAllTokens(graft.GraftFunctions.exprOf($"text"),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(terms))))
      val builtin = docs.filter(terms
        .map(t => array_contains(TextFunctions.wordTokens($"text"), t))
        .reduceOption(_ && _).getOrElse(lit(true)))
      assert(kernel.exceptAll(builtin).count() == 0, s"query '$q'")
      assert(builtin.exceptAll(kernel).count() == 0, s"query '$q'")
    }
  }

  test("DataFrame parity: kernels equal built-in compositions incl. nulls") {
    import spark.implicits._
    val rng = new scala.util.Random(5L)
    val alphabet = "abcz 019 \t!.é"
    val docs = (0 until 2000).map { i =>
      if (i % 101 == 0) null
      else (0 until rng.nextInt(40))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }
    val df = docs.toDF("t").select(
      TextFunctions.tokenCountWs($"t").as("k_ws"),
      size(filter(split($"t", "\\s+"), x => length(x) > 0)).as("b_ws"),
      TextFunctions.tokenCountSub(lower($"t")).as("k_sub"),
      size(regexp_extract_all(lower($"t"),
        lit("[a-z]{1,4}|[0-9]+|[^a-z0-9\\s]+"), lit(0))).as("b_sub"))
    assert(df.filter(!($"k_ws" <=> $"b_ws") || !($"k_sub" <=> $"b_sub"))
      .count() == 0)
  }
}
