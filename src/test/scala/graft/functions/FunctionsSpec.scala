package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).collect().head.get(0)
  }

  test("template masks UUIDs, IPv4s and integers (P1)") {
    import spark.implicits._
    val in = Seq(
      "req 123 from 10.0.0.1 trace 550e8400-e29b-41d4-a716-446655440000 done",
      "no params here").toDF("b")
    val out = in.select(template($"b")).as[String].collect()
    assert(out(0) == "req * from * trace * done")
    assert(out(1) == "no params here")
  }

  test("template masking is idempotent (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    val samples = (1 to 50).map(_ =>
      s"user ${rnd.nextInt(9999)} at 192.168.${rnd.nextInt(255)}.${rnd.nextInt(255)} said ${rnd.alphanumeric.take(8).mkString}")
    val df = samples.toDF("b")
    val once = df.select(template($"b").as("t"))
    val twice = once.select(template($"t"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("rhythm hash shape and stability (P2)") {
    import spark.implicits._
    val h = Seq(("tmpl *", "svc", "ERROR")).toDF("t", "s", "v")
      .select(rhythmHash($"t", $"s", $"v")).as[String].collect().head
    assert(h.matches("[0-9a-f]{16}:[0-9a-f]{16}"))
    // same template, different service:severity -> different right half, same left
    val h2 = Seq(("tmpl *", "svc2", "ERROR")).toDF("t", "s", "v")
      .select(rhythmHash($"t", $"s", $"v")).as[String].collect().head
    assert(h.take(16) == h2.take(16) && h.drop(17) != h2.drop(17))
  }

  test("matchText requires ALL query tokens (P7)") {
    import spark.implicits._
    val df = Seq("Payment Declined: card expired", "payment ok").toDF("b")
    assert(df.filter(matchText($"b", "payment declined")).count() == 1)
    assert(df.filter(matchText($"b", "payment")).count() == 2)
    assert(df.filter(matchText($"b", "")).count() == 2)
    // zero-term query matches NULL text too (vacuous truth, not kernel
    // null-propagation — ADVICE r10): the row must survive the filter
    val withNull = Seq(Some("payment ok"), None).toDF("b")
    assert(withNull.filter(matchText($"b", "")).count() == 2)
    assert(withNull.filter(matchText($"b", "...")).count() == 2)
    assert(withNull.filter(matchText($"b", "payment")).count() == 1)
  }

  test("fingerprint is whitespace/punct/case-insensitive") {
    import spark.implicits._
    val fps = Seq("Hello, World!", "hello world", "HELLO  WORLD").toDF("t")
      .select(fingerprint($"t")).as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("quality score stays in [0,1] and ranks prose above noise") {
    import spark.implicits._
    val prose = "the quick brown fox jumps over the lazy dog and runs to the hills " * 8
    val noise = "@@@@ #### !!!! %%%% ^^^^ &&&& "
    val rows = Seq(prose, noise).toDF("t")
      .select(qualityScore($"t")).as[Double].collect()
    assert(rows.forall(s => s >= 0.0 && s <= 1.0))
    assert(rows(0) > rows(1))
  }

  test("dot/cosine/norm agree with scalar math (V1)") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 1.0f))).toDF("a", "b")
    val d = df.select(dot($"a", $"b")).as[Double].collect().head
    assert(d == 4.0)
    val c = df.select(cosine($"a", $"b")).as[Double].collect().head
    assert(math.abs(c - 4.0 / (3.0 * math.sqrt(5.0))) < 1e-9)
    val z = Seq((Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
      .select(cosine($"a", $"b")).as[Double].collect().head
    assert(z == 0.0, "zero vector -> declared score 0.0")
  }

  test("sign-bit packing + hamming/bitDot (V2)") {
    import spark.implicits._
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val bits = Seq(Tuple1(v)).toDF("v")
      .select(packSignBits63($"v")).as[Long].collect().head
    val expected = (0 until 63).foldLeft(0L)((acc, i) =>
      if (i % 3 == 0) acc | (1L << i) else acc)
    assert(bits == expected)
    val hd = Seq((bits, expected ^ 7L)).toDF("a", "b")
      .select(hamming($"a", $"b")).as[Int].collect().head
    assert(hd == 3)
    assert(one(bitDot(lit(12L), lit(10L))) == 1) // 1100 & 1010 = 1000
  }

  test("shingles produce distinct fixed-length substrings") {
    import spark.implicits._
    val sh = Seq("abcab").toDF("t").select(shingles($"t", 3)).as[Seq[String]]
      .collect().head
    assert(sh.toSet == Set("abc", "bca", "cab"))
    val short = Seq("ab").toDF("t").select(shingles($"t", 3)).as[Seq[String]]
      .collect().head
    assert(short.isEmpty)
  }
}
