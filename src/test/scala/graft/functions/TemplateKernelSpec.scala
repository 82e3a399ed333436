package graft.functions

import java.util.regex.Pattern

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native template kernel must be BYTE-IDENTICAL to the three-pass
  * regex pipeline it replaces — java.util.regex is the engine behind
  * Spark's `regexp_replace`, so parity against Pattern directly IS parity
  * against the built-in composition (and the gate row's DuckDB RE2 oracle
  * remains the independent cross-engine check). */
class TemplateKernelSpec extends SparkSpec {

  private val uuid = Pattern.compile(TextFunctions.UuidRe)
  private val ipv4 = Pattern.compile(TextFunctions.Ipv4Re)
  private val int = Pattern.compile(TextFunctions.IntRe)

  private def regexTemplate(s: String): String =
    int.matcher(
      ipv4.matcher(
        uuid.matcher(s).replaceAll("*")).replaceAll("*")).replaceAll("*")

  private def check(s: String): Unit = {
    val kernel = Template.extractString(s)
    val regex = regexTemplate(s)
    assert(kernel == regex,
      s"template diverged on <$s>: kernel=<$kernel> regex=<$regex>")
  }

  test("adversarial fixtures: boundary and backtracking corners") {
    Seq(
      "", "no params here", "* already starred *",
      // UUID corners
      "id deadbeef-dead-beef-dead-beefdeadbeef done",
      "DEADBEEF-DEAD-BEEF-DEAD-BEEFDEADBEEF",          // uppercase: no match
      "xdeadbeef-dead-beef-dead-beefdeadbeef",         // word-embedded: no \b
      "deadbeef-dead-beef-dead-beefdeadbeefX",         // trailing word char
      "deadbeef-dead-beef-dead-beefdeadbee",           // 11-char tail
      "deadbeef-dead-beef-dead-beefdeadbeef5",         // hex+digit tail
      "00000000-0000-0000-0000-000000000000",          // all-digit UUID (not int!)
      "g0000000-0000-0000-0000-000000000000",          // non-hex first
      "-deadbeef-dead-beef-dead-beefdeadbeef-",        // dashes adjacent
      "a deadbeef-dead-beef-dead-beefdeadbeef.b",      // punct neighbors
      "deadbeef-dead-beef-dead-beefdeadbeef deadbeef-dead-beef-dead-beefdeadbeef",
      // IPv4 corners
      "10.0.0.1", "1.2.3.4.5.6.7.8", "1234.1.2.3", "1.2.3.4567",
      "9.1.2.3.4", "1.2.3", "1..2.3.4", "1.2.3.4a", "a1.2.3.4",
      "255.255.255.255 and 0.0.0.0", "999.999.999.999",
      "12.34.56.78abc", "version 1.2.33 build", "..1.2.3.4..",
      "1.2.3.4.1.2.3.4",
      // int corners
      "x 123 y", "abc123", "123abc", "a_1 2_b", "1", "12345678901234567890",
      "1 2 3", "-42", "3.14", "int 7, float 7.5, id 7x",
      // pass interactions: UUID hex leaves no digits behind; '*' creates
      // boundaries for later passes
      "deadbeef-dead-beef-dead-beefdeadbeef123",       // no UUID (\b fails); int 123? no (\b fails after f)
      "123deadbeef-dead-beef-dead-beefdeadbeef",
      "11111111-2222-3333-4444-555555555555",          // digit UUID consumed before int pass
      "ip 1.2.3.4 uuid deadbeef-dead-beef-dead-beefdeadbeef n 42"
    ).foreach(check)
  }

  test("Unicode \\b fixtures: Java's boundary is not ASCII") {
    Seq(
      "é123",                      // é1 — no boundary: é is a letter
      "123é",
      "é1.2.3.4", "1.2.3.4é",
      "٣123",                      // Arabic-Indic digit: word char
      "³123",                      // superscript 3: NOT letterOrDigit
      "́123",                      // combining mark: NOT a word char
      "😀123",                // emoji: non-word → boundary
      "𝕒123",                // 𝕒 MATHEMATICAL letter (surrogate pair): word
      "édeadbeef-dead-beef-dead-beefdeadbeef",
      "é 42 ٣ 7 _8 ^9",
      // the JDK Bound combining-mark rule (measured): a non-spacing
      // mark is word-side iff its base (walking back over marks) is a
      // letter/digit — '_' does NOT count as a base
      "1́25", "́25", "x́25", ".́25", "_́25",
      "25́", "25́x", "25́.", "x́́25",
      "2́5", "1.2.3.4́", "9́.2.3.4",
      // Mc / Me mark classes get NO special treatment
      "1ा25", "25ा", "1⃠25", "25⃠",
      "deadbeef-dead-beef-dead-beefdeadbeef́"
    ).foreach(check)
  }

  test("25k-case random fuzz against java.util.regex") {
    val rng = new scala.util.Random(20260814L)
    val alphabet = "0123456789abcdef-.. xX_*5é٣³́"
    (0 until 25000).foreach { _ =>
      val len = rng.nextInt(60)
      check((0 until len).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    }
    // UUID-dense fuzz: mutate valid UUIDs embedded in noise
    val base = "deadbeef-dead-beef-dead-beefdeadbeef"
    (0 until 5000).foreach { _ =>
      val b = new StringBuilder(base)
      (0 until rng.nextInt(3)).foreach { _ =>
        b.setCharAt(rng.nextInt(b.length), alphabet(rng.nextInt(alphabet.length)))
      }
      val pre = alphabet(rng.nextInt(alphabet.length))
      val post = alphabet(rng.nextInt(alphabet.length))
      check(s"$pre$b$post 1.2.3.4 77")
    }
    // IPv4-dense fuzz
    (0 until 5000).foreach { _ =>
      val parts = (0 until 4 + rng.nextInt(2))
        .map(_ => rng.nextInt(11000).toString.take(1 + rng.nextInt(4)))
      val sep = if (rng.nextInt(10) == 0) ".." else "."
      val pre = alphabet(rng.nextInt(alphabet.length))
      check(s"$pre ${parts.mkString(sep)} tail")
    }
  }

  test("DataFrame parity: kernel column equals built-in composition") {
    import spark.implicits._
    val rng = new scala.util.Random(99L)
    val alphabet = "0123456789abcdef-. x"
    val docs = (0 until 2000).map { i =>
      if (i % 131 == 0) null
      else (0 until rng.nextInt(50))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }
    val df = docs.toDF("b").select(
      TextFunctions.template($"b").as("kernel"),
      TextFunctions.templateRegex($"b").as("builtin"))
    assert(df.filter(!($"kernel" <=> $"builtin")).count() == 0)
  }
}
