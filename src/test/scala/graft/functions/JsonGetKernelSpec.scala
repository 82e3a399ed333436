package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** The native JSON kernel must be BYTE-IDENTICAL to
  * `get_json_object(col, "$.k")` — parity is checked against Spark's own
  * GetJsonObject expression (the engine behind the built-in), so every
  * Jackson quirk the kernel reproduces is asserted against the source of
  * truth, not against a transcription of it. */
class JsonGetKernelSpec extends SparkSpec {

  private def builtin(s: String): String = {
    val r = GetJsonObject(
      Literal(UTF8String.fromString(s), StringType),
      Literal(UTF8String.fromString("$.k"), StringType)).eval(null)
    if (r == null) null else r.toString
  }

  private def check(raw: String): Unit = {
    // real columns arrive as UTF8String, which cannot carry mispaired
    // surrogates — normalize the generated doc the same way so both sides
    // see identical bytes
    val s = UTF8String.fromString(raw).toString
    val expected = builtin(s)
    val actual = JsonGet.getString(s, "k")
    assert(actual == expected,
      s"diverged on <$s>: kernel=<$actual> builtin=<$expected>")
  }

  test("pinned edge-case table (measured Spark 4.1.2 semantics)") {
    val cases = Seq(
      // basics, duplicates, null transparency
      """{"k":1}""" -> "1",
      """{"k":null}""" -> null,
      """{"k":1,"k":2}""" -> "1",
      """{"k":null,"k":7}""" -> "7",
      """{"k":7,"k":null}""" -> "7",
      """{"k":null,"k":null}""" -> null,
      """{"a":[{"k":1}],"k":3}""" -> "3",
      """{"a":{"k":9}}""" -> null,
      """{"notk":1}""" -> null,
      """{"kk":1}""" -> null,
      """{"k":""}""" -> "",
      // string unescaping, quote styles
      """{"k":"a\"b"}""" -> "a\"b",
      """{"k":"tab\there"}""" -> "tab\there",
      """{"k":"a/b\/c"}""" -> "a/b/c",
      """{'k':1}""" -> "1",
      """{'k':'a"b'}""" -> "a\"b",
      """{"k":'it\'s'}""" -> "it's",
      """{"k":"a\'b"}""" -> "a'b",
      """{"\u006b":5}""" -> "5",
      // numbers: ints verbatim, floats through Double.toString
      """{"k":-0}""" -> "0",
      """{"k":-0.0}""" -> "-0.0",
      """{"k":1.0}""" -> "1.0",
      """{"k":0.1000}""" -> "0.1",
      """{"k": 1.5e3}""" -> "1500.0",
      """{"k":1E2}""" -> "100.0",
      """{"k":1e21}""" -> "1.0E21",
      """{"k":2.5e-10}""" -> "2.5E-10",
      """{"k":1e999}""" -> "\"Infinity\"",
      """{"k":-1e999}""" -> "\"-Infinity\"",
      """{"k":123456789012345678901234567890}""" -> "123456789012345678901234567890",
      // nested re-serialization: compact, floats re-rendered, escapes
      """{"k":[1, 2, {"x": 3}]}""" -> """[1,2,{"x":3}]""",
      """{"k":[1.50, 2]}""" -> "[1.5,2]",
      """{"k":{"a": 1, "b":[true,false]}}""" -> """{"a":1,"b":[true,false]}""",
      """{"k":[1e999]}""" -> """["Infinity"]""",
      """{"k":[]}""" -> "[]",
      """{"k":{}}""" -> "{}",
      """{"k":[null]}""" -> "[null]",
      // whole-root validation, trailing garbage
      """  { "k" : 42 }  """ -> "42",
      """{"k":1} trailing""" -> "1",
      """{"k":"x"}junk{""" -> "x",
      """{"a":"\q","k":1}""" -> null,
      """{"k":1""" -> null,
      """{"k":1,}""" -> null,
      """{"a":1 "k":2}""" -> null,
      """{"k":[1,]}""" -> null,
      """{"k":[,1]}""" -> null,
      """{"k":01}""" -> null,
      """{"k":5.}""" -> null,
      """{"k":.5}""" -> null,
      """{"k":+5}""" -> null,
      """{"k":1e}""" -> null,
      """{"k":nul}""" -> null,
      """{"k":TRUE}""" -> null,
      """{k:1}""" -> null,
      """{"k" "v"}""" -> null,
      """{"k":}""" -> null,
      """{,"k":1}""" -> null,
      """[1,2]""" -> null,
      """5""" -> null,
      "\"str\"" -> null,
      "" -> null
    )
    cases.foreach { case (in, expected) =>
      // the table IS the measured behavior; assert the builtin still agrees,
      // then the kernel against both
      assert(builtin(in) == expected, s"builtin drifted on <$in>")
      assert(JsonGet.getString(in, "k") == expected, s"kernel wrong on <$in>")
    }
  }

  test("non-ASCII: raw BMP kept, surrogates escaped uppercase in nested") {
    check("{\"k\":[\"\u00e9\"]}")          // nested raw BMP non-ASCII: raw
    check("{\"k\":\"\u00e9\"}")            // top-level: unescaped
    check("{\"k\":[\"\\u00e9\"]}")         // escaped BMP: unescaped to raw
    check("{\"k\":[\"\ud83d\ude00\"]}")    // raw supplementary: \uD83D\uDE00
    check("{\"k\":[\"\\ud83d\\ude00\"]}")  // escaped supplementary
    check("{\"k\":[\"q\\u001fw\"]}")       // control: \u001F uppercase hex
    check("{\"k\":[\"a\\u0001b\"]}")
    check("{\"k\":{\"n\\tm\":1}}")         // short escapes kept in names
    check("{\"k\":[\"\u007f\"]}")          // DEL not escaped
  }

  test("mispaired surrogates: top-level capture nulls, elsewhere survives") {
    check("{\"a\":\"\\ude00\",\"k\":1}")       // skipped sibling: fine
    check("{\"ke\\ude00y\":1,\"k\":2}")        // name: fine
    check("{\"k\":[\"\\ude00\"]}")             // nested: escaped on write
    check("{\"k\":[\"\\ud83dx\"]}")
    check("{\"k\":{\"\\ud83d\":1}}")
    check("{\"k\":\"\\ude00\"}")               // top-level: NULL
    check("{\"k\":\"\\ud83dx\"}")
    check("{\"k\":\"\\ud83d\"}")
    check("{\"k\":\"\\ud83d\\ud83d\\ude00ok\"}")
    assert(JsonGet.getString("{\"k\":\"\\ude00\"}", "k") == null)
    assert(JsonGet.getString("{\"a\":\"\\ude00\",\"k\":1}", "k") == "1")
  }

  test("Jackson stream constraints: nesting depth and number length") {
    val deep = "{\"k\":" + ("[" * 999) + "1" + ("]" * 999) + "}"
    val deeper = "{\"k\":" + ("[" * 1001) + "1" + ("]" * 1001) + "}"
    val longnum = "{\"k\":" + "1" * 999 + "}"
    val longernum = "{\"k\":" + "1" * 1001 + "}"
    Seq(deep, deeper, longnum, longernum).foreach(check)
    assert(JsonGet.getString(deeper, "k") == null)
    assert(JsonGet.getString(longernum, "k") == null)
  }

  // ---- structured random fuzz ------------------------------------------

  private def genString(rng: scala.util.Random): String = {
    val q = if (rng.nextInt(4) == 0) '\'' else '"'
    val sb = new StringBuilder
    sb.append(q)
    (0 until rng.nextInt(8)).foreach { _ =>
      rng.nextInt(14) match {
        case 0 => sb.append("\\n")
        case 1 => sb.append("\\t")
        case 2 => sb.append("\\\\")
        case 3 => sb.append("\\\"")
        case 4 => sb.append("\\u0041")
        case 5 => sb.append("\\ud83d\\ude00")
        case 6 => sb.append("\\u001f")
        case 7 => sb.append('\u00e9')
        case 8 => sb.append("\ud83d\ude00")
        case 9 => sb.append('\u0007') // raw control char (allowed)
        case 10 => sb.append(if (q == '"') '\'' else 'x')
        case 11 => sb.append("\\/")
        case _ => sb.append(('a' + rng.nextInt(26)).toChar)
      }
    }
    sb.append(q)
    sb.toString
  }

  private def genNumber(rng: scala.util.Random): String = rng.nextInt(8) match {
    case 0 => rng.nextInt(200).toString
    case 1 => "-" + rng.nextInt(200)
    case 2 => "-0"
    case 3 => s"${rng.nextInt(100)}.${rng.nextInt(1000)}"
    case 4 => s"${rng.nextInt(10)}e${rng.nextInt(25)}"
    case 5 => s"-${rng.nextInt(10)}.${rng.nextInt(100)}E-${rng.nextInt(20)}"
    case 6 => "1e999"
    case _ => rng.nextLong().toString + rng.nextInt(1000000)
  }

  private def genValue(rng: scala.util.Random, depth: Int): String =
    rng.nextInt(if (depth < 3) 10 else 6) match {
      case 0 | 1 => genNumber(rng)
      case 2 => genString(rng)
      case 3 => "true"
      case 4 => "false"
      case 5 => "null"
      case 6 | 7 =>
        (0 until rng.nextInt(3)).map(_ => genValue(rng, depth + 1))
          .mkString("[", ",", "]")
      case _ =>
        (0 until rng.nextInt(3))
          .map(_ => genName(rng) + ":" + genValue(rng, depth + 1))
          .mkString("{", ",", "}")
    }

  private def genName(rng: scala.util.Random): String = rng.nextInt(8) match {
    case 0 | 1 | 2 => "\"k\""
    case 3 => "'k'"
    case 4 => "\"\\u006b\"" // escaped 'k' — must still match
    case 5 => "\"kk\""
    case 6 => "\"a\""
    case _ => genString(rng)
  }

  test("25k-case structured + mutation fuzz against GetJsonObject") {
    val rng = new scala.util.Random(20260814L)
    (0 until 25000).foreach { _ =>
      val nFields = rng.nextInt(5)
      val doc = (0 until nFields)
        .map(_ => genName(rng) + (if (rng.nextInt(8) == 0) " : " else ":") +
          genValue(rng, 1))
        .mkString("{", ",", "}")
      val in = if (rng.nextInt(10) < 3) mutate(rng, doc) else doc
      check(in)
    }
  }

  private def mutate(rng: scala.util.Random, doc: String): String = {
    if (doc.isEmpty) return doc
    val pos = rng.nextInt(doc.length)
    rng.nextInt(3) match {
      case 0 => doc.substring(0, pos) + doc.substring(math.min(pos + 1, doc.length))
      case 1 =>
        val junk = "\"{}[],:x\\09".charAt(rng.nextInt(11))
        doc.substring(0, pos) + junk + doc.substring(pos)
      case _ => doc.take(pos) // truncate
    }
  }

  test("DataFrame parity incl. codegen path and null propagation") {
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    val docs = (0 until 2000).map { i =>
      if (i % 97 == 0) null
      else {
        val d = (0 until rng.nextInt(4))
          .map(_ => genName(rng) + ":" + genValue(rng, 1)).mkString("{", ",", "}")
        if (rng.nextInt(10) == 0) mutate(rng, d) else d
      }
    }
    val df = docs.toDF("j").select(
      TextFunctions.jsonGet($"j", "k").as("kernel"),
      get_json_object($"j", "$.k").as("builtin"))
    val diverged = df.filter(
      !($"kernel" <=> $"builtin")).count()
    assert(diverged == 0)
  }
}
