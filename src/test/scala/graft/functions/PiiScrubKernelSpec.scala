package graft.functions

import java.util.regex.Pattern

import graft.SparkSpec
import graft.queries.TextOps
import org.apache.spark.sql.functions._

/** The native PII kernel must be BYTE-IDENTICAL to the regex pipeline it
  * replaces in `Curation.curate` — java.util.regex is the engine behind
  * Spark's `regexp_replace`, so parity against Pattern directly IS
  * parity against the gate row's built-ins. */
class PiiScrubKernelSpec extends SparkSpec {

  private val email = Pattern.compile(TextOps.EmailRe)
  private val phone = Pattern.compile(TextOps.PhoneRe)

  private def regexScrub(s: String): String =
    phone.matcher(email.matcher(s).replaceAll("<EMAIL>"))
      .replaceAll("<PHONE>")
  private def regexCount(p: Pattern, s: String): Long = {
    val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
  }

  private def check(s: String): Unit = {
    assert(PiiScrub.scrubString(s) == regexScrub(s),
      s"scrub diverged on <$s>: kernel=${PiiScrub.scrubString(s)} " +
        s"regex=${regexScrub(s)}")
    assert(PiiScrub.countEmails(s) == regexCount(email, s),
      s"email count diverged on <$s>")
    assert(PiiScrub.countPhones(s) == regexCount(phone, s),
      s"phone count diverged on <$s>")
  }

  test("adversarial fixtures: every backtracking corner") {
    Seq(
      "", "plain text no pii at all",
      // email corners
      "a@b.cd", "a@b.cd9", "x a@b.c y",                   // short TLD fails
      "user.name+tag%x@mail-host.example.com",
      "a@b@c.de", "a@bc@d.ef",                            // double @
      "@x.com", "a@.com", "a@com", "a@c.om.",             // degenerate domains
      "a@b.cd.ef", "a@b.cd.e",                            // rightmost-dot backtracking
      "123-456-7890@x.com",                               // phone-shaped local part
      "a@b-c.d-e.fg", "a@-.xy", "a@..xy", "a@x..yz",
      "tail a@b.cde", "a@b.cde tail", "é a@b.cd é",       // non-ASCII neighbors
      "A@B.CD", "a_b%c@d.ee f@g.hh",                      // multiple matches
      // phone corners
      "123-456-7890", "123-4567-8901", "123.456.7890", "123.4567.8901",
      "123-456-78901", "1123-456-7890", "123-45678-9012",
      "12-345-6789", "123-456-789", "x123-456-7890y",
      "123-4567-890", "123-4567.8901", "999.9999.99999",
      "123-456-7890 123-456-7890",                        // adjacency
      // interaction: phone inside an email is consumed by <EMAIL> first
      "call 123-456-7890 or mail 123-456-7890@x.com now"
    ).foreach(check)
  }

  test("20k-case random fuzz against java.util.regex") {
    val rng = new scala.util.Random(20251214L)
    val alphabet = "ab1@.-_%+ .9Z@@..--25xy@z0"
    (0 until 20000).foreach { _ =>
      val len = rng.nextInt(40)
      check((0 until len).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    }
    // digit/separator-dense fuzz for the phone FSM
    val digits = "0123456789-.."
    (0 until 5000).foreach { _ =>
      val len = rng.nextInt(30)
      check((0 until len).map(_ => digits(rng.nextInt(digits.length)))
        .mkString)
    }
  }

  test("expression parity on the documents table (codegen path)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
      .withColumn("planted", concat($"text",
        lit(" bob+1@mail.example.org or 415-555-0199 ")))
    val got = docs.select($"doc_id",
        graft.GraftFunctions.columnOf(PiiScrubExpr(
          graft.GraftFunctions.exprOf($"planted"))).as("k"))
      .orderBy($"doc_id").collect().map(_.getString(1))
    val want = docs.select($"doc_id",
        regexp_replace(regexp_replace($"planted",
          TextOps.EmailRe, "<EMAIL>"), TextOps.PhoneRe, "<PHONE>").as("r"))
      .orderBy($"doc_id").collect().map(_.getString(1))
    assert(got.sameElements(want))
    assert(got.forall(s => s.contains("<EMAIL>") && s.contains("<PHONE>")))
  }

  test("count expressions equal the regexp_extract_all sizes (codegen path)") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text")
      .withColumn("planted", concat($"text",
        lit(" a@b.cc x 123-456-7890 999.9999.9999 c@d.ee@f.gg ")))
    val diverged = docs.select(
        graft.GraftFunctions.columnOf(PiiCountExpr(
          graft.GraftFunctions.exprOf($"planted"), emails = true)).as("ke"),
        graft.GraftFunctions.columnOf(PiiCountExpr(
          graft.GraftFunctions.exprOf($"planted"), emails = false)).as("kp"),
        size(regexp_extract_all($"planted", lit(TextOps.EmailRe), lit(0)))
          .cast("long").as("be"),
        size(regexp_extract_all($"planted", lit(TextOps.PhoneRe), lit(0)))
          .cast("long").as("bp"))
      .filter($"ke" =!= $"be" || $"kp" =!= $"bp").count()
    assert(diverged == 0)
  }
}
