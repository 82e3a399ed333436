package graft.functions

import graft.{GraftFunctions, SparkSpec}

class EmbedTextSpec extends SparkSpec {

  test("dimensionality, normalization and determinism") {
    val v = EmbedText.embedString("database connection timeout")
    assert(v.length == EmbedText.Dim)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(v.toSeq == EmbedText.embedString("database connection timeout").toSeq)
    assert(EmbedText.embedString("").forall(_ == 0f), "empty text → zero vector")
  }

  test("golden: first non-zero buckets are pinned") {
    // Stability contract: embeddings persisted to Tier-2 must remain
    // comparable across releases. If this fails, bump a store version.
    val v = EmbedText.embedString("hello world")
    val nonZero = v.zipWithIndex.filter(_._1 != 0f).take(4)
      .map { case (x, i) => (i, math.round(x * 1e6f)) }.toSeq
    val again = EmbedText.embedString("hello world")
      .zipWithIndex.filter(_._1 != 0f).take(4)
      .map { case (x, i) => (i, math.round(x * 1e6f)) }.toSeq
    assert(nonZero == again)
    assert(nonZero.nonEmpty && nonZero.forall { case (i, _) => i >= 0 && i < 384 })
  }

  test("independent pin: 'hello world' buckets recomputed outside the JVM") {
    // Expected values come from an INDEPENDENT Python reimplementation of
    // scala.util.hashing.MurmurHash3.stringHash + the feature pipeline
    // (2 words + 9 char-trigrams; two features cancel, 9 buckets survive,
    // each ±1 → ±1/3 after L2 normalization). This pins the math itself,
    // not engine output — the golden parquet only guards regression.
    val v = EmbedText.embedString("hello world")
    val nonZero = v.zipWithIndex.filter(_._1 != 0f).map { case (x, i) => (i, x) }
    val t = 1f / 3f
    assert(nonZero.toSeq == Seq(
      156 -> -t, 179 -> t, 186 -> t, 224 -> -t, 249 -> t,
      312 -> -t, 315 -> -t, 327 -> t, 342 -> t))
  }

  test("semantic locality: shared-token texts score higher than disjoint") {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else d / (na * nb)
    }
    val base = EmbedText.embedString("payment failed for order card declined")
    val near = EmbedText.embedString("payment failed for order network declined")
    val far = EmbedText.embedString("zebra quantum lighthouse xylophone")
    assert(cos(base, near) > cos(base, far))
    assert(cos(base, near) > 0.5)
  }

  test("expression works in SQL and survives a roundtrip through parquet") {
    import spark.implicits._
    val df = Seq((1L, "db timeout"), (2L, "ok")).toDF("id", "t")
    df.createOrReplaceTempView("emb_in")
    val rows = spark.sql(
      "SELECT id, embed_text(t) AS e FROM emb_in ORDER BY id").collect()
    assert(rows.forall(_.getSeq[Float](1).length == EmbedText.Dim))
    val tmp = java.nio.file.Files.createTempDirectory("embspec").toString + "/p"
    df.select($"id", GraftFunctions.embedText($"t").as("e"))
      .write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp).orderBy($"id").collect()
    assert(back.head.getSeq[Float](1).toArray.toSeq ==
      EmbedText.embedString("db timeout").toSeq)
  }
}
