package graft.queries

import graft.{SparkSpec, Tables}

/** Independent plain-Scala recomputes of the round-6 additions —
  * `chunk_docs`, `bigram_surprisal`, `rand_proj_topk` — on the sf0.001
  * fixture, so a slice/stride, smoothing-arithmetic, or projection-order
  * mistake cannot pass by matching itself (the DuckDB oracle shares the
  * declared arithmetic; this walk does not). */
class ChunkBigramRandProjSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def docs() =
    Tables.documents(spark, SfDir).selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("chunk_docs matches a plain stride walk") {
    val expected = docs().flatMap { case (id, text) =>
      val ts = tokensOf(text)
      Iterator.from(0)
        .map(k => 1 + k * CorpusOps.ChunkS)
        .takeWhile(_ <= ts.length)
        .zipWithIndex
        .map { case (start, k) =>
          val chunk = ts.slice(start - 1, start - 1 + CorpusOps.ChunkC)
          (id, k + 1L) -> ((start.toLong, chunk.length.toLong, chunk.mkString(" ")))
        }
    }.toMap
    val got = SparkEntryQueries("chunk_docs").collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))
    }.toMap
    assert(got.size == expected.size, s"${got.size} != ${expected.size}")
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"chunk $k: ${got(k)} != $v")
    }
  }

  test("chunk_docs chunks cover every token and overlap by C-S") {
    val byDoc = SparkEntryQueries("chunk_docs").collect()
      .groupBy(_.getLong(0))
    val nToks = docs().map { case (id, t) => id -> tokensOf(t).length }.toMap
    byDoc.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getLong(1))
      // starts advance by exactly S; first starts at 1
      assert(sorted.head.getLong(2) == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(2) == CorpusOps.ChunkS.toLong)
        case _ =>
      }
      // last chunk reaches the final token
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) - 1 == nToks(id).toLong,
        s"doc $id tail not covered")
    }
  }

  test("bigram_surprisal matches an exact-count recompute") {
    val d = docs()
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    var total = 0L
    d.foreach { case (_, text) =>
      val ts = tokensOf(text)
      ts.foreach { t => uni(t) = uni.getOrElse(t, 0L) + 1; total += 1 }
      ts.sliding(2).foreach {
        case Array(a, b) => big((a, b)) = big.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val lam = TextOps.BigramLambda
    val expected = d.flatMap { case (id, text) =>
      val ts = tokensOf(text)
      if (ts.length < 2) None
      else {
        val surps = ts.sliding(2).map { case Array(a, b) =>
          val p = lam * big((a, b)) / uni(a) +
            (1.0 - lam) * uni(b) / total.toDouble
          BigDecimal(-math.log(p)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble
        }.toSeq
        Some(id -> ((surps.size.toLong, surps.sum / surps.size)))
      }
    }.toMap
    val got = SparkEntryQueries("bigram_surprisal").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))
    }.toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, (n, nll)) =>
      assert(got(id)._1 == n, s"doc $id pair count")
      assert(math.abs(got(id)._2 - nll) <= 1e-4 + 1e-9,
        s"doc $id: avg_nll ${got(id)._2} != $nll")
    }
  }

  test("rand_proj_topk matches a plain-Scala projection + cosine walk") {
    val vecs = Tables.embeddings(spark, SfDir)
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val qp = VectorOps.RpRows.map(row =>
      row.indices.foldLeft(0.0)((acc, i) => acc + row(i) * VectorOps.Q(i)))
    val qn = math.sqrt(qp.map(x => x * x).sum)
    def score(v: Array[Double]): Double = {
      val y = VectorOps.RpRows.map(row =>
        row.indices.foldLeft(0.0)((acc, i) => acc + row(i) * v(i)))
      val ny = math.sqrt(y.map(x => x * x).sum)
      val d = y.indices.foldLeft(0.0)((acc, j) => acc + y(j) * qp(j))
      val raw = if (ny == 0.0) 0.0 else d / (ny * qn)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = vecs.map { case (id, lab, v) => (id, lab, score(v)) }
      .sortBy { case (id, _, s) => (-s, id) }
      .take(10)
    val got = SparkEntryQueries("rand_proj_topk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"row order: $g != $e")
      assert(math.abs(g._3 - e._3) <= 1e-6 + 1e-9, s"score: $g != $e")
    }
  }

  test("mat_vec returns NULL on dimension mismatch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)).toDF("v")
    val out = df.select(graft.functions.VectorFunctions.matVec(
      $"v", Seq(Seq(1.0, 1.0))).as("y")).collect()
    assert(out(0).getSeq[Double](0) == Seq(3.0))
    assert(out(1).isNullAt(0))
  }

  private def SparkEntryQueries(name: String) =
    Registry.all.find(_.name == name).get.fn(spark, SfDir)
}
