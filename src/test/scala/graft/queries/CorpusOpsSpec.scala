package graft.queries

import graft.{SparkSpec, Tables}

/** Independent (non-Spark) recomputes of the corpus-hygiene operators:
  * plain Scala token walks over collected rows, so a census/island/rule
  * mistake cannot pass by matching itself. The multi-island fixture
  * proves the gaps-and-islands merge actually splits disjoint duplicated
  * regions (the sf fixtures' planted dups are whole-doc, single-island).
  */
class CorpusOpsSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def toks(t: String): Array[String] =
    t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def query(name: String) =
    Registry.all.find(_.name == name).get.fn(spark, SfDir)

  private def bruteSpans(docs: Array[(Long, String)]): Seq[(Long, Long, Long)] = {
    val w = CorpusOps.SpanW
    val wins = docs.flatMap { case (id, t) =>
      val ts = toks(t)
      (0 to ts.length - w).map(i => (id, i + 1L, ts.slice(i, i + w).mkString(" ")))
    }
    val dupGrams = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size > 1).keySet
    wins.filter(x => dupGrams(x._3))
      .groupBy(_._1).toSeq.flatMap { case (id, ws) =>
        val ps = ws.map(_._2).sorted
        // islands: consecutive runs of duplicated start positions
        val runs = ps.foldLeft(List.empty[List[Long]]) {
          case (acc, p) if acc.nonEmpty && p == acc.head.head + 1 =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        runs.map(r => (id, r.last, r.head - r.last + w))
      }.sortBy(x => (x._1, x._2))
  }

  test("dup_spans matches a plain token-walk recompute") {
    val docs = Tables.documents(spark, SfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = bruteSpans(docs)
    val got = query("dup_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"spans mismatch:\n got=$got\n exp=$expected")
    assert(got.nonEmpty, "fixture must contain planted duplicated spans")
  }

  test("dup_spans splits disjoint duplicated regions into separate islands") {
    import spark.implicits._
    val w = CorpusOps.SpanW
    // shared prefix (w tokens) + unique middles + shared suffix (w tokens):
    // each doc must report TWO spans, not one doc-wide span
    val shared1 = (1 to w).map(i => s"alpha$i").mkString(" ")
    val shared2 = (1 to w).map(i => s"omega$i").mkString(" ")
    val docs = Seq(
      (0L, s"$shared1 unique zero middle words here $shared2", "en", "s", 0L),
      (1L, s"$shared1 other one middle tokens text $shared2", "en", "s", 0L))
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Registry.all.find(_.name == "dup_spans").get.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = bruteSpans(docs.map(d => (d._1, d._2)).toArray)
    assert(got == expected, s"got=$got exp=$expected")
    assert(got.count(_._1 == 0L) == 2 && got.count(_._1 == 1L) == 2,
      s"each doc must carry two disjoint spans: $got")
    assert(got.forall(_._3 == w), s"each island is exactly one window wide: $got")
  }

  test("drop_spans keeps exactly the globally-first occurrence of each window") {
    val w = CorpusOps.SpanW
    val docs = Tables.documents(spark, SfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wins = docs.flatMap { case (id, t) =>
      val ts = toks(t)
      (0 to ts.length - w).map(i => (id, i + 1, ts.slice(i, i + w).mkString(" ")))
    }
    val byGram = wins.groupBy(_._3)
    val owners = byGram.collect {
      case (g, ws) if ws.map(_._1).distinct.size > 1 =>
        g -> ws.map(x => (x._1, x._2)).min
    }
    val removedPos: Map[Long, Set[Int]] = wins
      .filter(x => owners.get(x._3).exists(_ != ((x._1, x._2))))
      .groupBy(_._1).view
      .mapValues(_.flatMap(x => x._2 until x._2 + w).toSet).toMap
    val expected = docs.map { case (id, t) =>
      val ts = toks(t)
      val rem = removedPos.getOrElse(id, Set.empty)
      val kept = ts.zipWithIndex.collect { case (tok, i) if !rem(i + 1) => tok }
      id -> ((kept.mkString(" "), kept.length.toLong))
    }.toMap
    val got = query("drop_spans").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, v) =>
      assert(got(id) == v, s"doc $id:\n got=${got(id)}\n exp=$v")
    }
    // the transform must both remove something and keep every owner intact
    val origLen = docs.map { case (id, t) => id -> toks(t).length.toLong }.toMap
    assert(got.exists { case (id, (_, n)) => n < origLen(id) },
      "fixture must contain removable duplicated spans")
    assert(got.exists { case (id, (_, n)) => n == origLen(id) && n > 0 },
      "owner documents must survive untouched")
  }

  test("gopher_quality matches a per-document rule recompute") {
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.documents(spark, SfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stop = CorpusOps.GopherStopwords.toSet
    val expected = docs.map { case (id, t) =>
      val ts = toks(t)
      val n = ts.length.toLong
      val mwl = r4(ts.map(_.length).sum.toDouble / n)
      val af = r4(ts.count(_.forall(c => c >= 'a' && c <= 'z')).toDouble / n)
      val ns = ts.count(stop).toLong
      val keep = n >= CorpusOps.GopherMinWords && n <= CorpusOps.GopherMaxWords &&
        mwl >= 3.0 && mwl <= 10.0 && af >= 0.7 && ns >= 2
      id -> ((n, mwl, af, ns, keep))
    }.toMap
    val got = query("gopher_quality").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, v) =>
      assert(got(id) == v, s"doc $id: ${got(id)} != $v")
    }
    // the rule battery must actually split the corpus, not rubber-stamp it
    assert(got.values.exists(_._5) && got.values.exists(!_._5),
      "fixture must contain both kept and rejected documents")
  }
}
