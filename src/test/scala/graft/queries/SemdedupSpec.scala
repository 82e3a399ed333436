package graft.queries

import graft.{SparkSpec, Tables}

/** Independent recompute of semantic dedup: plain-Scala cosine math over
  * the collected sf0.001 embeddings (assignment argmax, pairwise
  * threshold, lowest-id-keeps), so a blocking or keep-rule mistake in the
  * Spark plan cannot pass by matching itself. */
class SemdedupSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na * nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pq_topk matches a plain product-quantization + ADC recompute") {
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Tables.embeddings(spark, SfDir)
      .selectExpr("vec_id", "embedding").collect()
      .map(x => (x.getLong(0), x.getSeq[Float](1).toArray))
    val cents = rows.filter(x => VectorOps.SemCentroids.contains(x._1))
    def sub(v: Array[Float], j: Int): Array[Float] =
      v.slice(j * VectorOps.PqSub, (j + 1) * VectorOps.PqSub)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val q = VectorOps.Q.toArray
    // encode: per (vector, subspace) the nearest sub-centroid (tie: min cid)
    // ADC: query distance table per (subspace, cid), rounded pre-sum
    val scored = rows.map { case (id, v) =>
      val adist = (0 until VectorOps.PqM).map { j =>
        val sv = sub(v, j).map(_.toDouble)
        val code = cents.map { case (cid, cv) =>
          (l2(sv, sub(cv, j).map(_.toDouble)), cid)
        }.min._2
        val cv = sub(cents.find(_._1 == code).get._2, j).map(_.toDouble)
        val qv = q.slice(j * VectorOps.PqSub, (j + 1) * VectorOps.PqSub)
        r(l2(qv, cv), 6)
      }.sum
      (id, r(adist, 4))
    }
    val expected = scored.sortBy(x => (x._2, x._1)).take(10).toSeq
    val got = Registry.all.find(_.name == "pq_topk").get.fn(spark, SfDir)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(got == expected, s"\n got=$got\n exp=$expected")
  }

  test("semdedup matches a plain cosine recompute of assign + drop") {
    val rows = Tables.embeddings(spark, SfDir)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cents = rows.filter(r => VectorOps.SemCentroids.contains(r._1))
    assert(cents.nonEmpty, "fixture must contain at least one seed centroid")
    // assignment: argmax cosine, ties to the smallest cid
    val assigned = rows.map { case (id, v) =>
      val cid = cents.map { case (cid, cv) => (cos(v, cv), -cid) }
        .zip(cents.map(_._1))
        .maxBy(_._1)._2
      id -> cid
    }.toMap
    val byCluster = rows.groupBy(r => assigned(r._1))
    val dropped = byCluster.valuesIterator.flatMap { members =>
      val sorted = members.sortBy(_._1)
      if (members.length > VectorOps.SemClusterCap) Iterator.empty
      else sorted.indices.flatMap { j =>
        val (bId, bv) = sorted(j)
        if (sorted.indices.take(j).exists { i =>
            r6(cos(sorted(i)._2, bv)) >= VectorOps.SemdedupTau })
          Some(bId)
        else None
      }
    }.toSet
    val got = Registry.all.find(_.name == "semdedup").get.fn(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == rows.length, "one verdict row per vector")
    got.foreach { case (id, cid, kept) =>
      assert(cid == assigned(id), s"vec $id assigned to $cid, expected ${assigned(id)}")
      assert(kept == !dropped(id), s"vec $id kept=$kept, expected ${!dropped(id)}")
    }
  }
}
