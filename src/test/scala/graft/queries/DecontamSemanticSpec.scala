package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** `decontaminate_semantic` vs a plain-Scala recompute (the independent
  * in-JVM oracle convention), plus the tie rule on a crafted fixture. */
class DecontamSemanticSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  test("nearest-eval report matches a plain-Scala recompute") {
    val mod = CurationOps.DecontamEvalMod
    val all = Tables.embeddings(spark, SfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val ev = all.filter(_._1 % mod == 0).sortBy(_._1)
    val tr = all.filter(_._1 % mod != 0)

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val s = math.sqrt(na) * math.sqrt(nb)
      if (s == 0.0) 0.0 else d / s
    }
    val want = tr.map { case (id, v) =>
      val (bid, bsim) = ev.foldLeft((ev.head._1, Double.NegativeInfinity)) {
        case ((ci, cs), (eid, evec)) =>
          val c = cos(v, evec)
          if (c > cs) (eid, c) else (ci, cs)
      }
      (id, bid,
        BigDecimal(bsim).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)

    val got = SparkEntry.queries("decontaminate_semantic")(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("exact ties keep the lowest eval id") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // eval ids 20 and 40 carry the SAME vector; train id 1 matches both
    // exactly — the report must name 20
    val v = Seq.fill(4)(1.0f)
    val rows = Seq((1L, Seq(1.0f, 1.0f, 1.0f, 1.0f)), (20L, v), (40L, v))
      .toDF("vec_id", "embedding")
    val ev = rows.filter(col("vec_id") % 20 === 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .sortBy(_._1)
    val got = rows.filter(col("vec_id") % 20 =!= 0)
      .select(col("vec_id"), graft.GraftFunctions.columnOf(
        graft.functions.BestMatchExpr(
          graft.GraftFunctions.exprOf(col("embedding")),
          ev.map(_._1).toSeq, ev.map(_._2).toSeq)).as("m"))
      .select(col("vec_id"), col("m.match_id"), col("m.sim"))
      .collect().head
    assert(got.getLong(1) == 20L, s"tie must keep the lowest id: $got")
    assert(math.abs(got.getDouble(2) - 1.0) < 1e-12)
  }

  test("over-cap eval split falls back to the broadcast-join form, row-identical") {
    import org.apache.spark.sql.functions.col
    val mod = CurationOps.DecontamEvalMod
    val e = Tables.embeddings(spark, SfDir)
    val train = e.filter(col("vec_id") % mod =!= 0)
      .select(col("vec_id"), col("embedding"))
    val evalSide = e.filter(col("vec_id") % mod === 0)
      .select(col("vec_id").as("eval_id"), col("embedding"))
    def run(maxCells: Long) =
      VectorOps.bestEvalMatch(train, evalSide, dims = 64, maxCells = maxCells)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
    // maxCells = 1 plants the oversized-split condition: the kernel path
    // is forbidden, the broadcast-join argmax path must produce the SAME
    // rows bit-for-bit (shared CosineSimExpr fold + lowest-id tie rule)
    val kernel = run(Long.MaxValue)
    val fallback = run(1L)
    assert(kernel.nonEmpty && kernel.length == fallback.length)
    kernel.zip(fallback).foreach { case (k, f) =>
      assert(k == f, s"kernel $k != fallback $f")
    }
  }

  test("a NULL-embedding train row reports (null, null) on BOTH paths") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val train = Seq(
      (1L, Some(Seq(1.0f, 0.0f))),
      (2L, None: Option[Seq[Float]])).toDF("vec_id", "embedding")
    val evalSide = Seq((10L, Seq(1.0f, 0.0f)), (20L, Seq(0.0f, 1.0f)))
      .toDF("eval_id", "embedding")
    def run(maxCells: Long) =
      VectorOps.bestEvalMatch(train, evalSide, dims = 2, maxCells = maxCells)
        .orderBy(col("vec_id"))
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toSeq
    val kernel = run(Long.MaxValue)
    val fallback = run(1L)
    assert(kernel == fallback, s"null-row parity: $kernel != $fallback")
    val nullRow = kernel.find(_._1 == 2L).get
    assert(nullRow._2.isEmpty && nullRow._3.isEmpty,
      s"null embedding must report (null, null), got $nullRow")
    val liveRow = kernel.find(_._1 == 1L).get
    assert(liveRow._2.contains(10L) && liveRow._3.exists(s => math.abs(s - 1.0) < 1e-12))
  }
}
