package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded-random parity proofs for the round-8 kernels, in the
  * CosineExprSpec mold: the fused native pass must equal the relational
  * form it replaced, bit-for-bit, on inputs the gate fixtures never
  * reach (random vectors, adversarial near-ties).
  *
  *  - [[PqAdcExpr]] vs the explode + broadcast-join + argmin + ADC
  *    lookup relational plan (the exact shape `pq_topk` ran before the
  *    fusion) over a random corpus and random codebook.
  *  - [[BestMatchExpr]] vs the crossJoin + max_by relational argmax,
  *    including a crafted exact tie.
  */
class KernelParitySpec extends SparkSpec {

  private val Dim = 64
  private val M = 4
  private val Sub = 16

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("PqAdcExpr == the relational encode+ADC plan on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def vec() = Array.fill(Dim)(rnd.nextFloat() * 2 - 1)
    val corpus = (1 to 300).map(i => (i.toLong, vec())).toDF("vec_id", "embedding")
    val cbRows = (1 to 16).map(i => (i.toLong * 100, vec()))
    val q = Seq.fill(Dim)(rnd.nextDouble() * 2 - 1)

    // kernel side
    val cids = cbRows.map(_._1)
    val cb: Seq[Seq[Double]] = cbRows.map(_._2.map(_.toDouble).toSeq)
    val qd = (0 until M).map { j =>
      cb.map { cv =>
        var acc = 0.0
        var i = 0
        while (i < Sub) {
          val d = q(j * Sub + i) - cv(j * Sub + i); acc += d * d; i += 1
        }
        round6(acc)
      }
    }
    val got = corpus.select($"vec_id", graft.GraftFunctions.columnOf(
      PqAdcExpr(graft.GraftFunctions.exprOf($"embedding"),
        cids, cb, qd, M, Sub)).as("adist"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // relational side: the pre-fusion pq_topk plan, verbatim shapes
    val qArr = "array(" + q.mkString(", ") + ")"
    def l2 = "(acc, i) -> acc + (CAST(element_at(svec, i) AS DOUBLE) - CAST(element_at(cvec, i) AS DOUBLE)) * (CAST(element_at(svec, i) AS DOUBLE) - CAST(element_at(cvec, i) AS DOUBLE))"
    val cents = cbRows.toDF("cid", "cemb")
      .select($"cid", explode(expr(
        s"transform(sequence(0, ${M - 1}), j -> struct(j AS j, slice(cemb, j*$Sub+1, $Sub) AS cvec))")).as("s"))
      .select($"cid", $"s.j".as("j"), $"s.cvec".as("cvec"))
    val ev = corpus.select($"vec_id", explode(expr(
      s"transform(sequence(0, ${M - 1}), j -> struct(j AS j, slice(embedding, j*$Sub+1, $Sub) AS svec))")).as("s"))
      .select($"vec_id", $"s.j".as("j"), $"s.svec".as("svec"))
    val codes = ev.join(broadcast(cents), Seq("j"))
      .withColumn("dist", expr(s"aggregate(sequence(1, $Sub), 0D, $l2)"))
      .groupBy($"vec_id", $"j")
      .agg(min_by($"cid", struct($"dist", $"cid")).as("code"))
    val qTab = cents.withColumn("qdv", round(expr(
      s"""aggregate(sequence(1, $Sub), 0D,
          (acc, i) -> acc + (element_at($qArr, j*$Sub+i) - CAST(element_at(cvec, i) AS DOUBLE)) * (element_at($qArr, j*$Sub+i) - CAST(element_at(cvec, i) AS DOUBLE)))"""), 6))
      .select($"cid", $"j".as("qj"), $"qdv")
    val want = codes.join(broadcast(qTab), $"j" === $"qj" && $"code" === $"cid")
      .groupBy($"vec_id")
      .agg(round(sum($"qdv"), 4).as("adist"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(got.size == want.size)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"vec $id: kernel ${got(id)} != relational $w")
    }
  }

  test("BestMatchExpr == crossJoin + max_by argmax on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    def vec() = Array.fill(Dim)(rnd.nextFloat() * 2 - 1)
    val corpus = (1 to 300).map(i => (i.toLong, vec())).toDF("vec_id", "embedding")
    val refRows = (1 to 20).map(i => (i.toLong * 10, vec()))

    val got = corpus.select($"vec_id", graft.GraftFunctions.columnOf(
      BestMatchExpr(graft.GraftFunctions.exprOf($"embedding"),
        refRows.map(_._1), refRows.map(_._2.map(_.toDouble).toSeq))).as("m"))
      .select($"vec_id", $"m.match_id".as("mid"), round($"m.sim", 6).as("sim"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val refDf = refRows.toDF("rid", "rvec")
    val want = corpus.crossJoin(broadcast(refDf))
      .withColumn("cs", VectorFunctions.cosine($"embedding", $"rvec"))
      .groupBy($"vec_id")
      .agg(max_by(struct($"rid"), struct($"cs", -$"rid")).getField("rid").as("mid"),
        round(max($"cs"), 6).as("sim"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    assert(got.size == want.size)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"vec $id: kernel ${got(id)} != relational $w")
    }
  }
}
