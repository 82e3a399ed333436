package graft.queries

import graft.SparkSpec

/** The opt-in JL-slimmed semdedup must agree with the fused gate query
  * row for row — its coarse bound is SOUND (orthonormal basis ⇒
  * a·b = Pa·Pb + ra·rb exactly, Cauchy–Schwarz on the residuals), so
  * agreement is a theorem; this spec guards the implementation of that
  * theorem (basis orthonormality, the multiplied-out 0/0-free filter,
  * the round-6 margin) against regressions. */
class SemdedupSlimSpec extends SparkSpec {

  test("SemProjBasis is orthonormal (the soundness precondition)") {
    val b = VectorOps.SemProjBasis
    assert(b.size == VectorOps.RpOut)
    for (i <- b.indices; j <- i until b.size) {
      val d = b(i).zip(b(j)).map { case (x, y) => x * y }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-12, s"<b$i, b$j> = $d, want $want")
    }
  }

  test("slim pair stage == fused gate verdicts, row for row") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val gate = Registry.all.find(_.name == "semdedup").get.fn(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      val slim = VectorOps.semdedupSlim(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      assert(slim == gate,
        s"$dir: slim diverged from gate\n slim=${slim.filterNot(gate.contains).take(5)}" +
          s"\n gate=${gate.filterNot(slim.contains).take(5)}")
    }
  }
}
