package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity proof for the native cosine kernels: identical values to the
  * zip_with+aggregate HOF fold they replaced (same sequential order of
  * IEEE adds, so bit-for-bit equality — no tolerance needed). */
class CosineExprSpec extends SparkSpec {

  private def hofCosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def n2(x: Column) =
      sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val na = n2(a); val nb = n2(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  private def fixture = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "vf", "vd")
  }

  test("CosineSimExpr == HOF fold, float x double operands, bit-exact") {
    import spark.implicits._
    val df = fixture
    val got = df.select($"id", VectorFunctions.cosine($"vf", $"vd").as("c"))
    val want = df.select($"id", hofCosine($"vf", $"vd").as("c"))
    val diff = got.join(want, "id")
      .filter(got("c") =!= want("c")).count()
    assert(diff == 0)
  }

  test("CosineConstExpr == HOF fold against a constant query, bit-exact") {
    import spark.implicits._
    val q = (0 until 64).map(i => ((i * 37) % 101) / 50.0 - 1.0)
    val df = fixture
    val qCol = array(q.map(lit): _*)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val want = df.select($"id",
      (aggregate(zip_with($"vf", qCol, (p, x) => p.cast("double") * x),
        lit(0.0), (acc, v) => acc + v) /
        (sqrt(aggregate($"vf", lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double"))) * lit(qn)))
        .as("c"))
    val got = df.select($"id", VectorFunctions.cosineToConst($"vf", q).as("c"))
    assert(got.join(want, "id").filter(got("c") =!= want("c")).count() == 0)
  }

  test("dimension mismatch yields NULL (HOF zip_with null-pad parity)") {
    import spark.implicits._
    val df = Seq((Array.fill(8)(1f), Array.fill(6)(1f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine($"a", $"b").as("c")).head().isNullAt(0))
    assert(df.select(VectorFunctions.cosineToConst($"a", Seq.fill(6)(1.0)).as("c"))
      .head().isNullAt(0))
    // parity with the HOF form it replaced
    assert(df.select(hofCosine($"a", $"b").as("c")).head().isNullAt(0))
  }

  test("zero vectors score 0.0 (declared zero-norm semantics)") {
    import spark.implicits._
    val df = Seq((Array.fill(8)(0f), Array.fill(8)(1f))).toDF("z", "v")
    assert(df.select(VectorFunctions.cosine($"z", $"v")).head().getDouble(0) == 0.0)
    assert(df.select(VectorFunctions.cosineToConst($"z", Seq.fill(8)(1.0)))
      .head().getDouble(0) == 0.0)
  }
}
