package graft.functions

import graft.SparkSpec
import graft.functions.QuantizeInt8._
import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.functions._

class QuantizeInt8Spec extends SparkSpec {

  private def randomVecs(n: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat),
        Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
      .toDF("id", "a", "b")
  }

  test("quantized cosine tracks exact cosine within INT8 error") {
    import spark.implicits._
    val df = randomVecs(200, 64)
      .withColumn("qa", quantize(col("a"), scaleOf(col("a"))))
      .withColumn("qb", quantize(col("b"), scaleOf(col("b"))))
      .select(cosine(col("a"), col("b")).as("exact"),
        qcosine(col("qa"), col("qb")).as("approx"))
    val errs = df.select(abs(col("exact") - col("approx"))).as[Double].collect()
    assert(errs.max < 0.02, s"max err ${errs.max}")
  }

  test("quantization bounds: values in [-127, 127], zero vector stays zero") {
    import spark.implicits._
    val df = randomVecs(50, 64)
      .withColumn("qa", quantize(col("a"), scaleOf(col("a"))))
    val vals = df.select(explode(col("qa"))).as[Byte].collect()
    assert(vals.min >= -127 && vals.max <= 127)
    val z = Seq((1L, Array.fill(8)(0f))).toDF("id", "v")
      .select(quantize(col("v"), scaleOf(col("v")))).as[Seq[Byte]].collect().head
    assert(z.forall(_ == 0))
  }

  test("int8 corpus kernel returns NULL on dimension mismatch (cosine-kernel parity)") {
    import spark.implicits._
    val df = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(1f, 2f)))
      .toDF("id", "v")
      .select(col("id"), graft.GraftFunctions.columnOf(
        Int8QuantCosine(graft.GraftFunctions.exprOf(col("v")),
          graft.GraftFunctions.exprOf(lit(3.0)),
          Seq(1.0, 2.0, 3.0))).as("score"))
    val rows = df.orderBy("id").collect()
    assert(!rows(0).isNullAt(1), "matching dims must score")
    assert(rows(1).isNullAt(1), "mismatched dims must be NULL, not zero-padded")
  }

  test("storage footprint: tinyint array round-trips through parquet") {
    import spark.implicits._
    val df = randomVecs(20, 64)
      .select(col("id"), scaleOf(col("a")).as("s"),
        quantize(col("a"), scaleOf(col("a"))).as("qv"))
    val tmp = java.nio.file.Files.createTempDirectory("int8").toString + "/q"
    df.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    assert(back.schema("qv").dataType.simpleString == "array<tinyint>")
    assert(back.count() == 20)
  }
}
