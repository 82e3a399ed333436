package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: smallest gate beam width that makes the graph probe cover
  * the EXACT cosine top-k at a given corpus (the `ann_graph` oracle
  * contract). Usage: runMain graft.GateEfProbe <sfDir> [k] */
object GateEfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val Q = graft.queries.VectorOps.Q
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val exact = emb.select(col("vec_id"), col("label"),
        round(graft.functions.VectorFunctions.cosineToConst(
          col("embedding").cast("array<double>"), Q), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(k)
      .collect().map(_.toString).toSeq
    val path = graft.search.GraphIndex.indexFor(spark, dir)
    for (ef <- Seq(96, 192, 384, 768, 1536)) {
      val t0 = System.nanoTime()
      val got = graft.search.GraphIndex.probe(spark, path, Q, k, ef = ef)
        .collect().map(_.toString).toSeq
      val miss = exact.count(e => !got.contains(e))
      println(f"""{"n":$n,"ef":$ef,"missing":$miss,"sec":${(System.nanoTime()-t0)/1e9}%.1f}""")
    }
    spark.stop()
  }
}
