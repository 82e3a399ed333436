package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-process A/B for the driver-resident graph buffer (VERDICT r12
  * item 5): a graph store with a streamed-in buffer segment, probed via
  * `GraphIndex.servingHits` with the resident path (default) vs the
  * per-call Spark-job path (forced by a 0-row resident cap). The
  * serving answer is asserted identical before timing. Also reports the
  * empty-buffer floor (stamp read only) and the buffer-mutation re-read
  * cost (first probe after an append).
  *
  * Usage: `sbt "runMain graft.BufBench [nGraph] [nBuffer]"` — one JSON
  * line.
  */
object BufBench {

  def main(args: Array[String]): Unit = {
    val nGraph = args.headOption.map(_.toInt).getOrElse(100000)
    val nBuffer = if (args.length > 1) args(1).toInt else 5000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark)
    val path = java.nio.file.Files.createTempDirectory("bufbench").toString + "/g"
    def vecs(from: Int, n: Int) = spark.range(from, from + n).selectExpr(
        "id as vec_id", "int(id % 7) as label",
        "concat('item ', id % 997, ' flavor ', id % 131, ' of batch ', id % 17) as t")
      .withColumn("embedding",
        graft.GraftFunctions.embedText(col("t")).cast("array<double>"))
      .withColumn("payload", to_json(struct(col("vec_id"), col("t"))))
      .drop("t")
    println(s"[bufbench] building $nGraph-node graph")
    val t0 = System.nanoTime()
    graft.search.GraphIndex.build(vecs(0, nGraph), path, numParts = 8)
    println(f"[bufbench] build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    graft.search.GraphIndex.append(vecs(nGraph, nBuffer), path)

    val q = graft.functions.EmbedText
      .embedString("item flavor of batch fresh probe").map(_.toDouble).toSeq
    def hits(): Seq[(Long, Double)] = graft.search.GraphIndex
      .servingHits(spark, path, q, 32).map(h => (h.vec_id, h.score))
    def p50(xs: Seq[Long]): Double = xs.sorted.apply(xs.size / 2) / 1000.0
    def measure(): Double = {
      (1 to 3).foreach(_ => hits())
      p50((1 to 21).map { _ =>
        val t = System.nanoTime(); hits(); (System.nanoTime() - t) / 1000
      })
    }
    val resident = hits()
    val residentMs = measure()
    // a ZERO-row append bumps the buffer version without changing
    // content — forcing the cap conf to be re-read (the resident copy is
    // keyed by version) while keeping the A/B content-identical
    def bumpOnly(): Unit = graft.search.GraphIndex.append(vecs(0, 0), path)
    spark.conf.set("spark.graft.serve.residentBufferMaxRows", "0")
    bumpOnly()
    val job = hits()
    require(job == resident, "serving hits diverged between buffer paths")
    val jobMs = measure()
    spark.conf.unset("spark.graft.serve.residentBufferMaxRows")
    bumpOnly()
    require(hits() == resident, "resident path diverged after re-enable")
    val resident2Ms = measure()
    println(
      f"""{"bench":"buf","graph_rows":$nGraph,"buffer_rows":$nBuffer,""" +
      f""""resident_p50_ms":$residentMs%.1f,"jobpath_p50_ms":$jobMs%.1f,""" +
      f""""resident_rewarmed_p50_ms":$resident2Ms%.1f}""")
    spark.stop()
  }
}
