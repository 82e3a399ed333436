package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-index build/maintenance cost curves (VERDICT r13 item 3):
  *
  *  1. numParts scaling — the build is one shuffle + one sequential
  *     adjacency construction per sub-graph, so on local[32] wall-clock
  *     should fall roughly with parts until tasks out-number cores.
  *  2. fold A/B — [[graft.search.GraphIndex.foldIncremental]] (encode the
  *     buffer as new segments, O(buffer)) vs the full rebuild
  *     (re-encode everything, O(graph)), same store content, same
  *     session, probe parity asserted.
  *
  * Usage: runMain graft.GraphBuildBench [nRows] [bufRows] [dim]
  * Prints one JSON line. Synthetic deterministic corpus — no testdata
  * dependency, so the curve can be sized freely.
  */
object GraphBuildBench {

  private def corpus(spark: SparkSession, n: Long, dim: Int,
      idOffset: Long = 0L): DataFrame =
    spark.range(n)
      .select((col("id") + idOffset).as("vec_id"),
        (pmod(col("id"), lit(7L))).cast("int").as("label"),
        expr(s"""transform(sequence(1, $dim),
            j -> sin(cast((id + $idOffset) * j AS double) * 0.7
                 + cast(j AS double) * 1.3))""").as("embedding"))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val bufRows = args.lift(1).map(_.toLong).getOrElse(n / 50) // 2%
    val dim = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.search.GraphIndex

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val base = corpus(spark, n, dim).cache()
    base.count()

    // 1. build-curve over numParts
    val curve = Seq(4, 16, 64).map { parts =>
      val p = java.nio.file.Files.createTempDirectory(s"gbb$parts").toString + "/g"
      val (_, sec) = timed(GraphIndex.build(base, p, numParts = parts))
      parts -> sec
    }

    // 2. fold vs full rebuild, same content, same session (parts=16)
    val buf = corpus(spark, bufRows, dim, idOffset = n).cache()
    buf.count()
    val foldStore = java.nio.file.Files.createTempDirectory("gbbF").toString + "/g"
    val rebStore = java.nio.file.Files.createTempDirectory("gbbR").toString + "/g"
    Seq(foldStore, rebStore).foreach { p =>
      GraphIndex.build(base, p, numParts = 16)
      GraphIndex.append(buf, p)
    }
    val (_, foldSec) = timed(GraphIndex.foldIncremental(spark, foldStore))
    val (_, rebSec) = timed(GraphIndex.rebuild(spark, rebStore, numParts = 16))
    // parity: the exact-rescored gate probe must agree between the two
    val q = graft.search.RecallEval.queryVectors(1).head._2
    def probe(p: String) = GraphIndex
      .probeCached(spark, p, q, 10, ef = GraphIndex.GateEf)
      .collect().map(_.toString).toSeq
    val parity = probe(foldStore) == probe(rebStore)

    val curveJson = curve.map { case (p, s) => f""""$p": $s%.1f""" }
      .mkString("{", ", ", "}")
    println(f"""{"metric":"graph_build_curve","n":$n,"dim":$dim,"buf":$bufRows,""" +
      f""""build_sec_by_parts":$curveJson,"fold_sec":$foldSec%.1f,""" +
      f""""rebuild_sec":$rebSec%.1f,"fold_parity":$parity,""" +
      f""""fold_segments":${GraphIndex.segmentCount(spark, foldStore)}}""")
    spark.stop()
  }
}
