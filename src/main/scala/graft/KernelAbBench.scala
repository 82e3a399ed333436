package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-session A/B of the fused token-stat kernels (round 14) against
  * the WordTokens-array compositions they replaced — the only honest way
  * to attribute a delta on this shared box (recorded artifacts carry
  * ±40% ambient noise; see SCALE.md "bench ambient inflation").
  *
  * Alternates legacy/fused reps, reports per-variant medians plus a
  * value-parity count (both forms must agree row-for-row on the corpus
  * being timed, independent of TokenStatsKernelSpec's synthetic text).
  *
  * Usage: SPARK_GRAFT_SF_DIR=target/sf10 tools/run_main.sh graft.KernelAbBench [reps]
  */
object KernelAbBench {
  import GraftFunctions.{columnOf, exprOf}
  import graft.functions._

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning.tuned(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("kernel-ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")

    def hash60(salt: String, id: Column): Column =
      conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 15), 16, 10)
        .cast("long")

    val ts: Column = columnOf(WordTokens(exprOf(col("text"))))
    val stops = TextFunctions.Stopwords

    def legacyQuality: Column = {
      val nChars = length(col("text")).cast("double")
      val nToks = greatest(size(ts).cast("double"), lit(1.0))
      val nStop = columnOf(CountInSet(exprOf(ts), stops)).cast("double")
      val punct = columnOf(CountPunctChars(exprOf(col("text")))).cast("double")
      val lenScore = least(nChars / lit(500.0), lit(1.0))
      val stopScore = least(nStop / nToks * lit(3.0), lit(1.0))
      val pp = least(punct / greatest(nChars, lit(1.0)) * lit(5.0), lit(1.0))
      round(lenScore * lit(0.4) + stopScore * lit(0.4) + (lit(1.0) - pp) * lit(0.2), 6)
    }

    val langSets = Seq(
      Seq("the", "and", "of", "to", "a", "is"),
      Seq("el", "la", "de", "que", "y", "los"),
      Seq("der", "die", "und", "das", "ist", "ein"),
      Seq("le", "les", "et", "des", "un", "une"),
      Seq("shi", "de", "le", "wo", "ni", "ta"))

    val pairs: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("quality",
        docs.select(col("doc_id"), legacyQuality.as("q")),
        docs.select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("q"))),
      ("weighted_sample",
        docs.filter((hash60("wq:", col("doc_id")) % 1000000L) <
            floor(legacyQuality * 1000000.0))
          .select(col("doc_id"), legacyQuality.as("q")),
        docs.filter(queries.CurationOps.qualityWeightedKeep(col("doc_id"), col("text")))
          .select(col("doc_id"),
            TextFunctions.qualityScore(col("text")).as("q"))),
      ("gopher", {
        val keepLegacy =
          queries.CorpusOps.gopherNWords(ts).between(
            queries.CorpusOps.GopherMinWords, queries.CorpusOps.GopherMaxWords) &&
          queries.CorpusOps.gopherMeanWlen(ts).between(3.0, 10.0) &&
          queries.CorpusOps.gopherAlphaFrac(ts) >= 0.7 &&
          queries.CorpusOps.gopherNStop(ts) >= 2
        docs.select(col("doc_id"),
          queries.CorpusOps.gopherNWords(ts).as("n"),
          queries.CorpusOps.gopherMeanWlen(ts).as("mw"),
          queries.CorpusOps.gopherAlphaFrac(ts).as("af"),
          queries.CorpusOps.gopherNStop(ts).as("ns"),
          keepLegacy.as("keep"))
      }, {
        val st = queries.CorpusOps.gopherStats(col("text"))
        docs.select(col("doc_id"),
          queries.CorpusOps.gopherNWordsS(st).as("n"),
          queries.CorpusOps.gopherMeanWlenS(st).as("mw"),
          queries.CorpusOps.gopherAlphaFracS(st).as("af"),
          queries.CorpusOps.gopherNStopS(st).as("ns"),
          queries.CorpusOps.gopherKeepCol(col("text")).as("keep"))
      }),
      ("lang_id",
        docs.select(col("doc_id") +: langSets.zipWithIndex.map { case (s, i) =>
          columnOf(CountInSet(exprOf(ts), s)).as(s"s$i") }: _*),
        {
          val cs = columnOf(CountInSets(exprOf(col("text")), langSets))
          docs.select(col("doc_id") +: langSets.indices.map(i =>
            element_at(cs, i + 1).as(s"s$i")): _*)
        }),
      ("repetition",
        docs.select(col("doc_id"),
          size(ts).cast("long").as("nt"),
          size(columnOf(WordNgrams(exprOf(col("text")), 3))).cast("long").as("nd")),
        {
          val st = columnOf(NgramStats(exprOf(col("text")), 3))
          docs.select(col("doc_id"),
            st.getField("n_toks").as("nt"), st.getField("n_distinct").as("nd"))
        }),
      ("maxby_top1", {
        val ev = Tables.events(spark, sfDir)
          .select(col("event_type"), col("event_id"), col("value"))
        ev.groupBy(col("event_type"))
          .agg(max_by(struct(col("event_id"), col("value")),
            struct(col("value"), negate(col("event_id")))).as("top"))
          .select(col("event_type"), col("top.event_id").as("event_id"),
            col("top.value").as("value"))
      }, {
        val ev = Tables.events(spark, sfDir)
          .select(col("event_type"), col("event_id"), col("value"))
        ev.groupBy(col("event_type"))
          .agg(GraftFunctions.maxByOrd(struct(col("event_id"), col("value")),
            struct(col("value"), negate(col("event_id")))).as("top"))
          .select(col("event_type"), col("top.event_id").as("event_id"),
            col("top.value").as("value"))
      }))

    def consume(df: DataFrame): Long = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1000000L
    }

    val only = sys.env.get("SPARK_GRAFT_AB_ONLY").map(_.split(",").toSet)
    pairs.filter(p => only.forall(_.contains(p._1))).foreach {
      case (name, legacy, fused) =>
        // row-for-row parity on THIS corpus before timing (key = 1st col)
        val key = legacy.columns.head
        val mismatch = legacy.as("l").join(fused.as("f"), Seq(key), "full")
          .filter(legacy.columns.filter(_ != key).map(c =>
            !(col(s"l.$c") <=> col(s"f.$c"))).reduce(_ || _))
          .count()
        val times = (0 until reps).map { _ =>
          (consume(legacy), consume(fused))
        }
        val lMed = times.map(_._1).sorted.apply(reps / 2)
        val fMed = times.map(_._2).sorted.apply(reps / 2)
        println(f"""{"variant":"$name","legacy_ms":$lMed,"fused_ms":$fMed,""" +
          f""""speedup":${lMed.toDouble / fMed}%.2f,"parity_mismatch":$mismatch}""")
    }
    spark.stop()
  }
}
