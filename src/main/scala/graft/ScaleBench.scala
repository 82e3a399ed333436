package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TextOps
import graft.search.{AnnIndex, DedupIndex, IvfIndex, TextIndex}

/** Measures the persisted-index crossover (VERDICT r8 #2): at sf0.1 every
  * persisted index (`AnnIndex`, `IvfIndex`, `DedupIndex`, `TextIndex`)
  * LOSES to its inline gate query — 2k vectors fit in one parquet file, so
  * the probe pays 256-partition listing + small-file overhead while the
  * inline scan reads one footer. The 100 TB claim is that partition
  * pruning at file-listing time beats re-deriving signatures per query
  * once the corpus outgrows a handful of files. This main generates
  * seeded corpora at a ladder of sizes, builds each index once, and times
  * inline vs indexed probe (first run = cold listing; then min-of-reps =
  * steady state, the build-once/probe-many regime both the bench and a
  * production probe live in). Results: one JSON line per (leg, size) to
  * stdout and `target/scalebench/results.jsonl`; SCALE.md records the
  * measured crossover table.
  *
  * Corpora are pure hash arithmetic (no RNG — reproducible bit-for-bit):
  * embeddings mirror the driver table's shape (64-d float, dense ids so
  * the `ann_ivf` seed centroids exist); documents draw 30 tokens per doc
  * from a 64-word vocab that includes `text_match`'s query tokens, so the
  * text legs do real selective work.
  *
  * Usage: `sbt "runMain graft.ScaleBench [embSizes] [docSizes] [legs]"`,
  * sizes comma-separated (defaults below: sf0.1-equivalent → 200× that);
  * `legs` optionally restricts to named legs (e.g. `semdedup`).
  */
object ScaleBench {

  /** Per-run wall clamp: past this, a leg's remaining reps are skipped
    * (min so far is reported) — keeps the 100×-scale points affordable. */
  val SlowCutoffSec = 60.0

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val rows = f
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  /** (first, steadyMin, rows): one cold run, then up to `reps` more for
    * the steady-state min, stopping early past [[SlowCutoffSec]]. */
  private def profile(reps: Int)(f: => Long): (Double, Double, Long) = {
    val (first, rows) = time(f)
    var mn = first
    var i = 0
    while (i < reps && mn <= SlowCutoffSec) {
      val (t, _) = time(f); if (t < mn) mn = t; i += 1
    }
    (first, mn, rows)
  }

  private def genEmbeddings(spark: SparkSession, dir: String, n: Long): Unit = {
    val out = s"$dir/embeddings.parquet"
    if (Files.exists(Paths.get(out))) return
    import spark.implicits._
    val files = math.max(1, (n / 500000L).toInt) // ~128 MB-ish files, like a real layout
    spark.range(n).select(
        $"id".as("vec_id"),
        expr("transform(sequence(0, 63), i -> cast((pmod(hash(id * 64 + i), 2001) - 1000) / 1000.0 as float))")
          .as("embedding"),
        pmod(hash($"id"), lit(100)).cast("int").as("label"))
      .repartition(files)
      .write.mode("overwrite").parquet(out)
  }

  /** 64-word vocab including the `text_match` query tokens — selective
    * matches (~5% of docs carry all three) instead of a degenerate scan. */
  private val Vocab: Seq[String] = Seq(
    "filter", "window", "join", "scan", "shuffle", "broadcast", "partition",
    "parquet", "column", "vector", "index", "probe", "bucket", "band",
    "shingle", "minhash", "cosine", "rerank", "cluster", "centroid",
    "stream", "batch", "trigger", "checkpoint", "state", "watermark",
    "schema", "registry", "anomaly", "baseline", "novelty", "template",
    "rhythm", "severity", "ingest", "promote", "rollup", "suppress",
    "sample", "stratified", "quality", "language", "token", "sequence",
    "chunk", "pack", "dedup", "exact", "near", "span", "gram", "jaccard",
    "simhash", "fingerprint", "embed", "quantize", "product", "residual",
    "recall", "precision", "latency", "throughput", "executor", "driver")

  private def textExpr(idCol: String, salt: String): String = {
    val arr = Vocab.map(w => s"'$w'").mkString("array(", ", ", ")")
    s"concat_ws(' ', transform(sequence(0, 29), i -> element_at($arr, pmod(hash($idCol, i, '$salt'), 64) + 1)))"
  }

  private def genDocuments(spark: SparkSession, dir: String, n: Long): Unit = {
    val out = s"$dir/documents.parquet"
    if (Files.exists(Paths.get(out))) return
    import spark.implicits._
    val files = math.max(1, (n / 600000L).toInt)
    spark.range(n).select(
        $"id".as("doc_id"),
        expr(textExpr("id", "corpus")).as("text"),
        lit("en").as("lang"), lit("synth").as("source"))
      .withColumn("n_chars", length($"text").cast("long"))
      .repartition(files)
      .write.mode("overwrite").parquet(out)
  }

  /** Probe shard: 1000 docs, half duplicating corpus texts (ids 0..499's
    * formula), half fresh — both verdict paths exercised. */
  private def shard(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(1000).select(
        ($"id" + lit(1000000000L)).as("doc_id"),
        when($"id" % 2 === 0, expr(textExpr("cast(id / 2 as bigint)", "corpus")))
          .otherwise(expr(textExpr("id", "fresh"))).as("text"),
        lit("en").as("lang"), lit("synth").as("source"))
      .withColumn("n_chars", length($"text").cast("long"))
  }

  /** The inline form DedupIndex replaces: re-derive BOTH corpus signature
    * tables per probe (what `dedup_incremental` pays per run), then the
    * same two semi-joins. */
  private def inlineDedupProbe(corpus: DataFrame, sh: DataFrame): DataFrame = {
    import corpus.sparkSession.implicits._
    import graft.functions.TextFunctions.fingerprint
    val fps = corpus.select(fingerprint($"text").as("fp")).distinct()
    val bands = TextOps.bandRelation(corpus)
      .select($"band_idx", $"band_hash").distinct()
    val dupExact = sh.select($"doc_id", fingerprint($"text").as("fp"))
      .join(fps, Seq("fp"), "left_semi")
      .select($"doc_id").withColumn("de", lit(true))
    val dupNear = TextOps.bandRelation(sh)
      .join(bands, Seq("band_idx", "band_hash"), "left_semi")
      .select($"doc_id").distinct().withColumn("dn", lit(true))
    sh.select($"doc_id")
      .join(dupExact, Seq("doc_id"), "left")
      .join(dupNear, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"de", lit(false)).as("dup_exact"),
        coalesce($"dn", lit(false)).as("dup_near"))
  }

  def main(args: Array[String]): Unit = {
    val embSizes = args.headOption.getOrElse("2000,20000,100000,400000")
      .split(",").map(_.trim.toLong).toSeq
    val docSizes = (if (args.length > 1) args(1) else "5000,50000,200000,1000000")
      .split(",").map(_.trim.toLong).toSeq
    val legs: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def want(l: String) = legs.forall(_.contains(l))
    val root = "target/scalebench"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Files.createDirectories(Paths.get(root))
    val resultsPath = Paths.get(s"$root/results.jsonl")

    def record(leg: String, n: Long, buildS: Double,
        inline: (Double, Double, Long), indexed: (Double, Double, Long)): Unit = {
      val line =
        f"""{"leg":"$leg","n":$n,"build_s":$buildS%.3f,""" +
        f""""inline_first_s":${inline._1}%.3f,"inline_steady_s":${inline._2}%.3f,""" +
        f""""indexed_first_s":${indexed._1}%.3f,"indexed_steady_s":${indexed._2}%.3f,""" +
        f""""rows":${indexed._3}}""".stripMargin
      println(s"[scalebench] $line")
      Files.writeString(resultsPath, line + "\n",
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

    // warmup: codegen + parquet paths
    spark.range(1000).selectExpr("sum(id)").collect()

    embSizes.foreach { n =>
      val dir = s"$root/emb_n$n"
      genEmbeddings(spark, dir, n)

      if (want("ann_rerank")) {
      val annPath = s"$dir/annidx"
      val (annBuild, _) = time {
        AnnIndex.build(Tables.embeddings(spark, dir), annPath); 0L }
      val annInline = profile(3) {
        SparkEntry.queries("ann_rerank")(spark, dir).collect().length.toLong }
      val annIndexed = profile(3) {
        AnnIndex.probe(spark, annPath).collect().length.toLong }
      record("ann_rerank", n, annBuild, annInline, annIndexed)
      }

      if (want("ann_ivf")) {
      val ivfPath = s"$dir/ivfidx"
      val (ivfBuild, _) = time {
        IvfIndex.build(Tables.embeddings(spark, dir), ivfPath); 0L }
      val ivfInline = profile(3) {
        SparkEntry.queries("ann_ivf")(spark, dir).collect().length.toLong }
      val ivfIndexed = profile(3) {
        IvfIndex.probe(spark, ivfPath).collect().length.toLong }
      record("ann_ivf", n, ivfBuild, ivfInline, ivfIndexed)
      }

      if (want("ann_fold")) {
      // Streaming-maintenance fragmentation and its counterweight: 24
      // per-batch appends (one (batch_id, bucket) leaf each — the
      // PromotionStream write shape), probe the fragmented store, then
      // AnnIndex.fold and probe again. The few-files caveat recorded at
      // r9 (`4372fe5`) predicted listing overhead dominates probes on
      // fragmented stores; this leg measures what the fold buys back.
      val foldPath = s"$dir/annfold"
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(foldPath))
      AnnIndex.build(Tables.embeddings(spark, dir), foldPath)
      val batches = 24
      val shardN = math.max(100L, n / 50)
      (0 until batches).foreach { b =>
        val shard = spark.range(n + b * shardN, n + (b + 1) * shardN).select(
          $"id".as("vec_id"),
          expr("transform(sequence(0, 63), i -> cast((pmod(hash(id * 64 + i), 2001) - 1000) / 1000.0 as float))")
            .as("embedding"),
          pmod(hash($"id"), lit(100)).cast("int").as("label"))
        AnnIndex.appendBatch(shard, foldPath, b.toLong)
      }
      val fragProbe = profile(3) {
        AnnIndex.probe(spark, foldPath).collect().length.toLong }
      val (foldS, _) = time { AnnIndex.fold(spark, foldPath); 0L }
      val foldedProbe = profile(3) {
        AnnIndex.probe(spark, foldPath).collect().length.toLong }
      record("ann_fold", n, foldS, fragProbe, foldedProbe)
      }

      if (want("ann_graph")) {
      // Graph-ANN build + probe at scale: the recall leg's cost profile
      // (build is the expensive half; probes are bounded beam walks)
      val gPath = s"$dir/graphidx"
      val (gBuild, _) = time {
        graft.search.GraphIndex.build(Tables.embeddings(spark, dir), gPath)
        0L }
      val gInline = profile(1) {
        SparkEntry.queries("ann_graph")(spark, dir).collect().length.toLong }
      val gIndexed = profile(3) {
        graft.search.GraphIndex.probe(spark, gPath).collect().length.toLong }
      record("ann_graph", n, gBuild, gInline, gIndexed)
      }

      if (want("semdedup")) {
      // semdedup production-lever scaling: nlist grows with the corpus so
      // expected occupancy stays ~5k (< SemClusterCap) — per-cluster pair
      // work constant, total work ~linear in n. The "inline" leg is the
      // gate's FIXED 16 centroids (occupancy grows with n until the cap
      // guard disables pair formation entirely — the shape the cap
      // telemetry exists to flag); "indexed" is the scaled-nlist form.
      def cents(occupancy: Long): Seq[Long] = {
        val nlist = math.max(16L, n / occupancy)
        (0L until nlist).map(i => i * (n / nlist))
      }
      val semFixed = profile(2) {
        graft.queries.VectorOps.semdedupFused(spark, dir).count() }
      val semScaled = profile(2) {
        graft.queries.VectorOps.semdedupFused(spark, dir, cents(5000L)).count() }
      record("semdedup", n, 0.0, semFixed, semScaled)
      // the occupancy lever: pair work is O(n x occupancy), so a tighter
      // semantic granularity is CHEAPER — recorded as its own leg
      val semOcc1k = profile(2) {
        graft.queries.VectorOps.semdedupFused(spark, dir, cents(1000L)).count() }
      record("semdedup_occ1k", n, 0.0, semOcc1k, semOcc1k)
      }
    }

    docSizes.foreach { n =>
      val dir = s"$root/doc_n$n"
      genDocuments(spark, dir, n)
      val corpus = Tables.documents(spark, dir)

      if (want("dedup_probe")) {
      val dedupPath = s"$dir/dedupidx"
      val (dedupBuild, _) = time { DedupIndex.build(corpus, dedupPath); 0L }
      val sh = shard(spark)
      val dedupInline = profile(2) {
        inlineDedupProbe(corpus, sh).collect().length.toLong }
      val dedupIndexed = profile(3) {
        DedupIndex.probe(spark, dedupPath, sh).collect().length.toLong }
      record("dedup_probe", n, dedupBuild, dedupInline, dedupIndexed)
      }

      if (want("text_match")) {
      val textPath = s"$dir/textidx"
      val (textBuild, _) = time { TextIndex.build(corpus, textPath); 0L }
      val textInline = profile(3) {
        corpus.filter(graft.functions.TextFunctions.matchText($"text", "filter window join"))
          .select($"doc_id").count() }
      val textIndexed = profile(3) {
        corpus.join(TextIndex.probe(spark, textPath, "filter window join"),
            Seq("doc_id"), "left_semi")
          .select($"doc_id").count() }
      record("text_match", n, textBuild, textInline, textIndexed)
      }
    }
    spark.stop()
  }
}
