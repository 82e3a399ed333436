package graft.search

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The partitioned NSW graph index: deterministic build, persisted-probe
  * == inline-gate parity, gate-beam coverage of the EXACT top-10 at every
  * gate SF (the property the `ann_graph` oracle rides on), and honest
  * scan accounting. */
class GraphIndexSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private val Q = graft.queries.VectorOps.Q

  private def exactTop10(dir: String): Array[(Long, Int, Double)] =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        round(graft.functions.VectorFunctions.cosineToConst(
          col("embedding").cast("array<double>"), Q), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))

  test("beam kernel: full-ef beam on a tiny graph is exhaustive and counted") {
    // 5 nodes on a line in 2-d; star graph from node 0
    val vecs = Array(Array(1.0, 0.0), Array(0.9, 0.1), Array(0.5, 0.5),
      Array(0.1, 0.9), Array(0.0, 1.0))
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    val ids = Array(0L, 1L, 2L, 3L, 4L)
    val adj = Array(Array(1, 2, 3, 4), Array(0), Array(0), Array(0), Array(0))
    val q = Array(0.0, 1.0); val qn = 1.0
    val (top, visited) = GraphIndex.beamSearch(vecs, norms, ids, adj, q, qn,
      ef = 5, entry = 0)
    assert(visited == 5)
    // nearest to (0,1): node 4, then 3, 2, 1, 0
    assert(top.toSeq == Seq(4, 3, 2, 1, 0))
  }

  test("build is deterministic: two builds of the same corpus are identical") {
    val emb = Tables.embeddings(spark, SfDir)
    val p1 = java.nio.file.Files.createTempDirectory("g1").toString + "/g"
    val p2 = java.nio.file.Files.createTempDirectory("g2").toString + "/g"
    GraphIndex.build(emb, p1)
    GraphIndex.build(emb, p2)
    val a = spark.read.parquet(s"$p1/graph")
      .select("vec_id", "nbrs", "part").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getInt(2))).sortBy(_._1)
    val b = spark.read.parquet(s"$p2/graph")
      .select("vec_id", "nbrs", "part").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getInt(2))).sortBy(_._1)
    assert(a.sameElements(b))
    // every node is present exactly once, adjacency bounded by MMax
    assert(a.length == emb.count())
    assert(a.forall(_._2.length <= GraphIndex.MMax))
  }

  test("persisted probe == inline gate query") {
    val emb = Tables.embeddings(spark, SfDir)
    val path = java.nio.file.Files.createTempDirectory("gidx").toString + "/g"
    GraphIndex.build(emb, path)
    val probed = GraphIndex.probe(spark, path, Q, k = 10,
      ef = GraphIndex.GateEf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val inline = GraphIndex.inlineTopK(emb, Q, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(probed.sameElements(inline))
  }

  test("gate beam covers the exact top-10 at every gate SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val got = GraphIndex.inlineTopK(Tables.embeddings(spark, dir), Q, 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val want = exactTop10(dir)
      assert(got.sameElements(want),
        s"$sf: got ${got.mkString(",")} want ${want.mkString(",")}")
    }
  }

  test("append/rebuild: the segment model serves fresh vectors exactly") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, SfDir)
    val base = emb.filter(col("vec_id") < 400)
    val freshA = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    val freshB = emb.filter(col("vec_id") >= 450)
    val path = java.nio.file.Files.createTempDirectory("gseg").toString + "/g"
    GraphIndex.build(base, path)
    GraphIndex.append(freshA, path)
    // buffered rows are exact candidates: probe == a from-scratch build's
    // probe over the SAME corpus for the pinned query (gate beam)
    val want = GraphIndex.inlineTopK(base.union(freshA), Q, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val got = GraphIndex.probe(spark, path, Q, 10, ef = GraphIndex.GateEf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.sameElements(want),
      s"buffered probe diverged: ${got.toSeq} vs ${want.toSeq}")
    // rebuild folds the buffer in: probe parity holds, buffer is empty,
    // and a post-rebuild append is served again
    GraphIndex.rebuild(spark, path)
    assert(!java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$path/buffer")).iterator().hasNext ||
      spark.read.parquet(s"$path/buffer").count() == 0,
      "rebuild left buffered rows behind")
    val afterRebuild = GraphIndex.probe(spark, path, Q, 10,
      ef = GraphIndex.GateEf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(afterRebuild.sameElements(want))
    GraphIndex.append(freshB, path)
    val wantAll = GraphIndex.inlineTopK(emb, Q, 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val gotAll = GraphIndex.probe(spark, path, Q, 10,
      ef = GraphIndex.GateEf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(gotAll.sameElements(wantAll))
  }

  test("servingHits: resident buffer == per-call job path; mutations visible") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, SfDir)
    val base = emb.filter(col("vec_id") < 400)
    val fresh = emb.filter(col("vec_id") >= 400 && col("vec_id") < 460)
    // the SAME corpus built twice (build is deterministic — pinned above):
    // one store probed through the driver-resident buffer, the other
    // forced onto the per-call Spark-job fallback via a 0-row cap
    val pathRes = java.nio.file.Files.createTempDirectory("gres").toString + "/g"
    val pathJob = java.nio.file.Files.createTempDirectory("gjob").toString + "/g"
    Seq(pathRes, pathJob).foreach { p =>
      GraphIndex.build(base, p); GraphIndex.append(fresh, p)
    }
    def hits(p: String): Seq[(Long, Double, Seq[Float])] = GraphIndex
      .servingHits(spark, p, Q, 20, ef = GraphIndex.GateEf)
      .map(h => (h.vec_id, h.score, h.embedding.toSeq))
    val resident = hits(pathRes)
    val prev = spark.conf.getOption("spark.graft.serve.residentBufferMaxRows")
    try {
      spark.conf.set("spark.graft.serve.residentBufferMaxRows", "0")
      val job = hits(pathJob)
      assert(resident == job,
        s"resident buffer diverged from the job path:\n$resident\nvs\n$job")
      // buffered rows really flow through both paths (fresh ids present)
      assert(resident.exists(_._1 >= 400))
    } finally {
      prev.fold(spark.conf.unset("spark.graft.serve.residentBufferMaxRows"))(
        v => spark.conf.set("spark.graft.serve.residentBufferMaxRows", v))
    }
    // mutation visibility at call boundaries: an append is served by the
    // very next probe (the stamp bump re-reads the buffer)...
    val more = emb.filter(col("vec_id") >= 460 && col("vec_id") < 470)
    GraphIndex.append(more, pathRes)
    val afterAppend = hits(pathRes)
    // exact top-20 with servingHits' own (unrounded score desc, vec_id)
    // order — the reference both serving paths must reproduce
    val k20 = base.union(fresh).union(more)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.cosineToConst(
          col("embedding").cast("array<double>"), Q).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(20)
      .collect().map(_.getLong(0)).toSeq
    assert(afterAppend.map(_._1) == k20,
      "appended rows not visible to the resident serving path")
    // ...and a rebuild (buffer fold) invalidates the resident copy
    GraphIndex.rebuild(spark, pathRes)
    assert(hits(pathRes).map(_._1) == k20,
      "post-rebuild serving hits diverged (stale resident buffer?)")
  }

  test("rebuild recovery: a crash between the swap renames is restored") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, SfDir)
    val path = java.nio.file.Files.createTempDirectory("grec2").toString + "/g"
    GraphIndex.build(emb.filter(col("vec_id") < 400), path)
    GraphIndex.append(emb.filter(col("vec_id") >= 400), path)
    val before = GraphIndex.probe(spark, path, Q, 10,
      ef = GraphIndex.GateEf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // simulate the crash window: graph swapped out, swap-in never ran
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$path/graph"),
      java.nio.file.Paths.get(s"$path/_graph.old"))
    GraphIndex.rebuild(spark, path) // recovery restores, then rebuilds
    val after = GraphIndex.probe(spark, path, Q, 10,
      ef = GraphIndex.GateEf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(after.sameElements(before))
  }

  test("probe is split-proof: forced tiny scan splits change nothing") {
    // when a part= file outgrows maxPartitionBytes the scan splits it at
    // row-group boundaries; without the walk's repartition-by-part a
    // sub-graph would arrive as partial views with half its edges
    // dropped — silently wrong hits. Force pathological splitting and
    // require identical results.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val path = java.nio.file.Files.createTempDirectory("gsplit").toString + "/g"
    GraphIndex.build(emb, path)
    val whole = GraphIndex.probe(spark, path).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val conf = spark.conf
    val prev = conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "65536")
      conf.set("spark.sql.files.openCostInBytes", "0")
      val scan = spark.read.parquet(s"$path/graph")
      assert(scan.rdd.getNumPartitions > GraphIndex.NumParts,
        "split forcing failed — the guard is not being exercised")
      val split = GraphIndex.probe(spark, path).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      assert(split.sameElements(whole),
        s"split scan changed probe results: ${split.toSeq} vs ${whole.toSeq}")
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", prev)
      conf.unset("spark.sql.files.openCostInBytes")
    }
  }

  test("probeCached == probe (the serving path serves the same rows)") {
    val emb = Tables.embeddings(spark, SfDir)
    val path = java.nio.file.Files.createTempDirectory("gcache").toString + "/g"
    GraphIndex.build(emb, path)
    val plain = GraphIndex.probe(spark, path).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val cached = GraphIndex.probeCached(spark, path).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(cached.sameElements(plain))
  }

  test("probeCached: buffered appends are visible, rebuild-in-place invalidates") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, SfDir)
    val path = java.nio.file.Files.createTempDirectory("gver").toString + "/g"
    GraphIndex.build(emb, path)
    val v0 = GraphIndex.version(spark, path)
    assert(v0 > 0, "build did not stamp a version")
    // warm the resident copy BEFORE the store changes
    GraphIndex.probeCached(spark, path, Q, 10, ef = GraphIndex.GateEf).collect()
    // a fresh vector aligned with the pinned query is a guaranteed top hit
    val hero = Seq((1000000L, Q, 9)).toDF("vec_id", "embedding", "label")
    GraphIndex.append(hero, path)
    val buffered = GraphIndex.probeCached(spark, path, Q, 10,
      ef = GraphIndex.GateEf).collect().map(_.getLong(0))
    assert(buffered.head == 1000000L,
      "probeCached did not serve the append buffer")
    // rebuild folds the buffer into the graph and bumps the stamp; only a
    // REFRESHED resident copy can still serve the hero row
    GraphIndex.rebuild(spark, path)
    // stamps are unique random tokens (ADVICE r13), so assert CHANGE —
    // equality is all any resident-cache check uses
    assert(GraphIndex.version(spark, path) != v0, "rebuild did not bump")
    val rebuilt = GraphIndex.probeCached(spark, path, Q, 10,
      ef = GraphIndex.GateEf).collect().map(_.getLong(0))
    assert(rebuilt.head == 1000000L,
      "stale resident graph served after rebuild-in-place")
  }

  test("recall floors at 20k vectors: uniform + perturbed, scan bounded") {
    // measured (seed-123 corpus, seed-42 uniform queries, defaults
    // m=24/mMax=48/efC=96/alpha=1.2, parts=4): ef=48 recall@10 0.968 at
    // 0.284 scanned; perturbed-source recall@1 1.000. Floors carry
    // margin for float-summation order. The 100k/200k trend (recall >=
    // 0.9 at a ~10% scan budget, ef rising with corpus) is recorded in
    // SCALE.md — too slow for CI.
    import spark.implicits._
    val n = 20000
    val rng = new scala.util.Random(123)
    val emb = (0 until n).map { i =>
      (i.toLong, Seq.fill(64)(rng.nextDouble() * 2 - 1), i % 5)
    }.toDF("vec_id", "embedding", "label")
    val path = java.nio.file.Files.createTempDirectory("grec").toString + "/g"
    GraphIndex.build(emb, path)
    val graph = spark.read.parquet(s"$path/graph").cache(); graph.count()
    val qs = RecallEval.queryVectors(50, seed = 42L)
    val exact = RecallEval.exactTopK(emb,
      RecallEval.queriesDf(spark, qs), 10).cache(); exact.count()
    val recall = RecallEval.recallAt(
      GraphIndex.topKMany(graph, qs, 10, ef = 48), exact)
    assert(recall >= 0.94, s"uniform recall@10 $recall < 0.94")
    val frac = GraphIndex.scanStats(graph, qs, ef = 48)
    assert(frac <= 0.33, s"scanned fraction $frac > 0.33")
    // the graph leg must dominate the bucket family's uniform recall
    // (lsh ~0.12, ivf nprobe=8 ~0.80) — the reason it exists
    assert(recall >= 0.90, s"graph leg lost its reason to exist: $recall")
    // perturbed near-dup lookup: the query users actually run
    val rng2 = new scala.util.Random(7)
    val base = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val ids = base.keys.toSeq.sorted
    val qsB = (0 until 50).map { i =>
      val src = ids(rng2.nextInt(ids.size))
      i.toLong -> base(src).map(x => x + (rng2.nextDouble() - 0.5) * 0.02)
    }
    val exactB = RecallEval.exactTopK(emb,
      RecallEval.queriesDf(spark, qsB), 1).cache(); exactB.count()
    val r1 = RecallEval.recallAt(
      GraphIndex.topKMany(graph, qsB, 1, ef = 48), exactB)
    assert(r1 >= 0.98, s"perturbed recall@1 $r1 < 0.98")
    graph.unpersist()
  }

  test("resident-buffer LRU: least-recently-probed path evicted, hot paths kept") {
    // ADVICE r13 / VERDICT r13 item 4: the old overflow handling cleared
    // the WHOLE map, so a session cycling >8 stores re-read even its hot
    // ones. Assertions are RELATIVE to the 9 fresh paths probed here, so
    // entries left by earlier suites (same JVM) can't skew them.
    val emb = Tables.embeddings(spark, SfDir).limit(8)
    val paths = (0 until 10).map { i =>
      val p = java.nio.file.Files.createTempDirectory(s"glru$i").toString + "/g"
      GraphIndex.build(emb, p)
      p
    }
    paths.take(9).foreach(p => GraphIndex.servingCandidates(spark, p, Q, 3))
    val after9 = GraphIndex.residentBufferPaths
    // cap is 8: the 9th fresh insert evicted exactly the eldest (paths(0))
    assert(!after9.contains(paths(0)), "eldest fresh path evicted")
    assert((1 until 9).forall(i => after9.contains(paths(i))),
      s"recent paths survived the 9th insert: $after9")
    // re-probing refreshes recency: touch paths(1), then insert a 10th —
    // the eviction victim must be paths(2) (now eldest), NOT paths(1)
    GraphIndex.servingCandidates(spark, paths(1), Q, 3)
    GraphIndex.servingCandidates(spark, paths(9), Q, 3)
    val after10 = GraphIndex.residentBufferPaths
    assert(after10.contains(paths(1)), "recently re-probed path survived")
    assert(!after10.contains(paths(2)), "new eldest evicted, not clear()")
    assert(after10.contains(paths(9)))
  }

  test("scan accounting: visited counts are real and the ef knob bounds them") {
    // at gate SF (2000 vectors) a production-width beam rightly visits
    // most of the corpus — the bounded-fraction claim lives at 20k+
    // (recall-floors test above: 28% at ef=48; SCALE.md: 10.0% at 100k,
    // 8.7% at 200k). Here: the counter is real (>0, <=1) and ef CONTROLS
    // it — a quarter-width beam must visit materially less.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val path = java.nio.file.Files.createTempDirectory("gscan").toString + "/g"
    GraphIndex.build(emb, path)
    val graph = spark.read.parquet(s"$path/graph")
    val qs = RecallEval.queryVectors(20, seed = 42L)
    val wide = GraphIndex.scanStats(graph, qs, ef = GraphIndex.EfSearch)
    val narrow = GraphIndex.scanStats(graph, qs, ef = 8)
    assert(wide > 0.0 && wide <= 1.0, s"scanned fraction $wide")
    assert(narrow < 0.6 * wide,
      s"ef knob has no effect on visits: ef=8 -> $narrow, ef=72 -> $wide")
  }
}
