package graft.search

import graft.functions.VectorFunctions.cosineToConst
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Partitioned graph ANN index — the engine's answer to the reference's
  * HNSW-backed search (`/root/reference/app/services/qdrant_service.py:44-95`),
  * closing the uniform-recall gap the bucket family (sign-LSH ~0.12, IVF
  * nprobe=8 ~0.80 recall@10) cannot: a navigable-small-world graph is
  * probed by GREEDY BEAM WALK, so recall comes from graph connectivity,
  * not from how much of the corpus a bucket predicate happens to cover.
  *
  * Architecture (Spark-first, not a single-node port):
  *  - the corpus is hash-split into [[NumParts]] independent sub-graphs
  *    (`part = vec_id mod NumParts`) — each partition builds its OWN
  *    single-layer NSW in one `mapPartitions` task (genuine per-partition
  *    imperative logic: graph construction is sequential within a
  *    partition, embarrassingly parallel across them);
  *  - the built graph persists as parquet PARTITIONED BY `part`
  *    (node rows: vec_id, label, embedding, nbrs) like [[AnnIndex]] /
  *    [[IvfIndex]];
  *  - a probe beam-walks every sub-graph from its entry point (min
  *    vec_id — the first-inserted node, no extra metadata file) and
  *    merges the per-partition top-ef candidates into a global top-k.
  *    Visited-node counts ride out with the hits, so the scanned
  *    fraction (distance evaluations / corpus) is MEASURED, not assumed.
  *
  * 100 TB shape: sub-graphs are independent, so the build is one shuffle
  * (repartition by part) + embarrassingly parallel in-memory
  * construction; partition count scales with the corpus so each
  * sub-graph fits one executor's heap (the same contract as any
  * in-memory HNSW shard — Qdrant segments, Lucene HNSW segments). Probes
  * touch every partition but only O(ef·M) NODES per partition — the
  * scanned fraction FALLS as the corpus grows (measured in ScaleBench /
  * RecallSpec; ~4-8% at 100k vectors vs the 12.5-50% IVF needs for the
  * same recall). The beam is bounded, the merge is O(parts·ef) rows.
  *
  * Determinism (the gate-row requirement): insertion order is vec_id
  * order, every heap breaks distance ties on vec_id, and the neighbor
  * heuristic is a pure function of (distances, ids) — so the same corpus
  * always yields the same graph and the same probe results, on any
  * cluster layout (GraphIndexSpec asserts build-twice equality).
  */
object GraphIndex {

  /** Sub-graph count. At gate SFs (500-2000 vectors) 4 keeps each
    * sub-graph non-trivial; production builds pass corpus/heap-sized
    * values. */
  val NumParts = 4
  /** Out-degree budget for freshly inserted nodes (HNSW "M"). */
  val M = 24
  /** Hard adjacency cap after reverse-edge insertion (HNSW "Mmax"). */
  val MMax = 48
  /** Construction beam width (HNSW "efConstruction"). */
  val EfC = 96
  /** Vamana RobustPrune relaxation for neighbor selection (1.0 = plain
    * HNSW heuristic). */
  val Alpha = 1.2
  /** Search beam width per sub-graph for production probes — the
    * measured recall@10 >= 0.9 at <= 10% scanned point at 100k vectors
    * (SCALE.md). */
  val EfSearch = 72
  /** Probe-time entry points per sub-graph (insertion-order stride). */
  val Entries = 16
  /** Gate-row beam: wide enough that the walk provably covers the exact
    * top-10 at every gate SF (the oracle is exact cosine top-k). */
  val GateEf = 96

  /** Corpus-adaptive gate beam (r14 sf10 sweep finding): a FIXED gate
    * beam eventually under-covers — at 200k vectors ef=96 missed exactly
    * one exact-top-10 member while ef=192 covered (GateEfProbe,
    * target/sf10). n/500 keeps a 2x margin over that measured threshold
    * and grows the beam with the corpus, while the gate-SF plans are
    * unchanged (the GateEf floor). Beam cost stays trivial next to the
    * exact scan the oracle runs: ef=400 at 200k was 2.0 s vs 3.3 s at
    * ef=96 (wider beams CONVERGE FASTER here — fewer re-expansions). The
    * production serving path keeps [[EfSearch]]: recall there is
    * CI-pinned as approximate by design; this scaling is only for gate
    * rows whose oracle is exact. */
  def gateEf(n: Long): Int =
    math.max(GateEf, math.min(n / 500L, 100000L).toInt)

  /** One probe hit: per-(query, sub-graph) beam result row plus that
    * walk's visited-node count (same value on every hit of the pair). */
  final case class Hit(qid: Long, part: Int, vec_id: Long, score: Double,
      visited: Long)

  // ---------------------------------------------------------------------
  // In-memory kernels (pure; exercised directly by GraphIndexSpec)
  // ---------------------------------------------------------------------

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))

  /** Cosine DISTANCE (1 - cosine similarity; 1.0 for zero-norm vectors,
    * matching the query family's `CASE WHEN nv*nq = 0 THEN 0` score). */
  private def cosDist(a: Array[Double], na: Double,
      b: Array[Double], nb: Double): Double =
    if (na * nb == 0) 1.0 else 1.0 - dot(a, b) / (na * nb)

  /** Greedy beam walk over one sub-graph: standard best-first search
    * with a candidate min-heap and a bounded result set. Returns the
    * top-`ef` node indices ordered by (dist asc, vec_id asc) plus the
    * number of nodes visited (= distance evaluations — the honest
    * "scanned" metric). Ties break on vec_id everywhere. */
  private[search] def beamSearch(vecs: Array[Array[Double]],
      norms: Array[Double], ids: Array[Long], adj: Array[Array[Int]],
      q: Array[Double], qn: Double, ef: Int, entry: Int): (Array[Int], Int) =
    beamSearchMulti(vecs, norms, ids, adj, q, qn, ef, Array(entry))

  /** [[beamSearch]] seeded from SEVERAL entry points — a greedy walk
    * from one basin can converge to a local minimum on large sub-graphs;
    * starting the same bounded beam from a handful of spread-out nodes
    * (insertion-order stride — deterministic) buys a small recall
    * margin (+0.01-0.02 recall@10 at 100k vectors, measured) and
    * guards against sub-regions stranded by reverse-edge pruning on
    * duplicate-heavy corpora, for +16 evals per walk. */
  private[search] def beamSearchMulti(vecs: Array[Array[Double]],
      norms: Array[Double], ids: Array[Long], adj: Array[Array[Int]],
      q: Array[Double], qn: Double, ef: Int,
      entries: Array[Int]): (Array[Int], Int) = {
    val n = vecs.length
    if (n == 0) return (Array.empty, 0)
    val visited = new java.util.BitSet(n)
    // (dist, idx): candidates = nearest-first, results = farthest-first
    val candOrd = Ordering.by[(Double, Int), (Double, Long)] {
      case (d, i) => (-d, -ids(i)) } // PriorityQueue is a max-heap
    val resOrd = Ordering.by[(Double, Int), (Double, Long)] {
      case (d, i) => (d, ids(i)) }
    val cand = mutable.PriorityQueue.empty(candOrd)
    val res = mutable.PriorityQueue.empty(resOrd)
    var nVisited = 0
    entries.foreach { entry =>
      if (!visited.get(entry)) {
        val d0 = cosDist(vecs(entry), norms(entry), q, qn)
        visited.set(entry)
        cand.enqueue((d0, entry)); res.enqueue((d0, entry))
        nVisited += 1
      }
    }
    while (res.size > ef) res.dequeue()
    while (cand.nonEmpty) {
      val (cd, ci) = cand.dequeue()
      // nearest unexpanded candidate is farther than the worst kept
      // result and the beam is full -> the walk has converged
      if (cd > res.head._1 && res.size >= ef) { cand.clear() }
      else {
        val nbrs = adj(ci); var j = 0
        while (j < nbrs.length) {
          val nb = nbrs(j)
          if (!visited.get(nb)) {
            visited.set(nb); nVisited += 1
            val d = cosDist(vecs(nb), norms(nb), q, qn)
            if (res.size < ef || d < res.head._1 ||
                (d == res.head._1 && ids(nb) < ids(res.head._2))) {
              cand.enqueue((d, nb)); res.enqueue((d, nb))
              if (res.size > ef) res.dequeue()
            }
          }
          j += 1
        }
      }
    }
    val ordered: Seq[(Double, Int)] = res.dequeueAll.reverse
    (ordered.map(_._2).toArray, nVisited)
  }

  /** Deterministic spread of probe entry points: [[Entries]] indices
    * strided through insertion order (index 0 — the build entry —
    * always included). */
  private[search] def entryPoints(n: Int, count: Int = Entries): Array[Int] =
    if (n == 0) Array.empty
    else (0 until math.min(count, n)).map(i => i * (n / math.min(count, n))).toArray

  /** Neighbor selection over candidates sorted by (dist-to-q asc,
    * vec_id asc): the HNSW diversity heuristic with Vamana's α
    * relaxation — keep c only if dist(c,q) < α·dist(c,r) for every
    * already-kept r (α=1 is the plain HNSW rule; α>1 keeps some
    * near-dominated edges, which measurably improves the walk's
    * recall-per-visited-node on this corpus — the RobustPrune result),
    * then backfill with the nearest rejected ones if fewer than m
    * survive. Pure function of distances+ids → deterministic. */
  private def selectNeighbors(q: Array[Double], qn: Double,
      cands: Seq[Int], vecs: Array[Array[Double]], norms: Array[Double],
      m: Int, alpha: Double): Array[Int] = {
    val kept = mutable.ArrayBuffer.empty[Int]
    val rejected = mutable.ArrayBuffer.empty[Int]
    val it = cands.iterator
    while (it.hasNext && kept.size < m) {
      val c = it.next()
      val dq = cosDist(vecs(c), norms(c), q, qn)
      val diverse = kept.forall(r =>
        dq < alpha * cosDist(vecs(c), norms(c), vecs(r), norms(r)))
      if (diverse) kept += c else rejected += c
    }
    val fill = rejected.iterator
    while (kept.size < m && fill.hasNext) kept += fill.next()
    kept.toArray
  }

  /** Build one sub-graph's adjacency by sequential beam-insert in array
    * order (callers pass nodes sorted by vec_id). Reverse edges are
    * added eagerly and pruned to [[MMax]] nearest when they overflow. */
  private[search] def buildAdjacency(vecs: Array[Array[Double]],
      norms: Array[Double], ids: Array[Long],
      m: Int = M, mMax: Int = MMax, efC: Int = EfC,
      alpha: Double = Alpha): Array[Array[Int]] = {
    val n = vecs.length
    val adj = Array.fill(n)(Array.empty[Int])
    var i = 1
    while (i < n) {
      // search the graph-so-far: nodes >= i are unwired AND unreachable
      // (no edge references them yet), so the full adj array is safe
      val (found, _) = beamSearchMulti(vecs, norms, ids, adj, vecs(i),
        norms(i), efC, entryPoints(i))
      val sel = selectNeighbors(vecs(i), norms(i), found.toSeq, vecs, norms,
        m, alpha)
      adj(i) = sel
      var j = 0
      while (j < sel.length) {
        val nb = sel(j)
        val widened = adj(nb) :+ i
        adj(nb) =
          if (widened.length <= mMax) widened
          else {
            // overflow: re-select with the same diversity heuristic the
            // forward edges use (plain nearest-mMax keeps redundant
            // near-clones and starves long-range links, measurably
            // hurting walk recall)
            val byDist = widened.sortBy(x =>
              (cosDist(vecs(x), norms(x), vecs(nb), norms(nb)), ids(x)))
            selectNeighbors(vecs(nb), norms(nb), byDist.toSeq, vecs, norms,
              mMax, alpha)
          }
        j += 1
      }
      i += 1
    }
    adj
  }

  // ---------------------------------------------------------------------
  // Distributed build / probe
  // ---------------------------------------------------------------------

  private[search] final case class InNode(vec_id: Long, label: Int,
      embedding: Seq[Double], payload: Option[String], part: Int)
  private[search] final case class GNode(vec_id: Long, label: Int,
      embedding: Seq[Double], payload: Option[String], nbrs: Seq[Long],
      part: Int)

  /** Nodes optionally carry an opaque `payload` string (the Qdrant
    * point-payload model: a hit returns its payload WITH the score, so
    * serving never rejoins the corpus to recover what it already walked
    * past — the r11 O(corpus) candidate→payload recovery fix). Absent on
    * payload-free callers and pre-payload stores; this pads the column
    * in so one schema flows everywhere. */
  private def ensurePayload(df: DataFrame): DataFrame =
    if (df.columns.contains("payload")) df
    else df.withColumn("payload", lit(null).cast("string"))

  private def withPart(emb: DataFrame, numParts: Int): DataFrame =
    ensurePayload(emb).select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("embedding"),
      col("payload"),
      pmod(col("vec_id"), lit(numParts.toLong)).cast("int").as("part"))

  /** One Spark partition's iterator may carry several `part` groups
    * (hash collisions) — build each group's graph independently. */
  private def buildGroups(it: Iterator[InNode], m: Int, mMax: Int,
      efC: Int, alpha: Double): Iterator[GNode] =
    it.toSeq.groupBy(_.part).iterator.flatMap { case (part, rows) =>
      val sorted = rows.sortBy(_.vec_id).toArray
      val vecs = sorted.map(_.embedding.toArray)
      val norms = vecs.map(norm)
      val ids = sorted.map(_.vec_id)
      val adj = buildAdjacency(vecs, norms, ids, m, mMax, efC, alpha)
      sorted.indices.iterator.map { i =>
        GNode(sorted(i).vec_id, sorted(i).label, sorted(i).embedding,
          sorted(i).payload, adj(i).map(ids(_)).toSeq.sorted, part)
      }
    }

  /** Build and persist the partitioned graph: one repartition-by-part
    * shuffle, one in-memory construction task per sub-graph, one file
    * per `part=` partition. */
  def build(emb: DataFrame, path: String, numParts: Int = NumParts,
      m: Int = M, mMax: Int = MMax, efC: Int = EfC,
      alpha: Double = Alpha): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    withPart(emb, numParts).as[InNode]
      // repartitionByRange, NOT hash repartition: murmur(part) mod
      // numParts collides freely (measured at the sf10 8-part build:
      // parts 1/3/7 all landed in ONE task, serializing three sub-graph
      // constructions while three slots sat empty — wall 3x the
      // per-part cost; VERDICT r16 item 5). Ranges keep equal keys
      // together (each sub-graph still wholly in one task) and give
      // distinct values distinct partitions, so the build's wall is ONE
      // sub-graph's cost. The sampling pass it adds is trivial next to
      // construction.
      .repartitionByRange(numParts, col("part"))
      .mapPartitions(it => buildGroups(it, m, mMax, efC, alpha))
      .toDF()
      .write.mode("overwrite").partitionBy("part").parquet(s"$path/graph")
    // persist the node count next to the version stamp: the serving gate
    // (Via.graphServes -> nodeCount) reads it as one tiny file instead of
    // materializing the resident cache — a Via configured for exact
    // serving must not pin the whole graph just to answer the threshold
    // comparison (ADVICE r11)
    writeCount(spark, path,
      spark.read.parquet(s"$path/graph").count())
    bumpVersion(spark, path)
  }

  // ---------------------------------------------------------------------
  // Graph version stamp: `_graph.version` under the index root holds a
  // unique token, rewritten by every [[build]]/[[rebuild]] (i.e. every
  // operation that REPLACES graph content rather than appending next to
  // it). [[probeCached]] checks it per probe, so a rebuild-in-place under
  // a live server invalidates the resident copy instead of silently
  // serving the stale graph (VERDICT r10 "What's wrong" #1). Reading one
  // tiny file per probe is noise next to the walk.
  //
  // The token is RANDOM, not an incremented counter (ADVICE r13): every
  // resident-cache check is stamp EQUALITY, so monotonicity buys nothing,
  // while read-increment-write loses an increment when two mutations race
  // (same JVM or two writer processes) — a probe that cached at the
  // intermediate value would then serve a copy missing the second
  // mutation's rows indefinitely. Two racing random bumps cannot
  // reproduce a stamp any reader may have cached.
  // ---------------------------------------------------------------------

  /** Fresh non-zero positive stamp; 0 stays reserved for "pre-stamp". */
  private def freshStamp(): Long =
    (java.util.concurrent.ThreadLocalRandom.current().nextLong()
      & Long.MaxValue) | 1L

  private def versionFile(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_graph.version")

  /** Current version stamp of the index at `path` (0 for a pre-stamp or
    * freshly created store — probeCached treats any CHANGE as stale). */
  def version(spark: SparkSession, path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val p = versionFile(root)
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      catch { case _: NumberFormatException => 0L }
      finally in.close()
    }
  }

  /** Write a small control file ATOMICALLY: unique temp file + rename
    * OVER the destination. On POSIX-backed local FS the overwriting
    * rename is atomic, so readers see either the old or the new content —
    * never a missing file (parsed as version 0 -> spurious re-cache,
    * ADVICE r11) and never someone else's half-written temp (the r12
    * finding: a FIXED temp name let two concurrent writers publish each
    * other's partial writes; the unique suffix removes the sharing).
    * Only a filesystem that refuses overwriting renames (HDFS) takes the
    * delete-then-rename path, whose window is the rename instant. */
  private def writeControlFile(fs: org.apache.hadoop.fs.FileSystem,
      dest: org.apache.hadoop.fs.Path, value: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dest.getParent,
      s"${dest.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val bytes = value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    try {
      val out = fs.create(tmp, true)
      try out.write(bytes)
      finally out.close()
      // retry the overwriting rename once before touching the
      // destination: a transient failure must not cost readers the file
      // (absence parses as version 0 → spurious re-cache, ADVICE r11/r13)
      if (fs.rename(tmp, dest) || fs.rename(tmp, dest)) return
      // the filesystem refuses overwriting renames (HDFS semantics):
      // clear the destination and retry — the unavoidable absence window
      // is the instant between these two calls
      fs.delete(dest, false)
      if (fs.rename(tmp, dest)) return
      // last resort: write the destination directly. Non-atomic, but a
      // momentarily short read beats leaving NO control file after we
      // just deleted it (readers would re-cache spuriously forever).
      val direct = fs.create(dest, true)
      try direct.write(bytes)
      finally direct.close()
    } finally {
      // failed attempts must not accumulate orphan .tmp files (the
      // unique-name change made each failure leak one); after a
      // successful rename the tmp no longer exists and this is a no-op
      try { if (fs.exists(tmp)) fs.delete(tmp, false) }
      catch { case _: java.io.IOException => }
    }
  }

  private def bumpVersion(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    writeControlFile(fs, versionFile(root), freshStamp().toString)
  }

  // ---------------------------------------------------------------------
  // Buffer version stamp: `_buffer.version` under the index root, bumped
  // by every buffer MUTATION ([[append]], [[appendBatch]], and the
  // [[rebuild]] fold that clears buffer files). The serving path keeps a
  // driver-resident decoded copy of the buffer keyed by this stamp, so a
  // probe against a QUIESCENT store reads one tiny file instead of
  // launching a Spark job + parquet re-read per call (VERDICT r12 item 5
  // — the per-call job-scheduling floor was the dominant serving cost).
  // Mutations bump AFTER their files land, and every mutation verb bumps
  // before returning, so rows are probe-visible at call boundaries — the
  // same freshness contract the per-call re-read gave.
  // ---------------------------------------------------------------------

  private def bufferVersionFile(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_buffer.version")

  /** Current buffer stamp (0 for a store no buffer write has touched). */
  def bufferVersion(spark: SparkSession, path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val p = bufferVersionFile(root)
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      catch { case _: NumberFormatException => 0L }
      finally in.close()
    }
  }

  private def bumpBufferVersion(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // unique token per bump (not read+1): see the graph-stamp comment —
    // two racing mutations each publish a stamp no probe can have cached,
    // so neither bump is ever absorbed into the other (ADVICE r13 medium)
    writeControlFile(fs, bufferVersionFile(root), freshStamp().toString)
  }

  private def countFile(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_graph.count")

  private def writeCount(spark: SparkSession, path: String, n: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    writeControlFile(fs, countFile(root), n.toString)
  }

  private def readCount(spark: SparkSession, path: String): Option[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val p = countFile(root)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      catch { case _: NumberFormatException => None }
      finally in.close()
    }
  }

  /** Beam-walk every sub-graph for every query in ONE corpus pass: the
    * query sample rides as a plain closure constant (bounded, never
    * corpus-sized), each (part, query) walk emits its top-ef hits
    * tagged with that walk's visited count. */
  private def walk(graph: DataFrame, queries: Seq[(Long, Seq[Double])],
      ef: Int): DataFrame = {
    val spark = graph.sparkSession
    import spark.implicits._
    val qArr = queries.map { case (qid, v) =>
      (qid, v.toArray, norm(v.toArray)) }.toArray
    ensurePayload(graph).select(col("vec_id"), col("label"),
        col("embedding"), col("payload"), col("nbrs"), col("part"))
      // REQUIRED, not an optimization: once a part= file outgrows
      // spark.sql.files.maxPartitionBytes the scan splits it at
      // row-group boundaries, and a mapPartitions over the raw read
      // would see each sub-graph as two partial views — half the
      // adjacency silently dropped, wrong hits, no error. Hash
      // partitioning on part puts every sub-graph wholly in one task
      // at any file geometry (GraphIndexSpec pins it under a forced
      // 64 KB split).
      .repartitionByRange(col("part")) // collision-free placement (see build)
      .as[GNode]
      .mapPartitions { it =>
        it.toSeq.groupBy(_.part).iterator.flatMap { case (part, rows) =>
          val sorted = rows.sortBy(_.vec_id).toArray
          val vecs = sorted.map(_.embedding.toArray)
          val norms = vecs.map(norm)
          val ids = sorted.map(_.vec_id)
          val pos = ids.zipWithIndex.toMap
          val adj = sorted.map(_.nbrs.flatMap(pos.get).toArray)
          qArr.iterator.flatMap { case (qid, q, qn) =>
            val (top, visited) = beamSearchMulti(vecs, norms, ids, adj,
              q, qn, ef, entryPoints(ids.length))
            top.iterator.map(i => Hit(qid, part,
              ids(i), 1.0 - cosDist(vecs(i), norms(i), q, qn), visited))
          }
        }
      }
      .toDF()
  }

  // ---------------------------------------------------------------------
  // Incremental growth: the segment model (Lucene/Qdrant). A graph cannot
  // be appended to file-by-file like the bucket indexes — inserting a
  // node means mutating neighbors' adjacency — so fresh vectors land in
  // a BRUTE-FORCE BUFFER next to the graph, probes score the buffer
  // exactly (recall 1.0 for fresh rows by construction) and merge it
  // with the beam hits, and a periodic [[rebuild]] folds the buffer into
  // the sub-graphs. The buffer is small by contract — rebuild before it
  // rivals a sub-graph, the same counterweight cadence as AnnIndex.fold.
  // ---------------------------------------------------------------------

  /** Append fresh vectors to the exact-scored buffer segment. */
  def append(newVectors: DataFrame, path: String): Unit = {
    ensurePayload(newVectors).select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("embedding"),
        col("payload"))
      .write.mode("append").parquet(s"$path/buffer")
    bumpBufferVersion(newVectors.sparkSession, path)
  }

  /** Batch-IDEMPOTENT buffer append — the streaming-maintenance write
    * (the [[AnnIndex.appendBatch]] contract applied to the graph's
    * buffer segment): the deterministic `batchId` becomes a partition
    * level under a SEPARATE `buffer-batches/` dir (separate so the plain
    * un-partitioned `buffer/` files and the partitioned batch dirs never
    * share one store — Spark's partition discovery rejects mixed
    * layouts), written with dynamic partition overwrite, so a replay of
    * batch N rewrites exactly its own `batch_id=N` leaf and doubles
    * nothing. Probes union both buffer dirs; [[rebuild]] folds and
    * clears both (do not rebuild while a crashed stream may still replay
    * a snapshotted batch — the [[AnnIndex.fold]] caveat). */
  def appendBatch(newVectors: DataFrame, path: String, batchId: Long): Unit = {
    ensurePayload(newVectors).select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("embedding"),
        col("payload"),
        lit(batchId).as("batch_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(s"$path/buffer-batches")
    bumpBufferVersion(newVectors.sparkSession, path)
  }

  private def hasDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(p) && fs.listStatus(p).exists(s =>
      (s.isFile && !s.getPath.getName.startsWith("_")) ||
        (s.isDirectory && hasDataFiles(fs, s.getPath)))

  private def bufferDf(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val plain = new org.apache.hadoop.fs.Path(s"$path/buffer")
    val batched = new org.apache.hadoop.fs.Path(s"$path/buffer-batches")
    val parts = Seq(
      // DATA files only: a zero-row append leaves a dir holding just
      // _SUCCESS, and schema inference over it would fail the probe
      if (fs.exists(plain) && fs.listStatus(plain).exists(s =>
          s.isFile && s.getLen > 0 && {
            val n = s.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          }))
        Some(ensurePayload(spark.read.parquet(plain.toString))
          .select(col("vec_id"), col("label"), col("embedding"),
            col("payload")))
      else None,
      if (hasDataFiles(fs, batched))
        Some(ensurePayload(spark.read.parquet(batched.toString))
          .select(col("vec_id"), col("label"), col("embedding"),
            col("payload")))
      else None).flatten
    parts.reduceOption(_.union(_))
  }

  /** Fold the buffer into the sub-graphs: one fresh [[build]] over
    * graph nodes ∪ buffer into a sibling dir, two-rename swap, then
    * delete exactly the buffer files the rebuild SNAPSHOTTED (a
    * concurrent append between snapshot and swap survives in the
    * buffer). A crash between the renames strands `graph` in
    * `_graph.old`; the next [[rebuild]] restores it before doing new
    * work. Probes racing the swap can transiently miss the graph — the
    * same documented window as `Layout.compact`/`AnnIndex.fold`. */
  def rebuild(spark: SparkSession, path: String, numParts: Int = NumParts,
      m: Int = M, mMax: Int = MMax, efC: Int = EfC,
      alpha: Double = Alpha): Unit =
    rebuildImpl(spark, path, numParts, m, mMax, efC, alpha, source = None)

  /** [[rebuild]] from an AUTHORITATIVE external source (the drift-sync
    * counterweight): the new graph is built from `source` alone —
    * existing graph nodes and buffers are NOT unioned in — and the
    * snapshotted buffer files are cleared, because the caller asserts
    * `source` supersedes them (the Tier-2 store is upstream of every
    * index write, so buffered rows are always also store rows; a buffer
    * batch appended AFTER the snapshot survives untouched). Same swap /
    * crash-recovery protocol as [[rebuild]]. */
  def rebuildFrom(spark: SparkSession, source: DataFrame, path: String,
      numParts: Int = NumParts, m: Int = M, mMax: Int = MMax,
      efC: Int = EfC, alpha: Double = Alpha): Unit =
    rebuildImpl(spark, path, numParts, m, mMax, efC, alpha,
      source = Some(source))

  private def rebuildImpl(spark: SparkSession, path: String, numParts: Int,
      m: Int, mMax: Int, efC: Int, alpha: Double,
      source: Option[DataFrame]): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val graphDir = new Path(root, "graph")
    val oldDir = new Path(root, "_graph.old")
    val tmpRoot = new Path(root, "_rebuild.tmp")
    // a fold that died mid-publish must finish before a full rebuild
    // reads the graph/buffer state (its manifest replay is idempotent)
    replayFoldManifest(spark, path)
    // crash recovery: a stranded swap left the graph in _graph.old
    if (!fs.exists(graphDir) && fs.exists(oldDir))
      if (!fs.rename(oldDir, graphDir))
        throw new java.io.IOException(s"rebuild recovery: cannot restore $graphDir")
    fs.delete(oldDir, true); fs.delete(tmpRoot, true)
    // bootstrap: a stream can append buffer batches to a store that has
    // never had a build — the first rebuild materializes the graph from
    // the buffers alone (the from-scratch streaming-maintenance story)
    val hasGraph = fs.exists(graphDir)
    val nodes =
      if (hasGraph)
        ensurePayload(spark.read.parquet(graphDir.toString))
          .select(col("vec_id"), col("label"), col("embedding"),
            col("payload"))
      else {
        import org.apache.spark.sql.types._
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("vec_id", LongType),
            StructField("label", IntegerType),
            StructField("embedding", ArrayType(DoubleType)),
            StructField("payload", StringType))))
      }
    val bufPath = new Path(root, "buffer")
    val bufSnapshot =
      if (fs.exists(bufPath))
        fs.listStatus(bufPath).filter(_.isFile).map(_.getPath).toSeq
      else Seq.empty
    // streamed batches fold too: snapshot whole batch_id= dirs (each is
    // one micro-batch's idempotent write — all-or-nothing by the replay
    // protocol, so dir granularity is the safe unit)
    val batchedPath = new Path(root, "buffer-batches")
    val batchSnapshot =
      if (fs.exists(batchedPath))
        fs.listStatus(batchedPath).filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("batch_id=")).map(_.getPath).toSeq
      else Seq.empty
    val bufParts = Seq(
      if (bufSnapshot.nonEmpty)
        Some(ensurePayload(spark.read.parquet(bufSnapshot.map(_.toString): _*))
          .select(col("vec_id"), col("label"), col("embedding"),
            col("payload")))
      else None,
      if (batchSnapshot.nonEmpty)
        Some(ensurePayload(spark.read.parquet(batchSnapshot.map(_.toString): _*))
          .select(col("vec_id"), col("label"), col("embedding"),
            col("payload")))
      else None).flatten
    if (source.isEmpty && !hasGraph && bufParts.isEmpty)
      return // nothing to build from
    val all = source.map(s => ensurePayload(s)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("embedding"),
          col("payload")))
      .getOrElse(bufParts.foldLeft(nodes)(_.union(_)))
    build(all, tmpRoot.toString, numParts, m, mMax, efC, alpha)
    if (hasGraph && !fs.rename(graphDir, oldDir))
      throw new java.io.IOException(s"rebuild: cannot swap out $graphDir")
    if (!fs.rename(new Path(tmpRoot, "graph"), graphDir)) {
      if (hasGraph && !fs.rename(oldDir, graphDir))
        throw new java.io.IOException(
          s"rebuild: swap-in and restore both failed; graph is in $oldDir " +
            "(next rebuild() recovers)")
      throw new java.io.IOException(s"rebuild: cannot swap in $graphDir" +
        (if (hasGraph) " (restored)" else ""))
    }
    // publish the new graph BEFORE deleting the folded buffer files
    // (ADVICE r11): a concurrent probe between the two steps then either
    // still serves the stale resident graph WITH the buffer (old view —
    // complete) or re-caches the folded graph (new view — complete, any
    // not-yet-deleted buffer rows dedup against the folded nodes); the
    // old order had a window where the stale graph saw an empty buffer
    // and just-folded rows went transiently invisible.
    writeCount(spark, path, spark.read.parquet(graphDir.toString).count())
    bumpVersion(spark, path)
    bufSnapshot.foreach(f => fs.delete(f, false))
    batchSnapshot.foreach(d => fs.delete(d, true))
    // the fold cleared buffer files: invalidate resident buffer copies.
    // A probe racing this window sees either (stale buffer ∪ new graph) —
    // folded rows appear on BOTH sides and the serving merge dedups by
    // vec_id — or the refreshed empty-after-fold buffer; complete either
    // way.
    bumpBufferVersion(spark, path)
    fs.delete(oldDir, true); fs.delete(tmpRoot, true)
  }

  // ---------------------------------------------------------------------
  // Incremental fold (VERDICT r13 item 3): the full [[rebuild]] re-encodes
  // EVERY sub-graph (~1 ms/node of adjacency construction — 26 min at
  // 1.5M rows) even when only the buffer changed. [[foldIncremental]]
  // instead encodes the buffered rows as FRESH sub-graph segments and
  // adds their `part=` dirs next to the existing ones — untouched
  // sub-graphs are never read, moved, or re-encoded (the Lucene/Qdrant
  // segment model: new data becomes a new segment; a periodic full
  // rebuild is the merge/rebalance). Probes need no changes: they walk
  // whatever `part=` dirs exist. Cost is O(buffer) encode + O(1) renames,
  // independent of graph size. Segment growth is capped by the caller
  // (Via.maintainIndexes runs the full rebuild past MaintainMaxSegments),
  // bounding the probe's per-segment overhead.
  //
  // Crash safety is a publish MANIFEST (`_fold.manifest`, written
  // atomically after the segments are fully built): it lists the segment
  // dirs to move in and the snapshotted buffer files to delete. A crash
  // before the manifest leaves only an orphan tmp dir (the buffer is
  // untouched — the next fold redoes the work); a crash after it is
  // REPLAYED by [[replayFoldManifest]] at the next fold/rebuild — each
  // move is skip-if-already-there, each delete idempotent — so folded
  // rows can never be encoded into a second segment. The probe-visible
  // window during publish is the same one rebuild already documents:
  // graph-with-folded-rows ∪ not-yet-deleted buffer, deduped by vec_id
  // at the serving merge.
  // ---------------------------------------------------------------------

  /** Rows per new segment: small enough that one encode task stays
    * seconds-sized, big enough that segments are non-trivial graphs. */
  val SegmentTargetRows = 50000

  private def foldManifestFile(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_fold.manifest")
  private def foldTmpRoot(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_fold.tmp")

  /** Number of persisted sub-graph segments (`part=` dirs). */
  def segmentCount(spark: SparkSession, path: String): Int = {
    val graphDir = new org.apache.hadoop.fs.Path(path, "graph")
    val fs = graphDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(graphDir)) 0
    else fs.listStatus(graphDir).count(s =>
      s.isDirectory && s.getPath.getName.startsWith("part="))
  }

  /** Test seam: die right after the manifest is published (the worst
    * crash point — work built, nothing moved, buffer intact). */
  private[graft] var foldCrashAfterManifest = false

  /** Fold the buffered rows into the graph WITHOUT re-encoding existing
    * sub-graphs: build them as new segments and publish via the fold
    * manifest. Returns true if a fold ran; false when there is no built
    * graph yet (bootstrap belongs to [[rebuild]]) or nothing is buffered.
    * Probe results afterwards are identical to a full [[rebuild]] over
    * the same rows for the exact-rescored gate probes (GraphFoldSpec
    * pins parity). */
  def foldIncremental(spark: SparkSession, path: String,
      targetSegmentRows: Int = SegmentTargetRows, m: Int = M,
      mMax: Int = MMax, efC: Int = EfC, alpha: Double = Alpha): Boolean = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val replayed = replayFoldManifest(spark, path)
    val graphDir = new Path(root, "graph")
    if (!fs.exists(graphDir)) return replayed
    fs.delete(foldTmpRoot(root), true)
    // same snapshot discipline as rebuild: appends racing the fold land
    // in files/dirs outside the snapshot and survive untouched
    val bufPath = new Path(root, "buffer")
    val bufSnapshot =
      if (fs.exists(bufPath))
        fs.listStatus(bufPath).filter(_.isFile).map(_.getPath).toSeq
      else Seq.empty
    val batchedPath = new Path(root, "buffer-batches")
    val batchSnapshot =
      if (fs.exists(batchedPath))
        fs.listStatus(batchedPath).filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("batch_id=")).map(_.getPath).toSeq
      else Seq.empty
    if (bufSnapshot.isEmpty && batchSnapshot.isEmpty) return replayed
    val bufParts = Seq(
      if (bufSnapshot.nonEmpty)
        Some(spark.read.parquet(bufSnapshot.map(_.toString): _*))
      else None,
      if (batchSnapshot.nonEmpty)
        Some(spark.read.parquet(batchSnapshot.map(_.toString): _*))
      else None
    ).flatten.map(df => ensurePayload(df).select(col("vec_id"),
      col("label"), col("embedding").cast("array<double>").as("embedding"),
      col("payload")))
    // rows already in the graph (a crash window replayed an append, or a
    // caller re-appended) must not become a SECOND permanent node: keys
    // are content-derived, so dropping them loses nothing. One
    // column-pruned scan of vec_id only — no embedding IO.
    val graphKeys = spark.read.parquet(graphDir.toString).select("vec_id")
    val fresh = bufParts.reduce(_.union(_))
      .dropDuplicates("vec_id")
      .join(graphKeys, Seq("vec_id"), "left_anti")
      .cache()
    val rows = fresh.count()
    if (rows == 0L) {
      // nothing new — still clear the snapshotted duplicates
      fresh.unpersist()
      bufSnapshot.foreach(f => fs.delete(f, false))
      batchSnapshot.foreach(d => fs.delete(d, true))
      bumpBufferVersion(spark, path)
      return true
    }
    val existingParts = fs.listStatus(graphDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("part=").toInt).toOption)
    val basePart = if (existingParts.isEmpty) 0 else existingParts.max + 1
    val nSegs = math.max(1L,
      (rows + targetSegmentRows - 1) / targetSegmentRows).toInt
    val segParts = (0 until nSegs).map(basePart + _)
    val tmp = foldTmpRoot(root)
    fresh
      .withColumn("part",
        (pmod(col("vec_id"), lit(nSegs.toLong)) + basePart).cast("int"))
      .as[InNode]
      .repartitionByRange(nSegs, col("part")) // collision-free (see build)
      .mapPartitions(it => buildGroups(it, m, mMax, efC, alpha))
      .toDF()
      .write.mode("overwrite").partitionBy("part").parquet(s"$tmp/graph")
    fresh.unpersist()
    // publish point: everything after this line is replayable
    writeControlFile(fs, foldManifestFile(root),
      (segParts.map(p => s"seg $p") ++
        bufSnapshot.map(f => s"delfile $f") ++
        batchSnapshot.map(d => s"deldir $d")).mkString("\n"))
    if (foldCrashAfterManifest) return true
    replayFoldManifest(spark, path)
    true
  }

  /** Replay (or execute for the first time) a published fold manifest:
    * move each built segment in unless it already arrived, finish the
    * buffer deletes, refresh count/version stamps, then clear the
    * manifest. Idempotent; returns whether a pending manifest was
    * replayed (no-op false when none exists). */
  private def replayFoldManifest(spark: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val manifest = foldManifestFile(root)
    if (!fs.exists(manifest)) return false
    val graphDir = new Path(root, "graph")
    val tmp = foldTmpRoot(root)
    val in = fs.open(manifest)
    val lines =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).split("\n").toSeq
      finally in.close()
    lines.foreach { line =>
      line.split(" ", 2) match {
        case Array("seg", p) =>
          val dest = new Path(graphDir, s"part=${p.trim}")
          val src = new Path(new Path(tmp, "graph"), s"part=${p.trim}")
          if (!fs.exists(dest)) {
            if (!fs.exists(src) || !fs.rename(src, dest))
              throw new java.io.IOException(
                s"fold replay: segment ${p.trim} is in neither $tmp nor $graphDir")
          }
        case Array("delfile", f) => fs.delete(new Path(f.trim), false)
        case Array("deldir", d) => fs.delete(new Path(d.trim), true)
        case _ => ()
      }
    }
    // same publish order as rebuild: count+version before the buffer
    // stamp, so a racing probe always sees a complete view
    writeCount(spark, path, spark.read.parquet(graphDir.toString).count())
    bumpVersion(spark, path)
    bumpBufferVersion(spark, path)
    fs.delete(manifest, false)
    fs.delete(tmp, true)
    true
  }

  /** Probe a persisted graph for one query: beam-walk all sub-graphs,
    * brute-force the buffer segment (exact by construction), merge,
    * exact-cosine score (same `cosineToConst` arithmetic as
    * `cosine_topk`) over the bounded candidate set. */
  def probe(spark: SparkSession, path: String,
      q: Seq[Double] = graft.queries.VectorOps.Q,
      k: Int = 10, ef: Int = EfSearch): DataFrame = {
    val graph = spark.read.parquet(s"$path/graph")
    val hits = walk(graph, Seq(0L -> q), ef).select(col("vec_id"))
    bufferDf(spark, path) match {
      case None => scoreHits(graph, hits, q, k)
      case Some(buf) =>
        // every buffer row is a candidate; the union source lets
        // scoreHits resolve both segments' embeddings
        scoreHits(
          graph.select(col("vec_id"), col("label"), col("embedding"))
            .union(buf.select(col("vec_id"), col("label"), col("embedding"))),
          hits.union(buf.select(col("vec_id"))), q, k)
    }
  }

  // path -> (version, executor-resident graph relation). A plain probe
  // re-reads the parquet store per query even though the walk VISITS a
  // few percent of nodes — fine for batch jobs, wasteful for serving.
  // This is the Qdrant/Lucene "segments stay resident" contract expressed
  // as a cached relation (ScaleBench measures the per-query read it
  // avoids). The version stamp makes rebuild-in-place safe: a probe that
  // sees a newer `_graph.version` drops the stale resident copy and
  // re-caches (GraphIndexSpec pins rebuild → fresh results).
  private final case class Resident(version: Long, graph: DataFrame,
      count: Long)
  private val resident =
    new java.util.concurrent.ConcurrentHashMap[String, Resident]()

  private def residentFor(spark: SparkSession, path: String): Resident = {
    val v = version(spark, path)
    resident.compute(path, (p, old) =>
      if (old != null && old.version == v) old
      else {
        if (old != null) {
          old.graph.unpersist()
          dropDecoded(p)
        }
        // cached POST-shuffle: the walk's repartition-by-part runs once
        // at materialization; every later probe iterates the cached
        // partitions with no exchange (and, via the decoded-segment
        // cache below, without even deserializing rows)
        val g = ensurePayload(spark.read.parquet(s"$p/graph"))
          .select(col("vec_id"), col("label"), col("embedding"),
            col("payload"), col("nbrs"), col("part"))
          .repartitionByRange(col("part")).cache() // collision-free (see build)
        Resident(v, g, g.count())
      })
  }

  // ---------------------------------------------------------------------
  // Decoded-segment serving cache (the Qdrant/Lucene "open searcher"):
  // a probe over the resident RELATION still deserializes every row and
  // rescans per call — fine for batch gate rows, but ServeBench measured
  // it dominating serving p50 (~2 s/call at 150k×384-d). Sub-graphs are
  // therefore decoded ONCE per (path, version, partition) into plain
  // arrays held executor-locally; later probes walk the arrays and never
  // consume the row iterator (Spark's cached scan materializes nothing
  // that is not consumed). Keyed by partition id — stable because the
  // resident relation's hash partitioning is deterministic and cached.
  // Version changes drop a path's entries (driver side mirrors this via
  // dropDecoded; executors key by version, so stale entries are simply
  // never hit again and are evicted by key replacement).
  // ---------------------------------------------------------------------

  private final class SubGraph(val vecs: Array[Array[Double]],
      val norms: Array[Double], val ids: Array[Long],
      val adj: Array[Array[Int]], val payloads: Array[String])
  private final class DecodedPart(val subs: Array[SubGraph])
  // keyed by (path, partitionId); the VALUE carries the version, so a
  // rebuild's first probe REPLACES each stale entry instead of leaving
  // it stranded under a dead key (no unbounded growth across rebuilds)
  private val decoded = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), (Long, DecodedPart)]()

  private def dropDecoded(path: String): Unit = {
    val it = decoded.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == path) it.remove()
  }

  private def decodePart(it: Iterator[GNode]): DecodedPart =
    new DecodedPart(it.toSeq.groupBy(_.part).valuesIterator.map { rows =>
      val sorted = rows.sortBy(_.vec_id).toArray
      val vecs = sorted.map(_.embedding.toArray)
      val norms = vecs.map(norm)
      val ids = sorted.map(_.vec_id)
      val pos = ids.zipWithIndex.toMap
      val adj = sorted.map(_.nbrs.flatMap(pos.get).toArray)
      new SubGraph(vecs, norms, ids, adj, sorted.map(_.payload.orNull))
    }.toArray)

  /** Serving-path candidate generation: top-`k` (vec_id, walk-score)
    * candidates for `q` from the decoded resident segments, MERGED BY
    * SCORE with the exact-scored buffer segment. One job per side; after
    * the first probe per (path, version) the graph-side per-call work is
    * the beam walks themselves — no shuffle, no row deserialization, no
    * rescoring join. Scores here are full-vector cosine on BOTH sides
    * (candidate selection only — callers re-score candidates with their
    * own exact expressions), so the merge is a fair single top-k and the
    * result is bounded by `k` REGARDLESS of buffer size: the previous
    * form collected every buffered vec_id per probe, so a neglected
    * store (no rebuild) degraded every serving call linearly in buffer
    * rows (VERDICT r11 collect audit). Fresh rows keep exact recall
    * within the top-k contract — a buffer row in the true cosine top-k
    * always survives the merge, because its own score is exact and
    * graph-side scores are true cosines of other rows. The buffer side
    * is DRIVER-RESIDENT behind the `_buffer.version` stamp (r13): a
    * quiescent store pays one tiny stamp read and an in-process scoring
    * loop — zero Spark jobs — and only a mutation (append/fold) re-reads
    * the parquet; an oversized buffer declines to the per-call job path
    * (still k-bounded). */
  def servingCandidates(spark: SparkSession, path: String,
      q: Seq[Double], k: Int, ef: Int = EfSearch): Seq[Long] =
    servingHits(spark, path, q, k, ef).map(_.vec_id)

  /** One serving-path hit: candidate id, walk score (full-vector
    * cosine), the node's stored payload (null on payload-free stores),
    * and its embedding — everything a serving verb needs to rebuild the
    * row WITHOUT rejoining the corpus (the Qdrant hit-with-payload
    * contract; the r11 weak-mark fix). */
  final case class ServingHit(vec_id: Long, score: Double,
      payload: String, embedding: Array[Float])

  /** Node embedding → the STORE's float dtype for the hit (exact: the
    * graph's doubles were cast up from the store's floats). Floats also
    * halve the per-call collect bytes, and a primitive array avoids the
    * encoder materializing each vector as a boxed List — indexed access
    * over those measured O(n²) in the driver ranker (r16). */
  private def toStoreFloats(v: Array[Double]): Array[Float] = {
    val f = new Array[Float](v.length)
    var i = 0
    while (i < v.length) { f(i) = v(i).toFloat; i += 1 }
    f
  }

  // ---------------------------------------------------------------------
  // Driver-resident buffer segment (VERDICT r12 item 5): the buffer was
  // re-read from parquet WITH a Spark job on every serving probe — the
  // job-scheduling floor, not the math, dominated serving latency once
  // the graph side went resident. The buffer is small by the rebuild-
  // cadence contract (Via.MaintainBufferRatio), so its decoded rows live
  // on the driver keyed by the `_buffer.version` stamp: a probe against
  // a quiescent store scores it in-process — zero Spark jobs on the
  // buffer side. Oversized buffers (maintenance overdue) decline to the
  // per-call job path, never to wrong answers.
  // ---------------------------------------------------------------------

  /** Buffer rows above which the serving path declines to hold the
    * buffer driver-resident (conf
    * `spark.graft.serve.residentBufferMaxRows`): ~3 KB/row at 384-d puts
    * the default's ceiling at ~300 MB of driver heap. */
  val DefaultResidentBufferMaxRows = 100000L

  private final class ResidentBuffer(val version: Long,
      val ids: Array[Long], val vecs: Array[Array[Double]],
      val norms: Array[Double], val payloads: Array[String]) {
    def declined: Boolean = ids == null
  }
  /** Paths held resident at once (each entry can be ~300 MB of decoded
    * vectors at the default row cap, and nothing else evicts a store the
    * session stopped serving — bench/test sessions create many temp
    * stores). Past the cap the LEAST-RECENTLY-PROBED path is released
    * (ADVICE r13 / VERDICT r13 item 4: the old whole-map clear() made a
    * session cycling >8 stores re-read even its hot ones). */
  private val ResidentBufferMaxPaths = 8

  // access-ordered LRU under its own tiny lock. The lock guards MAP OPS
  // ONLY — the parquet re-read + collect that builds an entry runs
  // outside it (ADVICE r13: compute() held the bin lock across a Spark
  // job, blocking concurrent probes of other stores that hash-collided).
  private val residentBuffers =
    new java.util.LinkedHashMap[String, ResidentBuffer](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, ResidentBuffer]): Boolean =
        size() > ResidentBufferMaxPaths
    }

  /** Test seam (eviction spec): paths currently in the resident-buffer
    * LRU, least-recently-probed first. */
  private[graft] def residentBufferPaths: Seq[String] =
    residentBuffers.synchronized {
      import scala.jdk.CollectionConverters._
      residentBuffers.keySet().asScala.toSeq
    }

  private def residentBufferFor(spark: SparkSession,
      path: String): ResidentBuffer = {
    val bv = bufferVersion(spark, path)
    residentBuffers.synchronized {
      val old = residentBuffers.get(path)
      if (old != null && old.version == bv) return old
    }
    // (re)build OUTSIDE the lock. Two threads may both build after a
    // version change; last put wins and both copies are correct for the
    // stamp they read (files land before the bump, so rows read under a
    // stamp are complete for it).
    val fresh = loadResidentBuffer(spark, path, bv)
    residentBuffers.synchronized { residentBuffers.put(path, fresh) }
    fresh
  }

  private def loadResidentBuffer(spark: SparkSession, path: String,
      bv: Long): ResidentBuffer = {
    val maxRows =
      try spark.conf.get("spark.graft.serve.residentBufferMaxRows",
        DefaultResidentBufferMaxRows.toString).toLong
      catch { case _: Exception => DefaultResidentBufferMaxRows }
    bufferDf(spark, path) match {
      case None => new ResidentBuffer(bv, Array.empty[Long],
        Array.empty[Array[Double]], Array.empty[Double],
        Array.empty[String])
      case Some(b) =>
        // limit+1 bounds the collect AND detects overflow without a
        // separate count job
        val lim = (math.min(math.max(maxRows, 0L), 10000000L) + 1L).toInt
        val rows = b.select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"),
            col("payload"))
          .limit(lim).collect()
        if (rows.length >= lim)
          new ResidentBuffer(bv, null, null, null, null) // declined
        else {
          val vecs = rows.map(_.getSeq[Double](1).toArray)
          new ResidentBuffer(bv, rows.map(_.getLong(0)), vecs,
            vecs.map(norm),
            rows.map(r => if (r.isNullAt(2)) null else r.getString(2)))
        }
    }
  }

  /** [[servingCandidates]] returning payload + embedding with each hit:
    * the per-call collect is O(parts·ef + k) ROWS — independent of both
    * corpus and buffer size — and a caller that consumes the payloads
    * never touches the corpus relation again. */
  def servingHits(spark: SparkSession, path: String,
      q: Seq[Double], k: Int, ef: Int = EfSearch): Seq[ServingHit] = {
    import spark.implicits._
    val res = residentFor(spark, path)
    val v = res.version
    val qA = q.toArray; val qn = norm(qA)
    val hits = res.graph.as[GNode].mapPartitions { it =>
      val key = (path, org.apache.spark.TaskContext.getPartitionId())
      val cur = decoded.get(key)
      val d =
        if (cur != null && cur._1 == v) cur._2
        else { val nd = decodePart(it); decoded.put(key, (v, nd)); nd }
      d.subs.iterator.flatMap { sg =>
        val (top, _) = beamSearchMulti(sg.vecs, sg.norms, sg.ids, sg.adj,
          qA, qn, ef, entryPoints(sg.ids.length))
        top.iterator.map(i => ServingHit(sg.ids(i),
          1.0 - cosDist(sg.vecs(i), sg.norms(i), qA, qn),
          sg.payloads(i), toStoreFloats(sg.vecs(i))))
      }
    }.collect()
    val rb = residentBufferFor(spark, path)
    val bufHits: Array[ServingHit] =
      if (!rb.declined) {
        // exact cosine per resident row IN-PROCESS — zero Spark jobs on
        // a quiescent store. Same arithmetic as the job path's
        // CosineConstExpr (dot / (‖v‖·‖q‖); 0 for a zero-norm side;
        // dimension-mismatched rows score null there and sort last, so
        // skipping them here is order-identical within the top-k), same
        // (score desc, vec_id) tie order.
        rb.ids.indices.iterator
          .filter(i => rb.vecs(i).length == qA.length)
          .map { i =>
            val s =
              if (qn == 0.0 || rb.norms(i) == 0.0) 0.0
              else dot(rb.vecs(i), qA) / (rb.norms(i) * qn)
            ServingHit(rb.ids(i), s, rb.payloads(i), toStoreFloats(rb.vecs(i)))
          }
          .toArray.sortBy(h => (-h.score, h.vec_id)).take(k)
      } else bufferDf(spark, path) match {
        case None => Array.empty[ServingHit]
        case Some(b) =>
          // oversized buffer (maintenance overdue): exact cosine per
          // buffered row, top-k INSIDE the job — the collect is <= k
          // rows whatever the buffer has grown to
          b.select(col("vec_id"),
              cosineToConst(col("embedding").cast("array<double>"), q).as("s"),
              col("payload"),
              col("embedding").cast("array<float>").as("embedding"))
            // dimension-mismatched rows score NULL; drop them like the
            // resident path does (they could otherwise enter the top-k
            // of an under-filled buffer and crash the Double decode)
            .filter(col("s").isNotNull)
            .orderBy(col("s").desc, col("vec_id"))
            .limit(k)
            .as[(Long, Double, String, Array[Float])].collect()
            .map { case (id, s, p, e) => ServingHit(id, s, p, e) }
      }
    val seen = mutable.Set.empty[Long]
    (hits ++ bufHits).sortBy(h => (-h.score, h.vec_id))
      .iterator.filter(h => seen.add(h.vec_id)).take(k).toSeq
  }

  // (path, version) -> node count, for pre-count-stamp stores only (one
  // plain parquet count per version, never a resident materialization)
  private val countedOnce =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Long]()

  /** Node count of the persisted graph at `path` (buffer excluded), or
    * None when no graph has been built there yet. Serving callers use
    * this as the corpus-size gate, so it must stay CHEAP AND PASSIVE: it
    * reads the `_graph.count` stamp build/rebuild persist (one tiny
    * file), never touching the resident cache — a Via configured for
    * exact serving (threshold = MaxValue) must not pin the whole graph
    * in executor memory just to answer the gate (ADVICE r11). A
    * pre-stamp store falls back to one plain (uncached) parquet count
    * per version, memoized. */
  def nodeCount(spark: SparkSession, path: String): Option[Long] = {
    val g = new org.apache.hadoop.fs.Path(s"$path/graph")
    val fs = g.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(g)) None
    else readCount(spark, path).orElse {
      val key = (path, version(spark, path))
      Some(countedOnce.computeIfAbsent(key,
        _ => spark.read.parquet(g.toString).count()))
    }
  }

  /** Rows sitting in the exact-scored buffer segments awaiting a
    * [[rebuild]] fold (0 when empty) — the maintenance-policy signal. */
  def bufferRows(spark: SparkSession, path: String): Long =
    bufferDf(spark, path).map(_.count()).getOrElse(0L)

  /** Distinct keys the index covers across BOTH segments (graph ∪
    * buffer) — the drift-detection signal `Via.maintainIndexes` compares
    * against the store's own key count. A full count (not the stamp):
    * drift detection is exactly the place a cheap cached answer would
    * lie. Maintenance-cadence cost. */
  def indexedKeyCount(spark: SparkSession, path: String): Long = {
    val g = new org.apache.hadoop.fs.Path(s"$path/graph")
    val fs = g.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = Seq(
      if (fs.exists(g)) Some(spark.read.parquet(g.toString)
        .select(col("vec_id"))) else None,
      bufferDf(spark, path).map(_.select(col("vec_id")))).flatten
    parts.reduceOption(_.union(_)).map(_.distinct().count()).getOrElse(0L)
  }

  /** [[probe]] against an executor-resident copy of the graph (cached on
    * first use per JVM, re-cached when the stamp a [[build]]/[[rebuild]]
    * bumps changes) — the serving-path form. The brute-force append
    * buffer is merged exactly like [[probe]] does, so streamed appends
    * are probe-visible without waiting for a rebuild; the buffer read is
    * per-probe (it mutates between probes) but small by the rebuild-
    * cadence contract. */
  def probeCached(spark: SparkSession, path: String,
      q: Seq[Double] = graft.queries.VectorOps.Q,
      k: Int = 10, ef: Int = EfSearch): DataFrame = {
    val graph = residentFor(spark, path).graph
    val hits = walk(graph, Seq(0L -> q), ef).select(col("vec_id"))
    bufferDf(spark, path) match {
      case None => scoreHits(graph, hits, q, k)
      case Some(buf) =>
        scoreHits(
          graph.select(col("vec_id"), col("label"), col("embedding"))
            .union(buf.select(col("vec_id"), col("label"), col("embedding"))),
          hits.union(buf.select(col("vec_id"))), q, k)
    }
  }

  /** Inline (no persistence) form for the gate row: partition, build
    * each sub-graph, walk it for the pinned query, all in one
    * mapPartitions — then score candidates with the shared cosine
    * expression so the arithmetic is identical to `cosine_topk`'s. */
  def inlineTopK(emb: DataFrame, q: Seq[Double], k: Int,
      numParts: Int = NumParts, ef: Int = GateEf): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val qA = q.toArray; val qn = norm(qA)
    val hits = withPart(emb, numParts).as[InNode]
      .repartitionByRange(numParts, col("part")) // collision-free (see build)
      .mapPartitions { it =>
        it.toSeq.groupBy(_.part).iterator.flatMap { case (part, rows) =>
          val sorted = rows.sortBy(_.vec_id).toArray
          val vecs = sorted.map(_.embedding.toArray)
          val norms = vecs.map(norm)
          val ids = sorted.map(_.vec_id)
          val adj = buildAdjacency(vecs, norms, ids)
          val (top, visited) = beamSearchMulti(vecs, norms, ids, adj, qA,
            qn, ef, entryPoints(ids.length))
          top.iterator.map(i => Hit(0L, part, ids(i),
            1.0 - cosDist(vecs(i), norms(i), qA, qn), visited))
        }
      }
      .toDF()
    scoreHits(emb, hits, q, k)
  }

  /** Exact-cosine rescoring of a bounded candidate set against the
    * source relation — keeps gate arithmetic byte-identical to the
    * exact-scan family regardless of kernel float order. */
  private def scoreHits(source: DataFrame, hits: DataFrame, q: Seq[Double],
      k: Int): DataFrame = {
    source.join(hits.select(col("vec_id")).distinct(), "vec_id")
      .select(col("vec_id"), col("label"),
        round(cosineToConst(col("embedding").cast("array<double>"), q), 6)
          .as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-query (qid, vec_id) top-k over a persisted graph for a query
    * SAMPLE — the [[RecallEval]] entry point. Also returns nothing
    * about scan cost; use [[scanStats]] on the same walk for that. */
  def topKMany(graph: DataFrame, queries: Seq[(Long, Seq[Double])],
      k: Int, ef: Int = EfSearch): DataFrame = {
    val spark = graph.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id").asc)
    walk(graph, queries, ef)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
  }

  // dir → built index path: the gate query pays the build once per JVM
  // and every later invocation is probe-only — the same build-once/
  // probe-many cost profile AnnIndex.indexFor / TextIndex.indexFor give
  // their gate rows, and the only honest way to bench an index.
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Sub-graph count per [[NodesPerPart]] nodes — the sizing a
    * deployment does by hand (SCALE.md: "numParts is the one knob"),
    * applied automatically where the engine builds for itself: build
    * parallelism IS the sub-graph count (beam inserts are sequential
    * within one), so a fixed 4 leaves a 200k-vector build at ~1 ms/node
    * on 4 of 32 cores. More parts can only improve gate coverage — the
    * probe walks EVERY sub-graph with the same beam and merges, so
    * candidates grow with parts — while serving latency pays per part,
    * hence the cap. r17 measured the trade at sf10 (200k vectors):
    * 25000 nodes/part (8 parts) built in 73 s and probed at 1.14 s;
    * 6250 (32 parts) built in 16.5 s AND probed at 0.87 s — the walk
    * parallelizes per part too, so on this core count denser parts win
    * BOTH sides until parts exceed cores (the 64 cap). Construction is
    * CPU-bound beam insertion (~2.9 ms/node at 25k nodes, superlinear in
    * part size), so part size is the build-latency knob a deployment
    * tunes to its rebuild budget. */
  val NodesPerPart = 6250L

  def adaptiveParts(n: Long): Int =
    math.max(NumParts, math.min(64L, (n + NodesPerPart - 1) / NodesPerPart)).toInt

  /** Graph index for the embeddings table under `dir`, building on
    * first use (per JVM); sub-graph count sized from the corpus
    * ([[adaptiveParts]] — identical to the old fixed default at gate
    * SFs, 8 parts at the sf10 sweep's 200k vectors). */
  def indexFor(spark: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Files.createTempDirectory("graphidx").toString
      val emb = graft.Tables.embeddings(spark, dir)
      build(emb, p, numParts = adaptiveParts(emb.count()))
      p
    })

  /** Mean fraction of the corpus VISITED per query (distance
    * evaluations / corpus size) — the honest scanned-fraction metric
    * the recall floors are conditioned on. */
  def scanStats(graph: DataFrame, queries: Seq[(Long, Seq[Double])],
      ef: Int = EfSearch): Double = {
    val n = graph.count().toDouble
    val visits = walk(graph, queries, ef)
      .groupBy(col("qid"), col("part"))
      .agg(first(col("visited")).as("v"))
      .groupBy(col("qid")).agg(sum(col("v")).as("pv"))
      .agg(avg(col("pv"))).head().getDouble(0)
    visits / n
  }
}
