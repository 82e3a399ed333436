package graft.search

import graft.functions.VectorFunctions.matVec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lloyd's k-means over an embedding column, spherical variant (cosine
  * assignment, unit-renormalized mean update) — the trainer behind
  * [[IvfIndex]]'s coarse quantizer. The reference delegates this to
  * Qdrant's HNSW graph build (`/root/reference/app/services/
  * qdrant_service.py:44-95`); an IVF engine has to earn its recall by
  * training the centroids instead, and RecallSpec measures exactly what
  * untrained seed rows cost (uniform recall@10 0.28 at nprobe=2).
  *
  * Scale shape (the `dedup_clusters` fixpoint discipline applied to
  * training):
  *   - The model state is k×dim doubles — index METADATA, bounded by
  *     nlist, never corpus-sized. It rides to executors as a constant
  *     matrix inside one [[matVec]] kernel (no crossJoin explosion: the
  *     per-row work is one fused mat·vec, so an iteration is ONE corpus
  *     scan), and comes back as k partial-sum rows via a map-side
  *     combined aggregate. Collecting k rows per iteration is the same
  *     bounded-metadata move as `IvfIndex.probe`'s nprobe centroid ids.
  *   - Iterations are driver-sequenced with a hard cap ([[MaxIters]])
  *     and a measured convergence observation (max centroid drift),
  *     so the loop cannot run away on a pathological corpus.
  *   - Assignment ties break to the lowest cid — the same rule as
  *     `ann_ivf` / `IvfIndex.build`, so a corpus assigned with the
  *     trained centroids reproduces training's own partition.
  *
  * Determinism: seeding is by explicit vec_id list (stride-spread over
  * the corpus when not given), arithmetic is fixed-order sequential
  * folds ([[matVec]] ascending-index, `sum` over a deterministic
  * partial-agg tree of per-dimension doubles) — retraining on the same
  * input yields the same centroids up to float summation order of the
  * shuffle combine; RecallSpec floors carry margin for that.
  */
object KMeans {

  val MaxIters = 25

  /** Trained model: unit-norm centroids indexed by cid = 0..k-1, the
    * iteration count actually used, and the final max drift (cosine
    * distance old→new at the last step — 0.0 means a true fixpoint). */
  case class Trained(centroids: Seq[Seq[Double]], iters: Int,
      finalShift: Double) {
    def toDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      centroids.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("cid", "cvec")
    }
  }

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Train k spherical centroids on `emb` (columns `vec_id`,
    * `embedding`). One corpus scan per iteration; stops at [[MaxIters]]
    * or when no centroid moves more than `tol` in cosine distance. */
  def train(emb: DataFrame, k: Int, dim: Int = 64,
      maxIters: Int = MaxIters, tol: Double = 1e-6,
      seedIds: Option[Seq[Long]] = None): Trained = {
    val spark = emb.sparkSession
    import spark.implicits._

    // Deterministic BOUNDED seeding: explicit ids, else farthest-point
    // selection over a hash-ordered candidate sample (k·8 rows via ONE
    // TakeOrdered — k·8 × dim doubles to the driver, never the corpus:
    // collecting every vec_id to stride over it would be O(corpus)
    // driver memory, against the bounded-metadata discipline this
    // trainer documents). The hash order is a pseudo-uniform draw
    // decorrelated from insertion order and id clustering; the greedy
    // max-min-distance sweep then spreads the k seeds like k-means++
    // (deterministic: total order on (hash, id), fixed first pick).
    val ids: Seq[Long] = seedIds.getOrElse {
      val m = math.max(k * 8, 256)
      val cand = emb.select($"vec_id", $"embedding")
        .orderBy(pmod(hash($"vec_id"), lit(1000000007L)), $"vec_id")
        .limit(m)
        .collect()
        .map(r => r.getLong(0) -> unit(r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray))
      require(cand.length >= k, s"k-means: k=$k > ${cand.length} vectors")
      def cosDist(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); i += 1 }
        1.0 - d
      }
      val chosen = scala.collection.mutable.ArrayBuffer(0)
      // `taken` excludes chosen indices from the argmax: duplicate-heavy
      // corpora (the NORMAL input of a dedup engine) and zero vectors
      // (cosDist 1.0 to everything, themselves included) make every
      // remaining min-distance tie with a chosen point's, and an
      // unguarded argmax would re-select the same index — duplicate seed
      // ids, isin resolving < k rows, and the require below aborting
      // training (ADVICE r9). Ties among UNchosen candidates still break
      // by candidate order (strict `>` keeps the first max), so the
      // sweep stays deterministic; cand holds distinct vec_ids and
      // cand.length >= k, so k distinct indices always exist.
      val taken = new Array[Boolean](cand.length)
      taken(0) = true
      val minDist = Array.tabulate(cand.length)(i =>
        cosDist(cand(i)._2, cand(0)._2))
      while (chosen.length < k) {
        var best = -1; var bestD = -1.0
        var i = 0
        while (i < cand.length) {
          if (!taken(i) && minDist(i) > bestD) { bestD = minDist(i); best = i }
          i += 1
        }
        chosen += best
        taken(best) = true
        i = 0
        while (i < cand.length) {
          val d = cosDist(cand(i)._2, cand(best)._2)
          if (d < minDist(i)) minDist(i) = d
          i += 1
        }
      }
      chosen.map(cand(_)._1).toSeq
    }
    var cents: Array[Array[Double]] = emb
      .filter($"vec_id".isin(ids: _*))
      .orderBy($"vec_id")
      .select($"embedding").collect()
      .map(r => unit(r.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray))
    require(cents.length == k, s"k-means: seed ids resolved ${cents.length} != $k rows")

    var iter = 0
    var shift = Double.MaxValue
    while (iter < maxIters && shift > tol) {
      // assignment = argmax_j centroid_j · v  (centroids unit-norm, so
      // the ordering equals cosine ordering; array_position on the max
      // returns the FIRST hit = lowest cid on ties)
      val rows: Seq[Seq[Double]] = cents.map(_.toSeq).toSeq
      val scored = emb.select($"vec_id", $"embedding",
        matVec($"embedding", rows).as("cs"))
        .withColumn("cid", (array_position($"cs", array_max($"cs")) - 1L).cast("long"))
      // per-cluster mean: k rows of dim partial sums, map-side combined
      val sums = scored.groupBy($"cid").agg(
        count(lit(1)).as("n"),
        array((1 to dim).map(i =>
          sum(element_at($"embedding", i).cast("double"))): _*).as("s"))
        .collect()
      val next = cents.clone()
      sums.foreach { r =>
        val cid = r.getLong(0).toInt
        val n = r.getLong(1)
        if (n > 0 && cid >= 0 && cid < k) {
          val mean = r.getSeq[Double](2).map(_ / n).toArray
          val u = unit(mean)
          if (u.exists(_ != 0.0)) next(cid) = u // degenerate mean: keep old
        }
      }
      shift = cents.indices.map { i =>
        1.0 - cents(i).zip(next(i)).map { case (a, b) => a * b }.sum
      }.max
      cents = next
      iter += 1
    }
    Trained(cents.map(_.toSeq), iters = iter, finalShift = shift)
  }
}
