package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector / similarity operators (SURVEY §2.5) as pure `Column` expressions.
  *
  * All of these compose Spark built-ins (`zip_with`, `aggregate`,
  * `bit_count`, ...) so they run inside WholeStageCodegen with no UDF
  * serialization cost, and scale linearly with partitioning: a cosine top-k
  * over 100 TB of embeddings is scan → per-row score → TakeOrderedAndProject
  * (no shuffle except the final k-row merge on the driver).
  *
  * Reference semantics:
  *  - dense cosine KNN: `/root/reference/app/services/forensic_analysis_service.py:30-53`
  *  - 64-d binary DOT / Hamming: `/root/reference/app/services/qdrant_service.py:49-58`
  *  - recommend (avg-vector strategy): `forensic_analysis_service.py:75-96`
  */
object VectorFunctions {

  /** Dot product of two float/double array columns (element-wise, summed in
    * index order — deterministic, matches a sequential-loop oracle). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; 0.0 when either vector has zero norm (declared
    * semantics for the reference's zero-vector search — SURVEY §7.5.3). */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Cosine against a constant query vector, with norms constant-folded. */
  def cosineToConst(v: Column, q: Seq[Double]): Column = {
    val qn = math.sqrt(q.map(x => x * x).sum)
    if (qn == 0.0) lit(0.0)
    else {
      val qCol = array(q.map(lit): _*)
      val d = dot(v, qCol)
      val nv = l2Norm(v)
      when(nv === 0.0, lit(0.0)).otherwise(d / (nv * lit(qn)))
    }
  }

  /** Pack the sign pattern of the first 63 dims of a float vector into a
    * non-negative LongType bitset (bit i set iff v[i] > 0). This is the
    * engine's "binary quantization": exact, 8 bytes/vector, always-RAM —
    * the Spark analogue of Tier-1's 64-bit fingerprints. 63 bits keeps the
    * value in signed-positive range for cross-engine (DuckDB) parity. */
  def packSignBits63(v: Column): Column = packSignBits(v, 63)

  /** Sign-bit packing of the first `bits` dims (LSH bucket key when small). */
  def packSignBits(v: Column, bits: Int): Column =
    aggregate(
      zip_with(slice(v, 1, bits), sequence(lit(0), lit(bits - 1)),
        // 2^i via pow is exact for i <= 62 (powers of two are exact doubles)
        (x, i) => when(x > 0.0f, pow(lit(2.0), i).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Hamming distance between two packed bitsets. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Binary DOT similarity (count of shared set bits). */
  def bitDot(a: Column, b: Column): Column = bit_count(a.bitwiseAND(b))

  /** Element-wise average of an array column as an aggregate expression
    * producing array<double>; dim must be statically known (64 here, 384 for
    * Tier-2). Expands to dim scalar `avg`s — partial-aggregated map-side, so
    * the shuffle carries one dim-length row per partition, not the data. */
  def avgVector(v: Column, dim: Int): Column =
    array((1 to dim).map(i => avg(element_at(v, i).cast("double"))): _*)
}
