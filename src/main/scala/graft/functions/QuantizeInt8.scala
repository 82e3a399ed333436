package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** V7 — INT8 scalar quantization of float vectors, the storage-side
  * compression the reference applies to Tier-2 dense vectors
  * (`/root/reference/app/services/qdrant_service.py:84-90`: scalar INT8,
  * quantile 0.99, on-disk). 4× smaller vectors; scoring on the quantized
  * form is integer arithmetic.
  *
  * Declared deviation: scale = per-vector max-|x| (quantile 1.0) rather
  * than a corpus-level 0.99 quantile — keeps quantization a pure per-row
  * expression (no corpus pass) with zero clipping; documented in SURVEY
  * §8. Built from Spark built-in column functions only, so the DuckDB
  * oracle mirrors the math term for term.
  *
  * Encoding: `q_i = round(x_i * 127 / scale)` as TINYINT, plus the DOUBLE
  * `scale` carried alongside. Dot products on (q, scale) pairs
  * reconstruct: `dot ≈ Σ qa_i*qb_i * (sa*sb)/(127*127)`.
  */
object QuantizeInt8 {

  /** Per-vector scale: max absolute component (0 for the zero vector). */
  def scaleOf(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** Quantize to array<tinyint> given the scale column. */
  def quantize(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0))
        .otherwise(round(x.cast("double") * 127.0 / scale))
        .cast("tinyint"))

  /** Integer dot product of two quantized vectors (exact int math). */
  def qdot(qa: Column, qb: Column): Column =
    aggregate(zip_with(qa, qb, (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Cosine on quantized vectors: scales cancel, so this is the integer
    * dot normalized by integer norms — no float reconstruction needed. */
  def qcosine(qa: Column, qb: Column): Column = {
    val na = sqrt(qdot(qa, qa).cast("double"))
    val nb = sqrt(qdot(qb, qb).cast("double"))
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(qdot(qa, qb).cast("double") / (na * nb))
  }
}
