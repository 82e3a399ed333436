package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: Spark plan + (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet tables.
  * Column names MUST match between the two (the driver sorts columns by
  * name and hash-compares values). Queries without `oracle` get a weaker
  * rows-only check (vector/golden ops).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** All registered queries, in SURVEY §2 inventory order. */
  def all: Seq[QueryDef] =
    Relational.queries ++ LogOps.queries ++ AnomalyOps.queries ++
      VectorOps.queries ++ TextOps.queries ++ SimhashOps.queries ++
      CurationOps.queries ++ StreamOps.queries ++ MediaQueries.queries ++
      SessionOps.queries ++ CorpusOps.queries ++ HybridOps.queries
}
