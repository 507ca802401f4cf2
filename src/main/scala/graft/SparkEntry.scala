package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator surfaces here as a named query over a
  * scale-factor directory; `oracleSql` carries the DuckDB-equivalent
  * SQL for the driver's correctness gate (omitted only for
  * approximate / stochastic operators, which get rows-only checks and
  * are spec-tested for recall instead).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.VectorQueries.queries ++
      index.VamanaIndex.queries ++ index.HnswIndex.queries ++
      operators.Dedup.queries ++
      operators.TextAnalysis.queries ++ multimodal.Multimodal.queries ++
      operators.KMeans.queries ++ operators.SourceQueries.queries ++
      operators.PQ.queries ++ operators.Opq.queries

  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.VectorQueries.oracles ++
      index.VamanaIndex.oracles ++ operators.Dedup.oracles ++
      operators.TextAnalysis.oracles ++ multimodal.Multimodal.oracles ++
      operators.KMeans.oracles ++ operators.SourceQueries.oracles ++
      operators.PQ.oracles ++ operators.Opq.oracles
}
