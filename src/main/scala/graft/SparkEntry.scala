package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator surface of the engine:
  *   - [[graft.operators.Relational]] — SURVEY §2.3 relational shapes
  *   - [[graft.operators.Dedup]] — exact + near-duplicate detection
  *   - [[graft.operators.Similarity]] — embedding ANN
  *   - [[graft.operators.TextAnalysis]] — lang-ID / quality / tokens
  * Each query name appearing in [[oracleSql]] is hash-checked against a
  * DuckDB oracle by the driver; the rest get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Snowflake join + aggregate: the §2.3-3/4 shape end-to-end.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q04_dim_join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Relational2.queries ++
      operators.Curation.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hashing/sketching
    * is engine-specific (driver records a rows-only check).
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.Relational2.oracles ++
      operators.Curation.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.TextAnalysis.oracles ++
      operators.Multimodal.oracles
}
