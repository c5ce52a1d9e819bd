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
    dimGuarded(
      operators.Relational.queries ++
        operators.Relational2.queries ++
        operators.Curation.queries ++
        operators.Dedup.queries ++
        operators.Similarity.queries ++
        operators.Retrieval.queries ++
        operators.TextAnalysis.queries ++
        operators.Multimodal.queries ++
        operators.DiscogsStar.queries,
      oracleSql)

  /** Wraps every suite entry whose ORACLE text embeds the committed
    * hyperplane-LSH plane literals (generated at
    * [[graft.operators.Dedup.OracleEmbeddingDim]] — detected by their
    * `list_dot_product` mirror, which appears in oracle SQL only via
    * `lshSigSqlExpr`) with a loud dim check: on a corpus configured
    * with a different `spark.graft.embedding.dim` the ENGINE hashes
    * with one plane matrix and the static oracle text with another,
    * so the two sides would value-diverge silently instead of
    * failing at the source. One seam, so a future entry that embeds
    * the mirror is guarded automatically. The engine APIs themselves
    * (lshSignature and everything built on it) stay dim-generic —
    * only the oracle-compared suite surface pins the fixture width. */
  private def dimGuarded(
      qs: Map[String, (SparkSession, String) => DataFrame],
      os: Map[String, String])
      : Map[String, (SparkSession, String) => DataFrame] =
    qs.map { case (name, f) =>
      if (os.get(name).exists(_.contains("list_dot_product(")))
        name -> { (s: SparkSession, d: String) =>
          val dim = Tables.embeddingDim(s)
          require(dim == operators.Dedup.OracleEmbeddingDim,
            s"$name: spark.graft.embedding.dim=$dim but the committed " +
              "oracle's LSH plane literals were generated at " +
              s"${operators.Dedup.OracleEmbeddingDim} dims — the engine and " +
              "the oracle would hash with different plane matrices and " +
              "silently value-diverge; call the library API directly for " +
              "non-fixture widths")
          f(s, d)
        }
      else name -> f
    }

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
      operators.Retrieval.oracles ++
      operators.TextAnalysis.oracles ++
      operators.Multimodal.oracles ++
      operators.DiscogsStar.oracles
}
