package graft

/** Forced-tier referee harness: run every LSH-tier operator with the
  * exact ceiling forced to 10 (every sf0.001 block/community is over
  * it, so ONLY the hyperplane route fires) and dump (a) the engine
  * results and (b) the matching two-tier oracle SQL built from the
  * SAME sources with the same ceiling, for a DuckDB compare by the
  * tools/check_oracle.py machinery. Proves each hyperplane mirror —
  * d15's domination, the d05/s14 blocked-kNN ranking, s17's
  * community-scoped domination — is bit-exact without a 25× run. */
object DumpLshForced {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/lsh_forced_test"
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, dir)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
      CacheScope.releaseAll()
    }
    dump("d15_forced",
      operators.Dedup.semanticDedup(e, operators.Dedup.D15Tau, maxBlock = 10))
    dump("d05_forced", operators.Dedup.embeddingNearDup(e, 10))
    dump("s14_forced", operators.Dedup.blockedKnn(e, 3, 10)
      .orderBy(col("vec_id"), col("rk")))
    dump("s17_forced", operators.Similarity.communityDedup(e, 10))
    val oracles = Map(
      "d15_forced" -> operators.Dedup.d15OracleSqlFor(10),
      "d05_forced" ->
        s"""WITH ${operators.Dedup.blockedKnnOracleCtes(1, 10)}
           |SELECT vec_id, nn_id, cos FROM knn2t ORDER BY vec_id"""
          .stripMargin,
      "s14_forced" ->
        s"""WITH ${operators.Dedup.blockedKnnOracleCtes(3, 10)}
           |SELECT vec_id, nn_id, cos, CAST(rk AS INT) AS rk FROM knn2t
           |ORDER BY vec_id, rk""".stripMargin,
      "s17_forced" ->
        s"""WITH ${operators.Similarity.lpaDomChainSqlFor(10)}
           |SELECT c.vec_id, c.community, dom.dominated_by,
           |  dom.dominated_by IS NULL AS kept
           |FROM com c LEFT JOIN dom USING (vec_id)
           |ORDER BY c.vec_id""".stripMargin)
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    } + "\""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      oracles.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
  }
}
