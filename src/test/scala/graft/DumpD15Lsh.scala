package graft

/** Throwaway referee harness: force d15's LSH tier at fixture scale
  * (maxBlock=10 puts every sf0.001 label block over the ceiling) and
  * dump (a) the engine result and (b) the two-tier oracle SQL with the
  * matching ceiling, for a DuckDB compare by tools/check_oracle.py
  * machinery. Proves the hyperplane mirror is bit-exact without a 25x
  * run. */
object DumpD15Lsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/d15_lsh_test"
    val spark = TestSpark.spark
    val e = Tables.embeddings(spark, dir)
    operators.Dedup.semanticDedup(e, operators.Dedup.D15Tau, maxBlock = 10)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/d15_forced")
    CacheScope.releaseAll()
    // same oracle source as the committed entry, ceiling threaded
    // through as a parameter — no post-hoc text patching to corrupt
    val sql = operators.Dedup.d15OracleSqlFor(10)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      "{\"d15_forced\": " + "\"" + sql.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c => c.toString
      } + "\"}")
  }
}
