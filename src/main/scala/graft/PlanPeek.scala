/** Dev tool: print the executed physical plan of named queries at
 * sf0.001 — the quick `.explain` loop PlanSpec pins are derived from.
 * Usage: sbt "runMain graft.PlanPeek <query> [query...]" */
package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.take(6000))
      CacheScope.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
