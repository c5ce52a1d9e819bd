package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scratch probe for round-13 optimization (v2): is the p06 `scrub`
  * persist actually reused by its consumers? Deleted before the round
  * closes. Usage: sbt "runMain graft.operators.Probe13 /root/testdata/sf0.1" */
object Probe13 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe13] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    try Curation.p06_epoch_build(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }
    graft.CacheScope.releaseAll(); spark.catalog.clearCache()

    val (sampled, scrub0) = timed("p03Stages construct (eager part)") {
      Curation.p03Stages(spark, sfDir)
    }
    val scrub = timed("scrub join + persist materialize") {
      val sc = graft.CacheScope.persisted(
        scrub0.join(sampled.select(col("doc_id"), col("source")),
          Seq("doc_id")))
      noop(sc); sc
    }
    timed("scrub.count() (cache re-scan 1)") { scrub.count() }
    timed("scrub.count() (cache re-scan 2)") { scrub.count() }
    timed("bySrc agg over scrub (no broadcast)") {
      noop(scrub.groupBy(col("source"))
        .agg(sum(col("n_clean")).as("src_tokens")))
    }
    timed("bySrc agg + crossJoin broadcast totals") {
      val bySrc = scrub.groupBy(col("source"))
        .agg(sum(col("n_clean")).as("src_tokens"))
        .withColumn("sq", floor(sqrt(col("src_tokens"))).cast(LongType))
      val totals = bySrc.agg(sum(col("src_tokens")).as("total_tokens"),
        sum(col("sq")).as("sq_sum"))
      noop(bySrc.crossJoin(broadcast(totals)))
    }
    graft.CacheScope.releaseAll(); spark.catalog.clearCache()

    // --- same, with an eager checkpoint cutting the plan tree ---
    val (sampled2, scrub02) = timed("p03Stages construct (2nd)") {
      Curation.p03Stages(spark, sfDir)
    }
    val scrubCp = timed("scrub join + CHECKPOINT materialize") {
      graft.CacheScope.checkpointed(
        scrub02.join(sampled2.select(col("doc_id"), col("source")),
          Seq("doc_id")))
    }
    timed("scrubCp.count() (1)") { scrubCp.count() }
    timed("scrubCp.count() (2)") { scrubCp.count() }
    timed("bySrc agg + crossJoin broadcast totals (cp)") {
      val bySrc = scrubCp.groupBy(col("source"))
        .agg(sum(col("n_clean")).as("src_tokens"))
        .withColumn("sq", floor(sqrt(col("src_tokens"))).cast(LongType))
      val totals = bySrc.agg(sum(col("src_tokens")).as("total_tokens"),
        sum(col("sq")).as("sq_sum"))
      noop(bySrc.crossJoin(broadcast(totals)))
    }
    spark.stop()
  }
}
