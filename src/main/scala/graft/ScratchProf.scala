package graft

/** SCRATCH dev probe (not committed): per-job wall profile of one
  * query — job durations, inter-job driver gaps, and per-stage shuffle
  * metrics, so the dominant stage of a multi-stage pipeline is
  * measured, not guessed.
  * Usage: sbt "runMain graft.ScratchProf <sfDir> <query> [reps]" */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var base = 0L
    @volatile var lastEnd = 0L
    @volatile var on = false
    val starts = new scala.collection.concurrent.TrieMap[Int, Long]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts(js.jobId) = js.time
          if (on) {
            val gap = (js.time - (if (lastEnd == 0) base else lastEnd)) / 1e3
            if (gap > 0.05)
              println(f"[prof]     (driver gap ${gap}%6.2f s before job ${js.jobId})")
          }
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          if (on) {
            val t0 = starts.getOrElse(je.jobId, je.time)
            lastEnd = je.time
            println(f"[prof] job ${je.jobId}%4d +${(t0 - base) / 1e3}%7.2fs " +
              f"ran ${(je.time - t0) / 1e3}%6.2f s")
          }
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          if (on) {
            val si = sc.stageInfo
            val m = si.taskMetrics
            val dur = (si.completionTime.getOrElse(0L) -
              si.submissionTime.getOrElse(0L)) / 1e3
            if (dur > 0.2)
              println(f"[prof]   stage ${si.stageId}%4d ${dur}%6.2f s " +
                f"cpu=${m.executorCpuTime / 1e9}%6.2f s " +
                f"tasks=${si.numTasks}%4d in=${m.inputMetrics.bytesRead / 1e6}%6.1fMB " +
                f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%6.1fMB " +
                f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%6.1fMB  " +
                si.details.linesIterator.toSeq.drop(1).headOption
                  .getOrElse(si.name).take(80))
          }
        }
      })
    try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }
    CacheScope.releaseAll(); spark.catalog.clearCache()
    for (r <- 1 to reps) {
      println(s"[prof] === $name rep $r ===")
      base = System.currentTimeMillis(); lastEnd = 0L; on = true
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      on = false
      println(f"[prof] TOTAL $name $sec%.2f s n=$n")
      CacheScope.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
