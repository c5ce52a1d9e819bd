package graft

/** Throwaway: warm-rep measurement of the restaged-parquet scan (the
  * round-9 verdict watch item — single-shot BENCH numbers for this
  * sub-second scan swing with ambient VM load). Restages once, then
  * scans `reps` times; per-rep rec/s printed. */
object TimeStagedScan {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = TestSpark.spark
    val path = IngestBench.ensureDump(IngestBench.defaultRecords * 4)
    val outDir = "/tmp/graft_restage_warm"
    val t0 = System.nanoTime()
    val staged = sources.DiscogsXml.restage(spark, path, outDir)
    println(f"[staged] restage: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    for (r <- 1 to reps) {
      val t1 = System.nanoTime()
      val rows = sources.DiscogsXml.readReleasesStaged(spark, staged)
        .release.count()
      val sec = (System.nanoTime() - t1) / 1e9
      println(f"[staged] rep$r: $rows rows in $sec%.3f s = ${rows / sec}%.0f rec/s")
    }
  }
}
