package graft

import org.apache.spark.sql.functions._

/** Throwaway-style sweep harness for the s03 IVF knobs: prints
  * recall@5 (vs the exact brute-force top-5) and wall time for a grid
  * of (nCells, nProbe, kmeansIters) at the given SF dir. Run with:
  * sbt "Test/runMain graft.SweepIvf /root/testdata/sf0.001"
  */
object SweepIvf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = TestSpark.spark
    val exact = operators.Similarity.s01_ann_bruteforce(spark, dir)
      .select(col("q_id"), col("vec_id")).persist()
    val nExact = exact.count()
    println(s"== $dir exact pairs: $nExact")
    for {
      nCells <- Seq(16, 32)
      iters <- Seq(4, 6)
      nProbe <- Seq(8, 10, 12)
    } {
      val t0 = System.nanoTime()
      val approx = operators.Similarity
        .annIvf(Tables.embeddings(spark, dir), nCells, nProbe, iters)
        .select(col("q_id"), col("vec_id"))
      val hits = exact.join(approx, Seq("q_id", "vec_id")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      CacheScope.releaseAll()
      println(f"cells=$nCells%2d probe=$nProbe%2d iters=$iters%d  " +
        f"recall=${hits.toDouble / nExact}%.4f  sec=$sec%.2f")
    }
    exact.unpersist()
  }
}
