package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Throwaway-style sweep for the s23 cell-probe knobs: recall@5 vs the
  * exact milli brute force for a grid of (nProbe, rounds). Run with:
  * sbt "Test/runMain graft.SweepS23 /root/testdata/sf0.001"
  */
object SweepS23 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = TestSpark.spark
    import graft.functions.VectorFunctions.milli_l2
    val e = Tables.embeddings(spark, dir)
    val m = e.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast(DoubleType) * 1000).cast(LongType)).as("mv"))
    val q = m.filter(col("vec_id") % 97 === 0 &&
        col("vec_id") < operators.Similarity.QueryIdBound)
      .select(col("vec_id").as("q_id"), col("mv").as("q_mv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    val truth = m.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("d2", milli_l2(col("q_mv"), col("mv")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"== $dir truth pairs: ${truth.size}")
    for {
      nProbe <- Seq(2, 4, 6, 8, 16)
      rounds <- Seq(1, 2, 3)
    } {
      val t0 = System.nanoTime()
      val got = operators.Similarity.cellProbeSearch(e, nProbe, rounds)
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      CacheScope.releaseAll()
      val r = got.map(x => (x.getLong(0), x.getLong(2))).toSet
        .count(truth.contains).toDouble / truth.size
      println(f"probe=$nProbe%2d rounds=$rounds%d  recall=$r%.4f  sec=$sec%.2f")
    }
  }
}
