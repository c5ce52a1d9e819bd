package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Throwaway diagnostic for s23: separates probe loss from search loss.
  * Prints, per nProbe: the CEILING recall (exact brute force within the
  * probed cells) and the reachable-set recall (truth nodes in the same
  * component as their cell's medoid). */
object DiagS23 {
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
      .map(r => (r.getLong(0), r.getLong(1)))
    // cell assignment + per-cell graph
    val g = operators.Similarity.cellGraph(e).collect()
    CacheScope.releaseAll()
    val (cents, asg, _) = operators.Similarity.cellIndex(e)
    val cellOfArr = asg.select(col("vec_id"), col("cell"), col("cd")).collect()
    val cellOf = cellOfArr.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ownD = cellOfArr.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // probe rankings per query: exact distance to each centroid
    val fan = m.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("j").as("cell"),
        milli_l2(col("mv"), col("c_mv")).as("d")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    CacheScope.releaseAll()
    val qids = truth.map(_._1).distinct
    val probeRank: Map[Long, Seq[Int]] = qids.map { qid =>
      qid -> fan.filter(_._1 == qid).sortBy(t => (t._3, t._2)).map(_._2).toSeq
    }.toMap
    // components per cell (symmetrized)
    val byCell = g.groupBy(_.getInt(1))
    val compOf = scala.collection.mutable.Map[Long, (Int, Long)]() // node -> (cell, comp-min)
    byCell.foreach { case (c, rows) =>
      val adj = scala.collection.mutable.Map[Long, Set[Long]]()
        .withDefaultValue(Set.empty)
      val nodes = rows.map(_.getLong(0)).toSet
      rows.foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(3))
        adj(a) = adj(a) + b; adj(b) = adj(b) + a
      }
      var seen = Set.empty[Long]
      nodes.foreach { n =>
        if (!seen(n)) {
          var comp = Set(n); var frontier = Set(n)
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(adj).diff(comp); comp ++= frontier
          }
          seen ++= comp
          val mn = comp.min
          comp.foreach(x => compOf(x) = (c, mn))
        }
      }
    }
    // medoid per cell = member with min (ownD, id)
    val medoid = cellOf.groupBy(_._2).map { case (c, ms) =>
      c -> ms.keys.minBy(id => (ownD(id), id))
    }
    for (nProbe <- Seq(2, 4, 6, 8, 16)) {
      val pairs = truth.filter { case (qid, nn) =>
        probeRank(qid).take(nProbe).contains(cellOf(nn))
      }
      val ceiling = pairs.length.toDouble / truth.length
      val reach = pairs.count { case (_, nn) =>
        val c = cellOf(nn)
        compOf.get(nn).exists(_._2 == compOf(medoid(c))._2)
      }.toDouble / truth.length
      println(f"probe=$nProbe%2d ceiling=$ceiling%.4f medoid-reachable=$reach%.4f")
    }
  }
}
