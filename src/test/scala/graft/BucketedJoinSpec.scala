package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing kills the join shuffle: writing both sides bucketed on
  * the join key makes the equi-join exchange-free — the plan must show
  * a SortMergeJoin with NO Exchange on either side.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"spark-warehouse/$name")
    if (loc.exists())
      org.apache.commons.io.FileUtils.deleteDirectory(loc)
  }

  test("join of bucketed tables plans without exchanges") {
    dropTable("orders_b"); dropTable("lineitem_b")
    val o = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    Sinks.writeBucketed(o, "orders_b", Seq("o_orderkey"), 4)
    Sinks.writeBucketed(li, "lineitem_b", Seq("l_orderkey"), 4)
    // hint the INPUT relation (a hint on the joined result is too late
    // to influence strategy): force SMJ so bucket alignment, not
    // broadcast, is what's being tested
    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and the result is identical to the unbucketed join
    assert(joined.count() ==
      li.join(o, col("l_orderkey") === col("o_orderkey")).count())
  }
}
