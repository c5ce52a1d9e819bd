package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q74's contract: the merged daily HLL sketches must (a) estimate
  * the true distinct count within HLL's error envelope and (b) agree
  * with a sketch built directly over the whole fact slice — merging
  * per-day sketches loses nothing vs scanning the month at once,
  * which is the entire point of keeping a standing sketch table.
  */
class SketchRollupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q74 merged estimates track exact distincts within 5%") {
    val rows = operators.Relational2.q74_sketch_rollup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_distinct").toDouble
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(exact > 0)
      assert(math.abs(est - exact) / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: est $est vs exact $exact")
      assert(r.getAs[Long]("n_days") >= 1)
    }
  }

  test("q74 merge of daily sketches equals the direct whole-slice sketch") {
    val ev = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"))
    val direct = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))
        .as("direct_est"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("direct_est")).toMap
    val merged = operators.Relational2.q74_sketch_rollup(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("est_distinct")).toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (t, m) =>
      val d = direct(t).toDouble
      assert(math.abs(m - d) / math.max(d, 1.0) <= 0.01,
        s"$t: merged $m vs direct ${direct(t)}")
    }
  }
}
