package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q69's strict-order semantics on a handcrafted event log — the
  * oracle gate proves engine-vs-DuckDB agreement; this proves the
  * funnel does the right thing on inputs built to trip it (stages
  * reached out of order must NOT count).
  */
class FunnelSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("q69 counts stages only in view -> click -> purchase order") {
    import spark.implicits._
    def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision is fine here
    val events = Seq(
      // u1: full funnel in order → stage 3
      (1L, "view", ts(1000000L)), (1L, "click", ts(2000000L)),
      (1L, "purchase", ts(3000000L)),
      // u2: purchase BEFORE first view → purchase must not count → 1
      (2L, "purchase", ts(1000000L)), (2L, "view", ts(2000000L)),
      // u3: click BEFORE first view → click must not count → 1
      (3L, "click", ts(1000000L)), (3L, "view", ts(2000000L)),
      // u4: purchase between view and first qualifying click → 2
      (4L, "view", ts(1000000L)), (4L, "purchase", ts(1500000L)),
      (4L, "click", ts(2000000L)),
      // u5: no funnel events at all → 0
      (5L, "signup", ts(1000000L)),
    ).toDF("user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("funnel_test").toString
    try {
      events.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = operators.Relational2.q69_funnel(spark, dir)
        .select(col("user_id"), col("stage")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 0))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
