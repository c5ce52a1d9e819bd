package graft

import graft.operators.SkewTools
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewToolsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin result equals plain inner join on skewed data") {
    // 90% of rows share one key — the salted plan must not change results
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewTools.saltedJoin(big, small, "k", saltFactor = 8)
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == 7L) == 1800)
  }

  test("saltedCountSum equals plain groupBy aggregate") {
    val df = (1 to 5000).map(i => (if (i % 100 == 0) "cold" else "hot", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewTools.saltedCountSum(df, $"k", $"v", saltFactor = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }
}
