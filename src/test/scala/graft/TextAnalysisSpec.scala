package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral tests for the BM25 retrieval operator (t16) — the
  * oracle gate proves Spark-vs-DuckDB hash agreement; these prove the
  * ranking function itself behaves like BM25 on corpora built to
  * exercise tf saturation, length normalization, and term coverage.
  */
class TextAnalysisSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def corpus(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (id, t) =>
        Row(id, t, "en", "src0", t.length.toLong)
      }: _*),
      docSchema)

  private def run(rows: (Long, String)*): Map[Long, (Int, Double, Int)] = {
    val out = operators.TextAnalysis.bm25(corpus(rows: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_terms"), r.getAs[Double]("score"),
          r.getAs[Int]("rk")))).toMap
    CacheScope.releaseAll()
    out
  }

  test("t16 BM25: non-matching docs drop; more matched terms beat fewer at equal length") {
    // pad to identical dl so only term coverage differs
    val got = run(
      1L -> "spark hash window pad1 pad2 pad3",
      2L -> "spark hash nope1 pad1 pad2 pad3",
      3L -> "spark nope0 nope1 pad1 pad2 pad3",
      4L -> "nope9 nope0 nope1 pad1 pad2 pad3")
    assert(!got.contains(4L), "doc with no query term must not be retrieved")
    assert(got(1L)._1 == 3 && got(2L)._1 == 2 && got(3L)._1 == 1)
    assert(got(1L)._2 > got(2L)._2 && got(2L)._2 > got(3L)._2)
    assert(got(1L)._3 == 1 && got(2L)._3 == 2 && got(3L)._3 == 3)
  }

  test("t16 BM25: higher tf wins at equal length; shorter doc wins at equal tf") {
    val got = run(
      1L -> "spark spark spark pad1 pad2 pad3",
      2L -> "spark pad0 pad1 pad2 pad3 pad4",
      // same single occurrence but twice the length — normalized down
      3L -> "spark pad0 pad1 pad2 pad3 pad4 pad5 pad6 pad7 pad8 pad9 padA")
    assert(got(1L)._2 > got(2L)._2, "tf saturation must still reward tf 3 > 1")
    assert(got(2L)._2 > got(3L)._2, "length normalization must discount the longer doc")
  }

  test("t16 BM25: top-k truncates to the k best-scoring docs") {
    // 30 single-term docs with increasing padding — scores strictly
    // decrease with doc length, so the top 20 are exactly ids 1..20
    val docs = (1L to 30L).map(i =>
      i -> ("spark " + (1L to i).map(j => s"pad$j").mkString(" ")))
    val got = run(docs: _*)
    assert(got.size == 20)
    assert(got.keySet == (1L to 20L).toSet)
    assert(got(1L)._3 == 1 && got(20L)._3 == 20)
  }
}
