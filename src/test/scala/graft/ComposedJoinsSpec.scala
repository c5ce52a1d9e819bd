package graft

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Handcrafted boundary semantics for the composed join operators —
  * the cases an aggregate-level oracle can silently miss. */
class ComposedJoinsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin: ≤ match, equal-ts tie matches, no-prior-row is null") {
    val left = Seq(
      (1L, 100L, "l-a"),  // after right rows at 50, 100 → matches ts=100 (≤)
      (1L, 60L, "l-b"),   // between 50 and 100 → matches 50
      (1L, 10L, "l-c"),   // before any right row → null
      (2L, 500L, "l-d"))  // key with no right rows at all → null
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 50L, 900L), (1L, 100L, 901L))
      .toDF("k", "ts", "payload_id")
    val out = AsOfJoin.asofJoin(left, right,
      leftKey = col("k"), rightKey = right("k"),
      leftTs = left("ts"), rightTs = right("ts"),
      payload = Seq(col("payload_id")), tieBreak = col("payload_id"))
      .select(col("tag"), col("asof.payload_id").as("pid"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("l-a").contains(901L)) // equal timestamp counts (≤)
    assert(out("l-b").contains(900L))
    assert(out("l-c").isEmpty)
    assert(out("l-d").isEmpty)
  }

  test("asofJoin: among equal right timestamps the tieBreak-last wins") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 50L, 1L), (1L, 50L, 7L), (1L, 50L, 3L))
      .toDF("k", "ts", "payload_id")
    val out = AsOfJoin.asofJoin(left, right,
      col("k"), right("k"), left("ts"), right("ts"),
      Seq(col("payload_id")), col("payload_id"))
      .select(col("asof.payload_id")).first().getLong(0)
    assert(out == 7L)
  }

  test("boundedRangeJoin: half-open [ts-w, ts) boundaries, no dup matches") {
    val width = 100L
    val left = Seq((1L, 1000L, "L")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 900L, "lo-inclusive"),   // == ts - w → included
      (1L, 999L, "hi-inside"),      // < ts → included
      (1L, 1000L, "hi-exclusive"),  // == ts → excluded
      (1L, 899L, "below"),          // < ts - w → excluded
      (2L, 950L, "other-key"))      // wrong key → excluded
      .toDF("k", "ts", "name")
    val out = RangeJoin.boundedRangeJoin(left, right,
      left("k"), right("k"), left("ts"), right("ts"), width)
      .select(col("name")).collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("hi-inside", "lo-inclusive"))
  }

  test("asofJoin equals the naive O(n*m) reference on random data") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 3) {
      val leftRows = (1 to 60).map(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val rightRows = (1 to 80).map(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val left = leftRows.toDF("k", "ts", "lid")
      val right = rightRows.toDF("k", "ts", "rid")
      val got = AsOfJoin.asofJoin(left, right,
        col("k"), right("k"), left("ts"), right("ts"),
        Seq(col("rid")), col("rid"))
        .select(col("lid"), col("asof.rid").as("rid"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val expected = leftRows.map { case (k, ts, lid) =>
        val candidates = rightRows.filter(r => r._1 == k && r._2 <= ts)
        // greatest ts; among equal ts, greatest tieBreak (rid) wins
        lid -> candidates.sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      }.toMap
      assert(got == expected)
    }
  }

  test("boundedRangeJoin equals the naive filter on random data") {
    val rnd = new scala.util.Random(777)
    val width = 50L
    val leftRows = (1 to 50).map(i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong, i.toLong))
    val rightRows = (1 to 100).map(i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong, i.toLong))
    val left = leftRows.toDF("k", "ts", "lid")
    val right = rightRows.toDF("k", "ts", "rid")
    val got = RangeJoin.boundedRangeJoin(left, right,
      left("k"), right("k"), left("ts"), right("ts"), width)
      .select(col("lid"), col("rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = (for {
      (lk, lts, lid) <- leftRows
      (rk, rts, rid) <- rightRows
      if lk == rk && rts >= lts - width && rts < lts
    } yield (lid, rid)).sorted
    assert(got == expected)
  }

  test("boundedRangeJoin: interval inside one bucket doesn't duplicate") {
    // width 1000, left ts=1500: probe buckets are div(500,1000)=0 and
    // div(1500,1000)=1 — right at 700 (bucket 0) and 1400 (bucket 1)
    // each matched exactly once
    val left = Seq((1L, 1500L)).toDF("k", "ts")
    val right = Seq((1L, 700L, "a"), (1L, 1400L, "b"))
      .toDF("k", "ts", "name")
    val out = RangeJoin.boundedRangeJoin(left, right,
      left("k"), right("k"), left("ts"), right("ts"), 1000L)
      .select(col("name")).collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("a", "b"))
  }
}
