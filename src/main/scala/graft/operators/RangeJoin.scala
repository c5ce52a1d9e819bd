package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-interval range join. Spark plans a plain
  * `l.key = r.key AND r.ts BETWEEN l.lo AND l.hi` as a shuffled join
  * whose per-key cost is O(|L_k|·|R_k|); when the interval width is
  * bounded by `bucketWidth`, bucketizing the time axis turns it into
  * an equi-join on (key, bucket): each left row probes only the ≤2
  * buckets its interval overlaps, and the exact range predicate
  * filters the slack. Cost ∝ rows per (key, bucket) — the shape that
  * survives dense 100 TB event tables, where an inequality join
  * degenerates.
  */
object RangeJoin {

  /** Inner-join each left row to right rows with the same key and
    * `rightTs ∈ [leftTs - width, leftTs)`; both timestamps are epoch
    * longs in the same unit. Each right row lives in exactly one
    * bucket, so probing the ≤2 overlapping buckets never duplicates a
    * match. (For left-outer semantics, aggregate this result and
    * re-join the left side.)
    */
  def boundedRangeJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column, width: Long): DataFrame = {
    require(width > 0)
    // integral division (SQL `div`): double division would lose
    // precision at nanosecond-epoch magnitudes (2^63 ≫ 2^53) and
    // could misplace bucket boundaries
    def bucketOf(ts: Column): Column = call_function("div", ts, lit(width))
    val l = left
      .withColumn("__lts", leftTs)
      // array_distinct: when the interval fits one bucket, probing it
      // twice would duplicate every match
      .withColumn("__bucket", explode(array_distinct(array(
        bucketOf(leftTs - width), bucketOf(leftTs)))))
      .withColumn("__k", leftKey)
    val r = right
      .withColumn("__rts", rightTs)
      .withColumn("__bucket", bucketOf(rightTs))
      .withColumn("__k", rightKey)
    l.join(r,
        l("__k") === r("__k") && l("__bucket") === r("__bucket") &&
          r("__rts") >= l("__lts") - width && r("__rts") < l("__lts"))
      .drop("__k", "__bucket", "__lts", "__rts")
  }
}
