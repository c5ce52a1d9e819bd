package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k (score, id) aggregator: the buffer never holds more
  * than k entries, and partial buffers merge map-side, so a hot group
  * (a document with millions of near-duplicate partners) costs O(k)
  * memory per task — unlike a per-key window sort (sorts the whole
  * hot key in one task) or collect_list+slice (buffers every partner
  * before truncating). This is the skew-proof way to surface
  * "exemplar" rows per group at 100 TB.
  *
  * Ordering: score DESC, then id ASC — fully deterministic for
  * distinct ids, so results are stable across partitionings.
  */
class TopKPairsAgg(val k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    if (buf.length >= k && better(buf.last, x)) buf
    else (buf :+ x).sortWith(better).take(k)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKPairsAgg {
  /** Column form: `top_k_by(score, id, k)` usable in `agg(...)`;
    * returns array<struct<_1:score, _2:id>> sorted score DESC, id ASC.
    */
  def top_k_by(score: Column, id: Column, k: Int): Column = {
    val agg = udaf(new TopKPairsAgg(k))
    agg(score, id)
  }
}
