package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator unioning MinHash signatures: the signature of a
  * UNION of sets is the element-wise minimum of the sets' signatures,
  * so a group's corpus-level signature is a decomposable aggregate —
  * partial (map-side) merge per partition, tiny final merge. This is
  * how corpus-vs-corpus similarity stays one pass at 100 TB: per-group
  * sketches instead of pairwise document comparisons.
  *
  * Input: one minhash signature per row (from
  * [[TextHashFunctions.minhash_signature]]); empty/absent → identity
  * (Long.MaxValue slots).
  */
class MinHashUnionAgg(val numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null) {
      val n = math.min(buf.length, sig.length)
      var i = 0
      while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashUnionAgg {
  /** Column form: `minhash_union(sig_col)` usable in `agg(...)`. */
  def minhash_union(sig: Column, numHashes: Int = 64): Column = {
    val agg = org.apache.spark.sql.functions.udaf(new MinHashUnionAgg(numHashes))
    agg(sig)
  }

  /** Estimated Jaccard between two union signatures = fraction of
    * agreeing slots among INFORMATIVE slots. A slot still at the
    * Long.MaxValue identity on both sides means neither group produced
    * a shingle for that permutation — counting it as agreement would
    * report two empty/near-empty groups as up to 100% similar, so such
    * slots are excluded from numerator and denominator; if no slot is
    * informative the estimate is 0.0. Signatures from different
    * configurations (unequal lengths) are incomparable → null; empty
    * signatures → 0.0. */
  def estimated_jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    val identity = Long.MaxValue
    val informative = zip_with(a, b, (x, y) =>
      when(x === identity && y === identity, 0.0).otherwise(1.0))
    val agreements = zip_with(a, b, (x, y) =>
      when(x === y && x =!= identity, 1.0).otherwise(0.0))
    val nInf = aggregate(informative, lit(0.0), (acc, v) => acc + v)
    when(size(a) === 0 || size(b) === 0, lit(0.0))
      .when(size(a) =!= size(b), lit(null).cast("double"))
      .otherwise(when(nInf === 0.0, lit(0.0)).otherwise(
        aggregate(agreements, lit(0.0), (acc, v) => acc + v) / nInf))
  }
}
