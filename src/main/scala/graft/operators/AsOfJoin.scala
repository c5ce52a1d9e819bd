package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single right row with the same
  * key and the greatest timestamp ≤ the left row's timestamp. Spark
  * has no native ASOF join; the standard range-join encoding
  * (`l.ts >= r.ts` + rank) explodes to O(|pairs in range|). This is
  * the linear composition instead (preference order (a) — compose
  * built-ins before custom plans):
  *
  *   union(left tagged 1, right tagged 0)
  *     → one shuffle+sort on (key, ts, side)
  *     → last(right payload, ignoreNulls) carry-forward window
  *     → keep left rows.
  *
  * Cost is one shuffle of |L|+|R| rows regardless of time-range
  * density — the shape that survives 100 TB. Right rows sort before
  * left rows at equal timestamps, so ties match (≤ semantics,
  * DuckDB-ASOF-compatible).
  */
object AsOfJoin {

  /** @param leftTs / rightTs  monotonic epoch columns (same unit)
    * @param payload           right-side columns to attach to each left row
    * @param tieBreak          deterministic order among equal right timestamps
    *                          (the LAST one wins)
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTs: Column, rightTs: Column,
      payload: Seq[Column], tieBreak: Column): DataFrame = {
    val reserved = Seq("__k", "__ts", "__side", "__tie", "__payload", "asof")
    require(!left.columns.exists(reserved.contains),
      s"left columns may not use the reserved names ${reserved.mkString(", ")}")
    val tieType = right.select(tieBreak).schema.head.dataType
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(tieType),
      s"tieBreak must be an integral column (got ${tieType.catalogString}); " +
        "a lossy cast would null it and make tie resolution nondeterministic")
    // SQL semantics: NULL keys/timestamps never match — drop them from
    // the build side up front (a null right ts would otherwise sort to
    // the partition head and act as a -infinity match)
    val cleanRight = right.filter(rightKey.isNotNull && rightTs.isNotNull)
    val ptype = payloadStructType(right, payload)
    val l = left.select(
      Seq(leftKey.as("__k"), leftTs.as("__ts"), lit(1).as("__side"),
        lit(null).cast("long").as("__tie"),
        lit(null).cast(ptype).as("__payload")) ++
        left.columns.map(c => left(c)): _*)
    val r = cleanRight.select(
      Seq(rightKey.as("__k"), rightTs.as("__ts"), lit(0).as("__side"),
        tieBreak.cast("long").as("__tie"),
        struct(payload: _*).as("__payload")) ++
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__k", "__ts", "__side", "__tie", "__payload")
      .withColumnRenamed("__match", "asof")
  }

  private def payloadStructType(right: DataFrame,
      payload: Seq[Column]): org.apache.spark.sql.types.StructType = {
    val named = right.select(payload: _*).schema
    named
  }
}
