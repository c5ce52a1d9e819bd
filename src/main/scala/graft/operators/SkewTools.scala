package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default here) which splits oversized shuffle partitions at
  * runtime. These utilities cover the cases AQE can't: a shuffle
  * hash/sort-merge join where ONE key holds a large fraction of the
  * rows (AQE splits partitions, not keys), and high-cardinality
  * aggregation hotspots.
  */
object SkewTools {

  /** Salted equi-join: the skewed (big) side gets a random salt in
    * [0, saltFactor); the small side is replicated saltFactor times so
    * every salted key finds its match. Same result as
    * `big.join(small, keys)` for inner joins; the hot key's rows now
    * spread over `saltFactor` reducers.
    *
    * Use when one join key dominates; `saltFactor` ≈ hot-key share ×
    * target parallelism. Replication multiplies the small side's
    * shuffle volume — keep it for genuinely small build sides.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial/final) aggregation with an explicit salt for
    * hot grouping keys: first aggregate on (key, salt), then merge the
    * partials per key. Correct for decomposable aggregates expressed
    * as (partial, merge) column pairs.
    */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    df.withColumn("__salt", (rand(seed = 42) * saltFactor).cast("int"))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"))
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("s"))
  }
}
