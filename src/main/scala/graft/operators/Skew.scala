package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter grouping keys. A straight
  * `groupBy(key)` sends every row of a hot key to one reducer; salting
  * splits each key into `buckets` partial groups first, so no single task
  * owns a hot key, then merges the (tiny) partials. Use when AQE's skew
  * handling can't help — e.g. a skewed aggregation rather than a join.
  * Only algebraic aggregates (count/sum/min/max) decompose this way.
  */
object Skew {

  private def salt(buckets: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong))

  /** count(*) per key via two-stage salted aggregation. */
  def saltedCount(df: DataFrame, keyCol: String, buckets: Int): DataFrame =
    df.withColumn("__salt", salt(buckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"))

  /** sum(valueCol) per key via two-stage salted aggregation (exact when
    * summed through DECIMAL by the caller beforehand if exactness across
    * merge order matters).
    */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
                buckets: Int): DataFrame =
    df.withColumn("__salt", salt(buckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__s")).as("total"))

  /** count + sum per key in ONE two-stage salted pass. Pass a
    * DECIMAL-cast value column when exactness across merge order matters
    * (decimal addition is associative-exact, so the salted result is
    * bit-identical to a direct groupBy).
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: Column,
                     buckets: Int): DataFrame =
    df.withColumn("__salt", salt(buckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))

  /** Skewed equi-join: salt the big (skewed) side into `buckets` sub-keys
    * and replicate the small side once per bucket, so no single reducer
    * owns a hot key — identical join semantics, buckets× the small side's
    * shuffle volume. Prefer AQE's skew-join split when it applies (sort-
    * merge joins it can observe at runtime); salting is for the cases it
    * can't, e.g. when the skewed side feeds a grouped aggregation on the
    * same key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
                 buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", salt(buckets))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    saltedBig.join(replicated, Seq(keyCol, "__salt")).drop("__salt")
  }
}
