package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SURVEY.md §2.D joins row).
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted) on the
  * join key lets SortMergeJoin consume buckets pairwise: the exchange on
  * BOTH sides disappears from the physical plan, because the on-disk layout
  * already satisfies the join's required distribution. At 100 TB this is
  * the difference between a full-network shuffle of two fact tables every
  * run and a local merge per bucket pair — the standard warehouse pattern
  * for the reference's recurring profile-vs-baseline and run-vs-run
  * comparisons, which hit the same keys on every refresh (reference
  * README.md:211 migration comparison; demo re-posts the same tables per
  * demo run, demo/demo/demo_helper.py:790-900).
  *
  * BucketingSpec proves the property: the bucketed join's executed plan
  * contains no Exchange node and returns the same rows as the shuffled
  * equivalent.
  */
object Bucketing {

  /** Persist `df` bucketed+sorted by `key` as managed table `table`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket key. With equal bucket
    * counts Catalyst plans a SortMergeJoin with no Exchange on either side.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** True when the executed plan contains any Exchange (shuffle) node. */
  def hasExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")
}
