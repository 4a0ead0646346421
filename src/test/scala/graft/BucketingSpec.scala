package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed co-located join plans without any Exchange") {
    // force SortMergeJoin and a stable (non-adaptive) plan for the
    // assertion; restore the session confs afterwards
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ord = Tables.load(spark, SparkTestSession.sf, "orders")
        .select(col("o_orderkey").as("key"), col("o_totalprice"))
      val li = Tables.load(spark, SparkTestSession.sf, "lineitem")
        .select(col("l_orderkey").as("key"), col("l_extendedprice"))
      Bucketing.writeBucketed(ord, "b_orders", "key", 8)
      Bucketing.writeBucketed(li, "b_lineitem", "key", 8)

      val bucketed = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "key")
      val shuffled = ord.join(li, Seq("key"))
      assert(bucketed.count() == shuffled.count())
      assert(!Bucketing.hasExchange(bucketed),
        "bucketed join must not shuffle:\n" +
          bucketed.queryExecution.executedPlan.toString)
      assert(Bucketing.hasExchange(shuffled),
        "control: the unbucketed join should shuffle")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
