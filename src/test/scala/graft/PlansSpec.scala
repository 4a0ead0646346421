package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.DotProduct
import graft.plans.RewriteHofDotProduct
import graft.sim.Similarity

class PlansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // parquet-backed so ConvertToLocalRelation can't constant-fold the
  // whole expression away before the rewrite has anything to match
  private def vecs = Tables.load(spark, SparkTestSession.sf, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .limit(8)

  private def hasDot(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.collect { case n => n.expressions }.flatten
      .exists(_.exists(_.isInstanceOf[DotProduct]))

  test("optimizer rewrites the HOF dot-product pattern to DotProduct") {
    val df = vecs.select(col("vec_id"),
      Similarity.dotHof(col("v"), col("v")).as("d"))
    // SparkTestSession registers GraftExtensions, so the optimized plan
    // must carry the native expression...
    assert(hasDot(df.queryExecution.optimizedPlan),
      s"no DotProduct in: ${df.queryExecution.optimizedPlan}")
    // ...and the analyzed (pre-optimizer) plan must not, proving the
    // rule (not the query author) did the rewrite.
    assert(!hasDot(df.queryExecution.analyzed))
  }

  test("rewrite preserves values bit-for-bit vs the native direct path") {
    val viaHof = vecs
      .select(col("vec_id"), Similarity.dotHof(col("v"), col("v")).as("d"))
      .orderBy("vec_id").collect().map(_.getDouble(1))
    val viaNative = vecs
      .select(col("vec_id"), Similarity.dot(col("v"), col("v")).as("d"))
      .orderBy("vec_id").collect().map(_.getDouble(1))
    assert(viaHof.sameElements(viaNative))
  }

  test("DotProduct matches the HOF fold on null/mismatch edge cases") {
    // parquet-backed so neither side constant-folds
    val tmp = java.nio.file.Files.createTempDirectory("dotp").toString
    Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),       // dense, equal length
      (2L, Seq(1.0), Seq(1.0, 2.0)),            // length mismatch → null
      (3L, Seq[Double](), Seq[Double]()),       // empty → 0.0
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(tmp)
    // a null element (Seq of boxed) → null
    val df = spark.read.parquet(tmp)
    val both = df.select(col("id"),
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .orderBy("id").collect()
    both.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch: $r")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
    assert(both(1).isNullAt(1)) // the mismatched row really is null
    assert(both(2).getDouble(1) == 0.0)
  }

  test("non-matching folds are left alone") {
    // zero literal != 0.0 → not a dot product; must keep the HOF form
    val df = vecs.select(aggregate(
      zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(1.5), (acc, v) => acc + v).as("d"))
    val analyzed = df.queryExecution.analyzed
    val rewritten = RewriteHofDotProduct(analyzed)
    assert(rewritten == analyzed)
    assert(!hasDot(df.queryExecution.optimizedPlan))
  }

  test("graft_dot is callable from pure SQL and matches the HOF fold") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), " +
        "array(4.0D, 5.0D, 6.0D)) AS d").collect()(0).getDouble(0)
    assert(r == 32.0)
    // null cases follow the HOF fold's contract (see DotProduct)
    val edge = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS a, " +
        "graft_dot(array(1.0D), array(1.0D, 2.0D)) AS b, " +
        "graft_dot(CAST(array() AS ARRAY<DOUBLE>), " +
        "CAST(array() AS ARRAY<DOUBLE>)) AS c").collect()(0)
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.getDouble(2) == 0.0)
    // the SQL path plans the SAME native expression the DataFrame API
    // uses — whole-stage codegen, no lambda interpretation
    val plan = spark.sql(
      "SELECT graft_dot(CAST(a.v AS ARRAY<DOUBLE>), CAST(a.v AS " +
        "ARRAY<DOUBLE>)) FROM VALUES (array(1.0D)) AS a(v)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot") || plan.contains("dotproduct") ||
      plan.toLowerCase.contains("dot"), plan)
  }

  test("ev_skew_join under a Zipf key: AQE splits the hot partition " +
      "(skew=true in the final SMJ) and the result matches the " +
      "unhinted plan row-for-row (r12 verdict #4)") {
    // forced-skew corpus: ~90% of events collapse onto ONE user, the
    // Zipf shape the skew bench's GenSkew events carry at sf1
    val src = Tables.load(spark, SparkTestSession.sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("skewjoin").toString
    // ×10 replication (distinct event_ids) so the hot partition's
    // shuffle bytes clear the scoped skew threshold at test scale
    src.crossJoin(spark.range(10).toDF("k"))
      .withColumn("event_id", col("event_id") * 10 + col("k")).drop("k")
      .withColumn("user_id",
        when(col("event_id") % 10 =!= 0, lit(1L)).otherwise(col("user_id")))
      // many part files: one file is one parquet row group, i.e. ONE
      // mapper owning every hot row -- and AQE can only split a skewed
      // partition along mapper boundaries
      .repartition(10)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // thresholds sized to the test corpus so the hot post-shuffle
    // partition REGISTERS as skewed and splits (production keeps the
    // 256 MB defaults; the mechanism under test is identical)
    val scoped = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      // AQE splits a skewed partition along MAPPER boundaries — a
      // single-map-task shuffle is unsplittable regardless of skew, so
      // the scan must yield several map tasks at test scale (at 100 TB
      // thousands of mappers is the given)
      "spark.sql.files.maxPartitionBytes" -> "16KB",
      "spark.sql.files.openCostInBytes" -> "0")
    val prev = scoped.map { case (k, _) => k -> spark.conf.getOption(k) }
    scoped.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = SparkEntry.queries("ev_skew_join")
      val df = q(spark, dir)
      val got = df.collect().map(r => (r.getTimestamp(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
      // AQE finalizes the plan only after execution: the final SMJ on
      // the hot key must carry the skew-split marker
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected an AQE skew-split SMJ in:\n$plan")
      // same values as the unhinted declarative plan (whatever shape
      // Catalyst picks for it)
      val e = Tables.load(spark, dir, "events")
      val errs = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("a_ts"),
          col("event_id").as("a_id"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
          col("event_id").as("b_id"))
      val want = errs.join(buys,
          col("user_id") === col("b_user") &&
            col("b_ts") > col("a_ts") &&
            col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(date_trunc("hour", col("a_ts")).as("err_hour"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("b_id") - col("a_id")).as("id_delta_sum"),
          max(col("b_id")).as("max_purchase_id"))
        .orderBy("err_hour")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSeq
      assert(got == want)
      assert(got.map(_._2).sum > 100,
        "vacuous-skew guard: the hot user must dominate the pair volume")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
