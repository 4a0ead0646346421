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
}
