package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.OptimizerFence.fence

/** OptimizerFence: identity semantics, and the pushdown blowup it
  * exists to prevent (the config-migration chain) stays prevented.
  */
class FenceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("fence is a value-level identity including nulls") {
    val df = Seq(Some("a"), None, Some("c")).toDF("v")
    val got = df.select(fence(col("v")).as("v"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("a"), None, Some("c")))
    // array type passes through unchanged too
    val arr = Seq(Seq(1, 2)).toDF("a")
      .select(fence(col("a")).as("a")).collect()(0).getSeq[Int](0)
    assert(arr == Seq(1, 2))
  }

  test("fence stays inside whole-stage codegen (no fallback)") {
    // a fenced projection over a scan must still produce a
    // WholeStageCodegen stage containing the project
    val df = spark.range(10).select(fence(col("id") * 2).as("x"))
      .filter(col("x") > 5)
    // "*(n)" is the whole-stage-codegen stage marker in the plan string;
    // the fenced Project must carry it (no InputAdapter fallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("graft_fence")), plan)
    assert(df.count() == 7)
  }

  test("migration chain: pushed predicates stop at the fence, so the " +
      "rule expressions are never multiplied") {
    // the defect this guards: a filter over migrate() output was pushed
    // through the 5-rule chain by alias substitution, inflating ~190
    // copies of the rule regexes into one 28 KB Filter condition below
    // the chain and blowing the 64 KB JVM method limit
    val q = graft.queries.ConfigQueries
      .queries("config_migrate_nation")(spark, SparkTestSession.sf)
    val opt = q.queryExecution.optimizedPlan
    val filters = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(filters.nonEmpty)
    filters.foreach { f =>
      val cond = f.condition.toString
      // the filter must reference chain OUTPUTS, not re-derive them:
      // a substituted condition carries the rule regexes inline
      assert(!cond.contains("^version: "),
        s"filter re-derives the rule chain: ${cond.take(200)}")
      assert(cond.length < 1000,
        s"filter condition suspiciously large (${cond.length} chars)")
    }
  }
}
