package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.profile.Profiler
import graft.quality.{Quickstart, TestDef, TestEvaluator}

/** The quick-start pipeline's two load-bearing contracts:
  *
  *  1. PARITY between the runtime decision path (TestGenerator over the
  *     actual profile) and the oracle's symbolic decision path
  *     (Quickstart.symbolicTests over pinned facts) — the two must emit
  *     the identical (column, test_type) set per table at the driver's
  *     verification scale, or the CTE-chain oracle gates a different
  *     suite than the engine ran (the ControlPlaneSpec pattern).
  *     Pinned at sf0.01 (the driver gate SF; two facts genuinely differ
  *     at sf0.001 — see Quickstart scaladoc).
  *
  *  2. NON-VACUOUSNESS of the all-PASSED rollup: evaluating the
  *     self-generated suite on the SAME data passes by construction, so
  *     the spec perturbs the data (injected nulls, an out-of-domain
  *     category, an out-of-range value) and asserts the generated suite
  *     FAILS the right tests — proving the statuses come from real
  *     measure/threshold math, not a constant.
  */
class QuickstartSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Runtime-generated defs for one configured table at a given SF —
    * through the pipeline's OWN generate step (Quickstart.generateDefs),
    * so the spec cannot keep passing against a private re-implementation
    * while the registered query's generation drifts.
    */
  private def runtimeDefs(sfDir: String,
                          t: Quickstart.TableCfg): Seq[TestDef] = {
    val df = Tables.load(spark, sfDir, t.table)
    Quickstart.generateDefs(df, Profiler.profile(df, t.table), t)
  }

  test("symbolic oracle generation matches runtime generation per " +
      "(column, test_type) at the driver verification scale") {
    Quickstart.Config.foreach { t =>
      val runtime = runtimeDefs("/root/testdata/sf0.01", t)
        .map(d => (d.column, d.testType)).toSet
      val symbolic = Quickstart.expectedTypes(t)
      assert(runtime == symbolic,
        s"${t.table}: runtime-only=${runtime -- symbolic} " +
          s"symbolic-only=${symbolic -- runtime}")
    }
  }

  test("LOV derivation is one fused job: generate-step Spark job count " +
      "does not grow with the number of LOV columns") {
    import Quickstart.{ColCfg, TableCfg}
    val df = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val prof = Profiler.profile(df, "orders").localCheckpoint(true)
    def jobsFor(tag: String, t: TableCfg): Int = {
      spark.sparkContext.setJobGroup(tag, tag)
      try {
        val defs = Quickstart.generateDefs(df, prof, t)
        assert(defs.nonEmpty)
      } finally spark.sparkContext.clearJobGroup()
      spark.sparkContext.statusTracker.getJobIdsForGroup(tag).length
    }
    // one vs two low-cardinality string columns (o_orderpriority has 5
    // values, same LOV trigger band as o_orderstatus)
    val one = jobsFor("lov-one", TableCfg("orders", Seq(
      ColCfg("o_orderstatus", "str", distinctValueCt = true))))
    val two = jobsFor("lov-two", TableCfg("orders", Seq(
      ColCfg("o_orderstatus", "str", distinctValueCt = true),
      ColCfg("o_orderpriority", "str", distinctValueCt = true))))
    assert(one > 0, "LOV derivation must actually run a job")
    assert(two == one,
      s"job count must not scale with LOV columns: 1 col -> $one " +
        s"jobs, 2 cols -> $two jobs")
    // and the fused pass preserves the (count desc, value asc) domain
    // order the oracle mirrors
    val defs = Quickstart.generateDefs(df, prof, TableCfg("orders", Seq(
      ColCfg("o_orderstatus", "str", distinctValueCt = true,
        lov = Seq("F", "O", "P")))))
    val lovDef = defs.find(_.testType == "LOV_Match")
    assert(lovDef.nonEmpty, "LOV_Match must generate for o_orderstatus")
  }

  test("failure injection mid-evaluate: required failure skips export, " +
      "compensation runs in reverse order discarding partial state, " +
      "and the rerun converges to the uninterrupted rollup") {
    import graft.jobs.MultiStepJob
    var fired = false
    val failed = Quickstart.runJob(spark, SparkTestSession.sf,
      failHook = name => if (name == "evaluate" && !fired) {
        fired = true
        throw new RuntimeException("injected mid-evaluate failure")
      })
    assert(!failed.succeeded)
    val byName = failed.steps.map(s => s.name -> s.status).toMap
    assert(byName("profile") == MultiStepJob.Ok)
    assert(byName("generate") == MultiStepJob.Ok)
    assert(byName("evaluate") == MultiStepJob.Failed)
    assert(byName("export") == MultiStepJob.Skipped,
      "export must not run on a required evaluate failure")
    // compensation: reverse order of the EXECUTED steps, and every
    // partial output discarded — a rerun starts from nothing
    assert(failed.ctx("compensated") ==
      Seq("evaluate", "generate", "profile"))
    assert(!failed.ctx.contains("rollup"))
    assert(!failed.ctx.keys.exists(_.startsWith("profile:")))
    assert(!failed.ctx.keys.exists(_.startsWith("defs:")))
    assert(!failed.ctx.keys.exists(_.startsWith("outcomes:")))
    // the rerun (no injection — the transient failure cleared, the
    // availablenow recovery pattern) must produce the exact rollup an
    // uninterrupted run produces
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(xxhash64(df.columns.map(col): _*)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect()(0)
    val rerun = Quickstart.run(spark, SparkTestSession.sf)
    val uninterrupted = Quickstart.run(spark, SparkTestSession.sf)
    assert(sig(rerun) == sig(uninterrupted))
    assert(rerun.count() > 0)
  }

  test("the generated suite is not vacuously PASSED: perturbed data " +
      "fails the right generated tests") {
    import spark.implicits._
    val t = Quickstart.Config.find(_.table == "customer").get
    val defs = runtimeDefs(SparkTestSession.sf, t)
    val base = Tables.load(spark, SparkTestSession.sf, "customer")
    // three planted violations: a null in a Required column, an
    // out-of-domain market segment, an account balance far past the
    // baseline max + headroom. The generated defs only reference the
    // three configured columns, so the perturbed frame carries exactly
    // those.
    val perturbed = base
      .select(col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      .limit(100)
      .unionByName(Seq(
        (null.asInstanceOf[String], "PLUTONIUM", 1.0e9))
        .toDF("c_name", "c_mktsegment", "c_acctbal"))
    val out = TestEvaluator.run(perturbed, defs)
      .select("column_name", "test_type", "status")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2))
      .toMap
    assert(out(("c_name", "Required")) != "PASSED",
      "a planted null must fail/warn the Required test")
    assert(out(("c_mktsegment", "LOV_Match")) != "PASSED",
      "an out-of-domain category must fail/warn LOV_Match")
    assert(out(("c_acctbal", "Max_Val")) != "PASSED",
      "an out-of-range value must fail/warn Max_Val")
  }

  test("the saga-driven pipeline runs end to end and rolls up every " +
      "generated outcome") {
    val rollup = Quickstart.run(spark, SparkTestSession.sf).collect()
    val perTable = rollup.groupBy(_.getAs[String]("table_name"))
      .view.mapValues(_.map(_.getAs[Long]("n_outcomes")).sum).toMap
    Quickstart.Config.foreach { t =>
      // expected count from the runtime generator at the SAME SF — the
      // symbolic facts are pinned for sf0.01 and l_shipdate's daily
      // density genuinely differs at sf0.001 (see Quickstart scaladoc);
      // symbolic-vs-runtime parity is test 1's subject, at the gate SF
      val expected = runtimeDefs(SparkTestSession.sf, t).size
      assert(perTable.get(t.table).contains(expected.toLong),
        s"${t.table}: rollup outcomes ${perTable.get(t.table)} != " +
          s"generated $expected")
    }
    // events is deliberately outside the component include list
    assert(rollup.filter(_.getAs[String]("table_name") == "events")
      .forall(!_.getAs[Boolean]("include_listed")))
    assert(rollup.filter(_.getAs[String]("table_name") == "customer")
      .forall(_.getAs[Boolean]("include_listed")))
  }
}
