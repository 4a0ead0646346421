package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.profile.Profiler
import graft.quality.{Suites, TestEvaluator, TestGenerator}

/** Data-quality test surface wired into the driver contract. The three
  * static suites carry sf0.001-profiled baselines as literals and cover all
  * 25 reference test types; `dq_autogen_lineitem` exercises the full
  * profile→generate→evaluate pipeline (baselines derived from the data at
  * runtime, so it gets the rows-only check — no static oracle can exist).
  */
object QualityQueries {

  private def suite(table: String)(s: SparkSession, dir: String): DataFrame =
    TestEvaluator.run(Tables.load(s, dir, table), Suites.all(table))

  private def autogen(table: String)(s: SparkSession,
                                     dir: String): DataFrame = {
    val df = Tables.load(s, dir, table)
    val profile = Profiler.profile(df, table)
    TestEvaluator.run(df, TestGenerator.generate(profile))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_lineitem" -> suite("lineitem") _,
    "dq_orders" -> suite("orders") _,
    "dq_customer" -> suite("customer") _,
    "dq_autogen_lineitem" -> autogen("lineitem") _,
  )

  val oracles: Map[String, String] = Map(
    "dq_lineitem" -> TestEvaluator.oracleSql("lineitem", Suites.lineitem),
    "dq_orders" -> TestEvaluator.oracleSql("orders", Suites.orders),
    "dq_customer" -> TestEvaluator.oracleSql("customer", Suites.customer),
  )
}
