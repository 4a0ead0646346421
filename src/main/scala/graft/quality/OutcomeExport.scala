package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TestOutcomes export — the reference's export-observability flow
  * (SURVEY.md §3.1 step 6): evaluated test results are packed into
  * API-shaped events, `chunkSize` outcomes per event (the reference posts
  * 100 per request, demo/demo/demo_helper.py:803-816), each outcome
  * carrying the nested testgen integration block
  * (§1.2: name / status / description / metric_value / max_threshold +
  * integrations.testgen.{table, test_suite, columns, test_parameters}
  * — four levels of struct/array nesting, demo_helper.py:836-886), and
  * each EVENT carrying the dataset-level `component_integrations` block
  * (demo_helper.py:971-989: integrations.testgen.{database_name, schema,
  * tables{include_pattern, include_list}, connection_name, version,
  * table_group_configuration{group_id, project_code, uses_sampling}})
  * plus the lifted `max_threshold` / `metric_value` scalars the reference
  * copies out of the last outcome's test_parameters (demo_helper.py:
  * 880-886).
  *
  * Scale note: the input is a per-table test-result set — hundreds of
  * rows of control-plane data, not a data-scale path — so the global
  * chunk-numbering window is deliberate and bounded.
  */
object OutcomeExport {

  /** The dataset-level testgen component configuration, field-for-field
    * the reference's `component_integrations` payload (demo_helper.py:
    * 971-989; defaults are that demo's public constants). Control-plane
    * data: it renders into the packed events as a constant struct.
    */
  final case class TestgenComponent(
      databaseName: String = "production",
      schemaName: String = "test_gen",
      includePattern: String = "%",
      includeList: Seq[String] =
        Seq("D_Customer", "D_Order", "D_Product", "F_PT_TRTMT_Summary"),
      connectionName: String = "default",
      version: Long = 1L,
      groupId: String = "0ea85e17-acbe-47fe-8394-9970725ad37d",
      projectCode: String = "DEFAULT",
      usesSampling: Boolean = false)

  /** The export component both registered export queries carry — the
    * reference demo constants with the three relational tables
    * include-listed, so `include_listed` exercises the membership both
    * ways (events is deliberately NOT listed). ONE literal: the rollup
    * gate (dq_export_rollup_customer) and the quick-start pipeline must
    * gate the same component config, with a single edit point.
    */
  val RelationalComponent: TestgenComponent =
    TestgenComponent(includeList = Seq("customer", "lineitem", "orders"))

  private def componentStruct(c: TestgenComponent): Column =
    struct(struct(struct(
      lit(c.databaseName).as("database_name"),
      lit(c.schemaName).as("schema"),
      struct(lit(c.includePattern).as("include_pattern"),
        array(c.includeList.map(lit): _*).as("include_list"))
        .as("tables"),
      lit(c.connectionName).as("connection_name"),
      lit(c.version).as("version"),
      struct(lit(c.groupId).as("group_id"),
        lit(c.projectCode).as("project_code"),
        lit(c.usesSampling).as("uses_sampling"))
        .as("table_group_configuration")).as("testgen"))
      .as("integrations"))

  def pack(results: DataFrame, suite: String, chunkSize: Int = 100,
           component: TestgenComponent = TestgenComponent()): DataFrame = {
    val w = Window.orderBy("table_name", "column_name", "test_type")
    val outcome = struct(
      col("test_type").as("name"),
      col("status"),
      col("message").as("description"),
      col("measure").as("metric_value"),
      col("threshold").as("max_threshold"),
      struct(struct(
        col("table_name").as("table"),
        lit(suite).as("test_suite"),
        array(col("column_name")).as("columns"),
        array(
          struct(lit("Measured_Value").as("name"),
            format_string("%.4f", col("measure")).as("value")),
          struct(lit("Threshold_Value").as("name"),
            format_string("%.4f", col("threshold")).as("value")))
          .as("test_parameters")).as("testgen")).as("integrations"))
    results.withColumn("__rn", row_number().over(w))
      .withColumn("chunk", expr(s"(__rn - 1) div $chunkSize"))
      .groupBy("chunk")
      .agg(collect_list(outcome).as("test_outcomes"),
        count(lit(1)).as("n_outcomes"),
        // the reference walks the chunk's outcomes in order and keeps
        // overwriting, so the LAST outcome's parameters win; max_by on
        // the deterministic row number reproduces that without relying
        // on collect_list order. Measured_Value plays the reference's
        // Baseline_Value → metric_value role.
        max_by(col("threshold"), col("__rn")).as("max_threshold"),
        max_by(col("measure"), col("__rn")).as("metric_value"))
      .withColumn("component_integrations", componentStruct(component))
      .orderBy("chunk")
  }

  /** Inverse of [[pack]]: explode events back to flat outcome rows, with
    * the threshold lifted out of the nested test_parameters array the way
    * the reference lifts `Threshold_Value` → `max_threshold`
    * (demo_helper.py:880-886).
    */
  def unpack(events: DataFrame): DataFrame =
    events.select(col("chunk"), explode(col("test_outcomes")).as("o"))
      .select(col("chunk"),
        col("o.name"), col("o.status"), col("o.description"),
        col("o.metric_value"), col("o.max_threshold"),
        col("o.integrations.testgen.table").as("table_name"),
        element_at(col("o.integrations.testgen.columns"), 1)
          .as("column_name"),
        element_at(filter(col("o.integrations.testgen.test_parameters"),
          p => p.getField("name") === "Threshold_Value"), 1)
          .getField("value").as("threshold_param"))

  /** Status rollup straight off the packed events — the ingest-side
    * consumer of the full nested shape: every row traverses BOTH
    * four-level paths (event → component_integrations → integrations →
    * testgen → table_group_configuration, and event → test_outcomes[]
    * → integrations → testgen → table), so a field misplaced at any
    * level breaks the oracle hash. `include_listed` checks the
    * outcome's table against the component's include_list array — the
    * tables-covered contract the reference's table-group configuration
    * expresses.
    */
  def statusRollup(events: DataFrame): DataFrame = {
    val tg = col("component_integrations.integrations.testgen")
    events.select(
        tg.getField("database_name").as("database_name"),
        tg.getField("schema").as("schema_name"),
        tg.getField("connection_name").as("connection_name"),
        tg.getField("version").as("cfg_version"),
        tg.getField("table_group_configuration").getField("group_id")
          .as("group_id"),
        tg.getField("table_group_configuration").getField("project_code")
          .as("project_code"),
        tg.getField("table_group_configuration").getField("uses_sampling")
          .as("uses_sampling"),
        tg.getField("tables").getField("include_list").as("__incl"),
        explode(col("test_outcomes")).as("o"))
      .select(col("database_name"), col("schema_name"),
        col("connection_name"), col("cfg_version"), col("group_id"),
        col("project_code"), col("uses_sampling"),
        col("o.integrations.testgen.table").as("table_name"),
        array_contains(col("__incl"),
          col("o.integrations.testgen.table")).as("include_listed"),
        col("o.status").as("status"))
      .groupBy("database_name", "schema_name", "connection_name",
        "cfg_version", "group_id", "project_code", "uses_sampling",
        "table_name", "include_listed", "status")
      .agg(count(lit(1)).as("n_outcomes"))
      .orderBy("table_name", "status")
  }
}
