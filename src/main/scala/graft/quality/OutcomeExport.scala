package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TestOutcomes export — the reference's export-observability flow
  * (SURVEY.md §3.1 step 6): evaluated test results are packed into
  * API-shaped events, `chunkSize` outcomes per event (the reference posts
  * 100 per request, demo/demo/demo_helper.py:803-816), each outcome
  * carrying the nested testgen integration block
  * (§1.2: name / status / description / metric_value / max_threshold +
  * integrations.testgen.{table, test_suite, columns, test_parameters}
  * — four levels of struct/array nesting, demo_helper.py:836-886).
  *
  * Scale note: the input is a per-table test-result set — hundreds of
  * rows of control-plane data, not a data-scale path — so the global
  * chunk-numbering window is deliberate and bounded.
  */
object OutcomeExport {

  def pack(results: DataFrame, suite: String,
           chunkSize: Int = 100): DataFrame = {
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
        count(lit(1)).as("n_outcomes"))
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
}
