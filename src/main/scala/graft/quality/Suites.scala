package graft.quality

/** Static test suites over the harness tables, with baseline statistics
  * captured from a profiling run of the sf0.001 data (playing the role of the
  * reference's baseline profiling run — TestGen captures baselines, later
  * refreshes are tested against them). Baselines are literals by design:
  * that is exactly how the reference ships them in
  * demo/input_data/data_tests.csv ("Baseline_Avg=2513.885, …").
  *
  * Coverage: all 25 reference test types plus the extended types
  * (Valid_Characters, Row_Ct_Pct, LOV_All, Daily_Record_Ct) appear across
  * the three suites.
  */
object Suites {

  private def t(table: String, column: String, tt: String,
                kv: (String, String)*): TestDef =
    TestDef(table, column, tt, kv.toMap)

  val lineitem: Seq[TestDef] = Seq(
    t("lineitem", "N/A", "Row_Ct", "Baseline_Ct" -> "6000",
      "Threshold_Value" -> "6000"),
    t("lineitem", "l_orderkey", "Required", "Threshold_Value" -> "0"),
    t("lineitem", "l_quantity", "Missing_Pct", "Baseline_Ct" -> "6000",
      "Baseline_Value_Ct" -> "6000", "Threshold_Value" -> "2"),
    t("lineitem", "l_partkey", "Unique_Pct", "Baseline_Unique_Ct" -> "200",
      "Baseline_Value_Ct" -> "6000", "Threshold_Value" -> "0.5"),
    t("lineitem", "l_returnflag", "LOV_Match",
      "Baseline_Value" -> "('A','N','R')", "Threshold_Value" -> "0"),
    t("lineitem", "l_shipdate", "Distinct_Date_Ct",
      "Baseline_Value" -> "2289", "Threshold_Value" -> "2289"),
    t("lineitem", "l_shipdate", "Min_Date",
      "Baseline_Value" -> "1995-01-02 00:00:00", "Threshold_Value" -> "0"),
    t("lineitem", "l_shipdate", "Future_Date", "Threshold_Value" -> "0"),
    t("lineitem", "l_shipdate", "Future_Date_1Y", "Threshold_Value" -> "0"),
    t("lineitem", "l_shipdate", "Recency", "Threshold_Value" -> "9000"),
    t("lineitem", "l_shipdate", "Monthly_Rec_Ct", "Threshold_Value" -> "0"),
    t("lineitem", "l_shipdate", "Weekly_Rec_Ct", "Threshold_Value" -> "0"),
    t("lineitem", "l_quantity", "Avg_Shift", "Baseline_Value_Ct" -> "6000",
      "Baseline_Avg" -> "25.376166666666666",
      "Baseline_SD" -> "14.521173370343169", "Threshold_Value" -> "0.5"),
    t("lineitem", "l_extendedprice", "Dec_Trunc",
      "Threshold_Value" -> "2980.31"),
    t("lineitem", "l_extendedprice", "Incr_Avg_Shift",
      "Baseline_Value_Ct" -> "6000", "Baseline_Sum" -> "317364757.3100006",
      "Baseline_Avg" -> "52894.12621833343",
      "Baseline_SD" -> "30141.111152195346", "Threshold_Value" -> "2"),
    t("lineitem", "l_quantity", "Min_Val", "Baseline_Value" -> "1.0",
      "Threshold_Value" -> "0"),
    t("lineitem", "l_extendedprice", "Outlier_Pct_Above",
      "Baseline_Avg" -> "52894.12621833343",
      "Baseline_SD" -> "30141.111152195346", "Threshold_Value" -> "0.05"),
    t("lineitem", "l_quantity", "Outlier_Pct_Below",
      "Baseline_Avg" -> "25.376166666666666",
      "Baseline_SD" -> "14.521173370343169", "Threshold_Value" -> "0.05"),
    t("lineitem", "l_suppkey", "Distinct_Value_Ct",
      "Baseline_Value" -> "10", "Threshold_Value" -> "10"),
    // the reference's two custom test types: user-authored SQL shared
    // verbatim by the Spark plan and the oracle
    t("lineitem", "l_quantity", "Custom_Condition",
      "Condition" -> "l_quantity >= 1 AND l_quantity <= 50",
      "Threshold_Value" -> "0"),
    t("lineitem", "l_extendedprice", "Custom_Agg",
      "Expression" ->
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)",
      "Threshold_Value" -> "300000000"),
  )

  val orders: Seq[TestDef] = Seq(
    t("orders", "N/A", "Row_Ct", "Baseline_Ct" -> "1500",
      "Threshold_Value" -> "1500"),
    t("orders", "o_orderkey", "Unique", "Threshold_Value" -> "0"),
    t("orders", "o_custkey", "Missing_Pct", "Baseline_Ct" -> "1500",
      "Baseline_Value_Ct" -> "1500", "Threshold_Value" -> "2"),
    t("orders", "o_orderdate", "Min_Date",
      "Baseline_Value" -> "1995-01-01 00:00:00", "Threshold_Value" -> "0"),
    t("orders", "o_orderdate", "Future_Date", "Threshold_Value" -> "0"),
    t("orders", "o_orderdate", "Recency", "Threshold_Value" -> "9500"),
    t("orders", "o_orderdate", "Monthly_Rec_Ct", "Threshold_Value" -> "0"),
    t("orders", "o_orderdate", "Weekly_Rec_Ct", "Threshold_Value" -> "0"),
    t("orders", "o_orderstatus", "Distinct_Value_Ct",
      "Baseline_Value" -> "3", "Threshold_Value" -> "3"),
    t("orders", "o_orderpriority", "LOV_Match",
      "Baseline_Value" -> "('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')",
      "Threshold_Value" -> "0"),
    t("orders", "o_totalprice", "Avg_Shift", "Baseline_Value_Ct" -> "1500",
      "Baseline_Avg" -> "249631.19440666703",
      "Baseline_SD" -> "144962.92955051153", "Threshold_Value" -> "0.5"),
    t("orders", "o_totalprice", "Incr_Avg_Shift",
      "Baseline_Value_Ct" -> "1500", "Baseline_Sum" -> "374446791.61",
      "Baseline_Avg" -> "249631.19440666703",
      "Baseline_SD" -> "144962.92955051153", "Threshold_Value" -> "2"),
    t("orders", "o_orderstatus", "LOV_All",
      "Baseline_Value" -> "('F','O','P')", "Threshold_Value" -> "0"),
    t("orders", "o_orderdate", "Daily_Record_Ct", "Threshold_Value" -> "0"),
  )

  val customer: Seq[TestDef] = Seq(
    t("customer", "N/A", "Row_Ct", "Baseline_Ct" -> "150",
      "Threshold_Value" -> "150"),
    t("customer", "c_custkey", "Unique", "Threshold_Value" -> "0"),
    t("customer", "c_name", "Required", "Threshold_Value" -> "0"),
    t("customer", "c_name", "Alpha_Trunc", "Baseline_Value" -> "18",
      "Threshold_Value" -> "0"),
    t("customer", "c_name", "Unique_Pct", "Baseline_Unique_Ct" -> "150",
      "Baseline_Value_Ct" -> "150", "Threshold_Value" -> "0.5"),
    t("customer", "c_name", "Pattern_Match",
      "Baseline_Value" -> "Customer#[0-9]{9}", "Threshold_Value" -> "0"),
    t("customer", "c_name", "Email_Format", "Threshold_Value" -> "0"),
    t("customer", "c_mktsegment", "US_State", "Threshold_Value" -> "0"),
    t("customer", "c_mktsegment", "LOV_Match",
      "Baseline_Value" -> "('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')",
      "Threshold_Value" -> "0"),
    t("customer", "c_acctbal", "Missing_Pct", "Baseline_Ct" -> "150",
      "Baseline_Value_Ct" -> "150", "Threshold_Value" -> "2"),
    t("customer", "c_acctbal", "Min_Val", "Baseline_Value" -> "-846.69",
      "Threshold_Value" -> "0"),
    t("customer", "c_acctbal", "Avg_Shift", "Baseline_Value_Ct" -> "150",
      "Baseline_Avg" -> "4346.81146666667",
      "Baseline_SD" -> "3168.736464090096", "Threshold_Value" -> "0.5"),
    t("customer", "c_nationkey", "Constant", "Baseline_Value" -> "10",
      "Threshold_Value" -> "0"),
    t("customer", "c_name", "Valid_Characters", "Threshold_Value" -> "0"),
    t("customer", "N/A", "Row_Ct_Pct", "Baseline_Ct" -> "150",
      "Threshold_Value" -> "10"),
  )

  /** Quality tests over the event-stream table itself — the reference
    * profiles and tests the Observability store's tables like any other
    * (dataset components carry testgen integrations, demo_helper.py:
    * 971-989); baselines pinned from the sf0.001 events profile.
    */
  val events: Seq[TestDef] = Seq(
    t("events", "N/A", "Row_Ct", "Baseline_Ct" -> "1000",
      "Threshold_Value" -> "1000"),
    t("events", "N/A", "Row_Ct_Pct", "Baseline_Ct" -> "1000",
      "Threshold_Value" -> "10"),
    t("events", "event_id", "Unique", "Threshold_Value" -> "0"),
    t("events", "event_type", "LOV_Match",
      "Baseline_Value" -> "('click','error','purchase','signup','view')",
      "Threshold_Value" -> "0"),
    t("events", "event_type", "LOV_All",
      "Baseline_Value" -> "('click','error','purchase','signup','view')",
      "Threshold_Value" -> "0"),
    t("events", "event_type", "Distinct_Value_Ct",
      "Baseline_Value" -> "5", "Threshold_Value" -> "5"),
    t("events", "value", "Min_Val", "Baseline_Value" -> "0.03",
      "Threshold_Value" -> "0"),
    t("events", "value", "Avg_Shift", "Baseline_Value_Ct" -> "1000",
      "Baseline_Avg" -> "50.05019",
      "Baseline_SD" -> "47.551234039955496", "Threshold_Value" -> "0.5"),
    t("events", "value", "Incr_Avg_Shift", "Baseline_Value_Ct" -> "1000",
      "Baseline_Sum" -> "50050.19", "Baseline_Avg" -> "50.05019",
      "Baseline_SD" -> "47.551234039955496", "Threshold_Value" -> "2"),
    t("events", "ts", "Min_Date",
      "Baseline_Value" -> "2024-01-01 00:00:00", "Threshold_Value" -> "0"),
    t("events", "ts", "Future_Date", "Threshold_Value" -> "0"),
    t("events", "ts", "Recency", "Threshold_Value" -> "1000"),
    t("events", "ts", "Distinct_Date_Ct", "Baseline_Value" -> "30",
      "Threshold_Value" -> "30"),
    t("events", "ts", "Daily_Record_Ct", "Threshold_Value" -> "0"),
    t("events", "user_id", "Distinct_Value_Ct", "Baseline_Value" -> "15",
      "Threshold_Value" -> "15"),
    t("events", "props", "Required", "Threshold_Value" -> "0"),
  )

  val all: Map[String, Seq[TestDef]] = Map(
    "lineitem" -> lineitem, "orders" -> orders, "customer" -> customer,
    "events" -> events)
}
