package graft.quality

import org.apache.spark.sql.{DataFrame, Row}

/** Algorithmic test generation from a column profile — the reference's
  * "auto-generation of 32 data quality validation tests" (README.md:207-209):
  * a pure function ColumnProfile → List[TestDef]. The profile DataFrame is
  * one row per column (tiny at any data scale), so collecting it driver-side
  * is free; the generated defs then evaluate distributed via TestEvaluator.
  */
object TestGenerator {

  def generate(profile: DataFrame,
               lovs: Map[String, Seq[String]] = Map.empty): Seq[TestDef] = {
    val rows = profile.collect()
    if (rows.isEmpty) return Seq.empty
    val table = rows.head.getAs[String]("table_name")
    val recordCt = rows.head.getAs[Long]("record_ct")

    def num(r: Row, f: String): Option[Double] = {
      if (r.isNullAt(r.fieldIndex(f))) None
      else r.get(r.fieldIndex(f)) match {
        case d: java.math.BigDecimal => Some(d.doubleValue())
        case d: Double               => Some(d)
        case l: Long                 => Some(l.toDouble)
        case i: Int                  => Some(i.toDouble)
        case _                       => None
      }
    }
    def p(kv: (String, String)*) = kv.toMap

    val tableTests = Seq(TestDef(table, "N/A", "Row_Ct",
      p("Baseline_Ct" -> recordCt.toString,
        "Threshold_Value" -> recordCt.toString)))

    val colTests = rows.toSeq.flatMap { r =>
      val c = r.getAs[String]("column_name")
      val dt = r.getAs[String]("data_type")
      val valueCt = r.getAs[Long]("value_ct")
      val nullCt = r.getAs[Long]("null_ct")
      val distinctCt = r.getAs[Long]("distinct_ct")
      val isNum = Set("int", "bigint", "double", "float", "decimal")(dt)
      val isStr = dt == "string"
      val isTs = dt == "timestamp"
      val b = Seq.newBuilder[TestDef]

      if (valueCt == 0) Seq.empty
      else {
        if (nullCt == 0)
          b += TestDef(table, c, "Required", p("Threshold_Value" -> "0"))
        else
          b += TestDef(table, c, "Missing_Pct",
            p("Baseline_Ct" -> recordCt.toString,
              "Baseline_Value_Ct" -> valueCt.toString,
              "Threshold_Value" -> "2"))
        if (distinctCt == valueCt && valueCt > 1)
          b += TestDef(table, c, "Unique", p("Threshold_Value" -> "0"))
        else if (distinctCt > 1)
          b += TestDef(table, c, "Unique_Pct",
            p("Baseline_Unique_Ct" -> distinctCt.toString,
              "Baseline_Value_Ct" -> valueCt.toString,
              "Threshold_Value" -> "0.5"))
        if (distinctCt == 1 && isStr)
          // constant column: lock it down (needs the value via lovs)
          lovs.get(c).flatMap(_.headOption).foreach { v =>
            b += TestDef(table, c, "Constant",
              p("Baseline_Value" -> v, "Threshold_Value" -> "0"))
          }
        if (isStr) {
          num(r, "max_len").foreach { ml =>
            b += TestDef(table, c, "Alpha_Trunc",
              p("Baseline_Value" -> ml.toLong.toString,
                "Threshold_Value" -> "0"))
          }
          if (distinctCt > 1 && distinctCt <= 20 && lovs.contains(c))
            b += TestDef(table, c, "LOV_Match",
              p("Baseline_Value" ->
                lovs(c).map(v => s"'${v.replace("'", "''")}'")
                  .mkString("(", ",", ")"),
                "Threshold_Value" -> "0"))
        }
        if (isNum) {
          for (mn <- num(r, "min_num"))
            b += TestDef(table, c, "Min_Val",
              p("Baseline_Value" -> mn.toString, "Threshold_Value" -> "0"))
          for (avg <- num(r, "avg_num"); sd <- num(r, "stdev_num")
               if sd > 0) {
            b += TestDef(table, c, "Avg_Shift",
              p("Baseline_Value_Ct" -> valueCt.toString,
                "Baseline_Avg" -> avg.toString, "Baseline_SD" -> sd.toString,
                "Threshold_Value" -> "0.5"))
            b += TestDef(table, c, "Outlier_Pct_Above",
              p("Baseline_Avg" -> avg.toString, "Baseline_SD" -> sd.toString,
                "Threshold_Value" -> "0.05"))
            b += TestDef(table, c, "Outlier_Pct_Below",
              p("Baseline_Avg" -> avg.toString, "Baseline_SD" -> sd.toString,
                "Threshold_Value" -> "0.05"))
            for (s <- num(r, "sum_num"))
              b += TestDef(table, c, "Incr_Avg_Shift",
                p("Baseline_Value_Ct" -> valueCt.toString,
                  "Baseline_Sum" -> s.toString,
                  "Baseline_Avg" -> avg.toString,
                  "Baseline_SD" -> sd.toString, "Threshold_Value" -> "2"))
          }
          for (fs <- num(r, "frac_sum") if fs > 0)
            b += TestDef(table, c, "Dec_Trunc",
              p("Threshold_Value" -> fs.toString))
        }
        if (isTs) {
          r.get(r.fieldIndex("min_ts")) match {
            case ts: java.sql.Timestamp =>
              b += TestDef(table, c, "Min_Date",
                p("Baseline_Value" -> ts.toString.stripSuffix(".0"),
                  "Threshold_Value" -> "0"))
            case _ =>
          }
          for (dd <- num(r, "distinct_date_ct"))
            b += TestDef(table, c, "Distinct_Date_Ct",
              p("Baseline_Value" -> dd.toLong.toString,
                "Threshold_Value" -> dd.toLong.toString))
          b += TestDef(table, c, "Future_Date", p("Threshold_Value" -> "0"))
          b += TestDef(table, c, "Future_Date_1Y",
            p("Threshold_Value" -> "0"))
        }
        b.result()
      }
    }
    tableTests ++ colTests
  }
}
