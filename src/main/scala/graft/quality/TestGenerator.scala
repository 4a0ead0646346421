package graft.quality

import graft.profile.ColProfile
import org.apache.spark.sql.DataFrame

/** Algorithmic test generation from a column profile — the reference's
  * "auto-generation of 32 data quality validation tests" (README.md:207-209):
  * a pure function over baseline profile statistics. Profiles are one row per
  * column (tiny at any data scale), so generation is driver-side; the
  * generated defs then evaluate distributed via TestEvaluator.
  *
  * Rule inventory (emitted type ← trigger):
  *   Row_Ct            ← always (table-level)
  *   Required          ← zero nulls
  *   Missing_Pct       ← some nulls
  *   Unique            ← distinct == values
  *   Unique_Pct        ← 1 < distinct < values
  *   Constant          ← single distinct value (string or numeric)
  *   LOV_Match         ← string, 2..20 distinct, LOV supplied (from topK)
  *   Alpha_Trunc       ← string with max length
  *   Pattern_Match     ← string whose min/max values share a char-class
  *                       skeleton (letters/digits/punctuation runs)
  *   Min_Val / Max_Val / Avg_Shift / Incr_Avg_Shift /
  *   Outlier_Pct_Above/Below /
  *   Dec_Trunc         ← numeric with the needed stats
  *   Min_Date / Distinct_Date_Ct / Future_Date / Future_Date_1Y /
  *   Recency           ← timestamp
  *   Monthly_Rec_Ct / Weekly_Rec_Ct ← timestamp with dense date coverage
  *   Daily_Record_Ct   ← timestamp with every day of its span present
  *   Distinct_Value_Ct ← low-cardinality column (≤ 50 distinct)
  *   Outlier_IQR       ← numeric with baseline p25/p75 characteristics
  *
  * 33 emitted types — exceeding the breadth the reference declares
  * ("auto-generation of 32 data quality validation tests"); the two
  * Custom_* types (user-authored SQL) are additionally evaluator-supported,
  * mirroring the reference's "+2 custom test types".
  */
object TestGenerator {

  /** Regex-escape a literal character for both Java and RE2-style engines. */
  private def escRe(ch: Char): String =
    if ("\\^$.|?*+()[]{}".indexOf(ch) >= 0) "\\" + ch else ch.toString

  /** Char-class skeleton: collapse letter runs to [A-Za-z]+, digit runs to
    * [0-9]+, escape everything else literally. "Customer#000000001" →
    * "[A-Za-z]+#[0-9]+". If a column's min and max string share a skeleton,
    * the column very likely follows that pattern.
    */
  def skeleton(s: String): String = {
    val sb = new StringBuilder
    var last = ' '
    s.foreach { ch =>
      val cls = if (ch.isLetter) 'A' else if (ch.isDigit) '9' else 'x'
      if (cls == 'x') { sb.append(escRe(ch)); last = ' ' }
      else if (cls != last) {
        sb.append(if (cls == 'A') "[A-Za-z]+" else "[0-9]+")
        last = cls
      }
    }
    sb.toString
  }

  def generate(profile: DataFrame): Seq[TestDef] =
    generate(ColProfile.fromRows(profile), Map.empty)

  def generate(profile: DataFrame,
               lovs: Map[String, Seq[String]]): Seq[TestDef] =
    generate(ColProfile.fromRows(profile), lovs)

  def generate(profiles: Seq[ColProfile],
               lovs: Map[String, Seq[String]]): Seq[TestDef] = {
    if (profiles.isEmpty) return Seq.empty
    val table = profiles.head.table
    val recordCt = profiles.head.recordCt
    def p(kv: (String, String)*) = kv.toMap
    def quoteLov(vs: Seq[String]): String =
      vs.map(v => s"'${v.replace("'", "''")}'").mkString("(", ",", ")")

    val tableTests = Seq(
      TestDef(table, "N/A", "Row_Ct",
        p("Baseline_Ct" -> recordCt.toString,
          "Threshold_Value" -> recordCt.toString)),
      TestDef(table, "N/A", "Row_Ct_Pct",
        p("Baseline_Ct" -> recordCt.toString, "Threshold_Value" -> "10")))

    val colTests = profiles.flatMap { cp =>
      val c = cp.column
      val isNum = Set("int", "bigint", "double", "float", "decimal")(cp.dataType)
      val isStr = cp.dataType == "string"
      val isTs = cp.dataType == "timestamp"
      val b = Seq.newBuilder[TestDef]

      if (cp.valueCt == 0) Seq.empty
      else {
        if (cp.nullCt == 0)
          b += TestDef(table, c, "Required", p("Threshold_Value" -> "0"))
        else
          b += TestDef(table, c, "Missing_Pct",
            p("Baseline_Ct" -> recordCt.toString,
              "Baseline_Value_Ct" -> cp.valueCt.toString,
              "Threshold_Value" -> "2"))

        cp.distinctCt match {
          case Some(d) if d == cp.valueCt && cp.valueCt > 1 =>
            b += TestDef(table, c, "Unique", p("Threshold_Value" -> "0"))
          case Some(d) if d > 1 =>
            b += TestDef(table, c, "Unique_Pct",
              p("Baseline_Unique_Ct" -> d.toString,
                "Baseline_Value_Ct" -> cp.valueCt.toString,
                "Threshold_Value" -> "0.5"))
          case _ => // unknown (merged profile) or single value
        }

        if (cp.distinctCt.contains(1L)) {
          // single observed value: lock it down (no LOV needed — the
          // profile's min == max IS the constant)
          if (isStr) cp.minStr.foreach { v =>
            b += TestDef(table, c, "Constant",
              p("Baseline_Value" -> v, "Threshold_Value" -> "0"))
          }
          if (isNum) cp.minNum.foreach { v =>
            b += TestDef(table, c, "Constant",
              p("Baseline_Value" -> v.toString, "Threshold_Value" -> "0"))
          }
        }

        for (d <- cp.distinctCt if d >= 2 && d <= 50)
          b += TestDef(table, c, "Distinct_Value_Ct",
            p("Baseline_Value" -> d.toString,
              "Threshold_Value" -> d.toString))

        if (isStr) {
          cp.maxLen.foreach { ml =>
            b += TestDef(table, c, "Alpha_Trunc",
              p("Baseline_Value" -> ml.toString, "Threshold_Value" -> "0"))
          }
          for (d <- cp.distinctCt if d > 1 && d <= 20 && lovs.contains(c)) {
            b += TestDef(table, c, "LOV_Match",
              p("Baseline_Value" -> quoteLov(lovs(c)),
                "Threshold_Value" -> "0"))
            // the full domain was observed → every member should persist
            if (lovs(c).size.toLong == d)
              b += TestDef(table, c, "LOV_All",
                p("Baseline_Value" -> quoteLov(lovs(c)),
                  "Threshold_Value" -> "0"))
          }
          b += TestDef(table, c, "Valid_Characters",
            p("Threshold_Value" -> "0"))
          if (cp.minLen.contains(5L) && cp.maxLen.contains(5L) &&
              cp.minStr.exists(s => skeleton(s) == "[0-9]+"))
            b += TestDef(table, c, "Valid_US_Zip",
              p("Threshold_Value" -> "0"))
          // format detectors: when every observed top value fits a known
          // format, lock the column to it
          for (vs <- lovs.get(c) if vs.nonEmpty) {
            if (vs.forall(_.matches(TestEvaluator.EmailRe)))
              b += TestDef(table, c, "Email_Format",
                p("Threshold_Value" -> "0"))
            if (vs.forall(TestEvaluator.UsStates.contains))
              b += TestDef(table, c, "US_State",
                p("Threshold_Value" -> "0"))
          }
          for (lo <- cp.minStr; hi <- cp.maxStr
               if lo.nonEmpty && cp.distinctCt.exists(_ > 1) &&
                 skeleton(lo) == skeleton(hi))
            b += TestDef(table, c, "Pattern_Match",
              p("Baseline_Value" -> skeleton(lo), "Threshold_Value" -> "0"))
        }

        if (isNum) {
          for (mn <- cp.minNum)
            b += TestDef(table, c, "Min_Val",
              p("Baseline_Value" -> mn.toString, "Threshold_Value" -> "0"))
          // headroom of one baseline range: new maxima slightly above the
          // observed max are normal growth, a jump past max+range is not
          for (mx <- cp.maxNum; mn <- cp.minNum)
            b += TestDef(table, c, "Max_Val",
              p("Baseline_Value" -> mx.toString,
                "Threshold_Value" -> (mx - mn).abs.toString))
          // month evidence: integral 1..12 domain with most months present
          for (mn <- cp.minNum; mx <- cp.maxNum
               if mn >= 1 && mx <= 12 &&
                 cp.distinctCt.exists(d => d <= 12 && d >= 10))
            b += TestDef(table, c, "Valid_Month",
              p("Threshold_Value" -> "0"))
          for (avg <- cp.avgNum; sd <- cp.stdevNum if sd > 0) {
            b += TestDef(table, c, "Avg_Shift",
              p("Baseline_Value_Ct" -> cp.valueCt.toString,
                "Baseline_Avg" -> avg.toString, "Baseline_SD" -> sd.toString,
                "Threshold_Value" -> "0.5"))
            b += TestDef(table, c, "Outlier_Pct_Above",
              p("Baseline_Avg" -> avg.toString, "Baseline_SD" -> sd.toString,
                "Threshold_Value" -> "0.05"))
            b += TestDef(table, c, "Outlier_Pct_Below",
              p("Baseline_Avg" -> avg.toString, "Baseline_SD" -> sd.toString,
                "Threshold_Value" -> "0.05"))
            for (s <- cp.sumNum)
              b += TestDef(table, c, "Incr_Avg_Shift",
                p("Baseline_Value_Ct" -> cp.valueCt.toString,
                  "Baseline_Sum" -> s.toString,
                  "Baseline_Avg" -> avg.toString,
                  "Baseline_SD" -> sd.toString, "Threshold_Value" -> "2"))
          }
          for (fs <- cp.fracSum if fs > 0)
            b += TestDef(table, c, "Dec_Trunc",
              p("Threshold_Value" -> fs.toString))
          // IQR fences from the baseline quantile characteristics
          for (q1 <- cp.p25Num; q3 <- cp.p75Num if q3 > q1)
            b += TestDef(table, c, "Outlier_IQR",
              p("Baseline_P25" -> q1.toString, "Baseline_P75" -> q3.toString,
                "Threshold_Value" -> "0.1"))
        }

        if (isTs) {
          for (ts <- cp.minTs)
            b += TestDef(table, c, "Min_Date",
              p("Baseline_Value" -> ts, "Threshold_Value" -> "0"))
          for (dd <- cp.distinctDateCt)
            b += TestDef(table, c, "Distinct_Date_Ct",
              p("Baseline_Value" -> dd.toString,
                "Threshold_Value" -> dd.toString))
          b += TestDef(table, c, "Future_Date", p("Threshold_Value" -> "0"))
          b += TestDef(table, c, "Future_Date_1Y",
            p("Threshold_Value" -> "0"))
          for (hi <- cp.maxTs) {
            // allowed staleness = staleness observed at baseline + 30 days
            val stale = java.time.temporal.ChronoUnit.DAYS.between(
              java.time.LocalDate.parse(hi.substring(0, 10)),
              java.time.LocalDate.parse(TestEvaluator.AsOfDate))
            b += TestDef(table, c, "Recency",
              p("Threshold_Value" -> (stale + 30).toString))
          }
          // dense date coverage at baseline → expect no month/week gaps
          for (dd <- cp.distinctDateCt if dd >= 60) {
            b += TestDef(table, c, "Monthly_Rec_Ct",
              p("Threshold_Value" -> "0"))
            b += TestDef(table, c, "Weekly_Rec_Ct",
              p("Threshold_Value" -> "0"))
          }
          // every single day present at baseline → expect no daily gaps
          for (dd <- cp.distinctDateCt; span <- cp.spanDays
               if dd >= 60 && span + 1 == dd)
            b += TestDef(table, c, "Daily_Record_Ct",
              p("Threshold_Value" -> "0"))
        }
        b.result()
      }
    }
    tableTests ++ colTests
  }
}
