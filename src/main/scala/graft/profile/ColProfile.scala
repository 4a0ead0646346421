package graft.profile

import org.apache.spark.sql.DataFrame

/** Driver-side materialization of one profile row (the output schema of
  * [[Profiler.profile]]). This is the "baseline statistics" record the
  * reference captures from a profiling run and later tests refreshes against
  * (reference demo/input_data/data_tests.csv parameter vocabulary:
  * Baseline_Ct / Baseline_Value_Ct / Baseline_Unique_Ct / Baseline_Avg /
  * Baseline_SD / Baseline_Sum / min-max dates and lengths).
  *
  * A table profile is one row per column — tiny at any data scale — so
  * collecting it driver-side is free, and pinning it as literals (see
  * [[graft.quality.PinnedBaselines]]) mirrors how the reference ships
  * baselines inside its test definitions.
  */
case class ColProfile(
    table: String, column: String, ordinal: Long, dataType: String,
    recordCt: Long, valueCt: Long, nullCt: Long, distinctCt: Option[Long],
    minLen: Option[Long], maxLen: Option[Long], avgLen: Option[Double],
    blankCt: Option[Long], minStr: Option[String], maxStr: Option[String],
    minNum: Option[Double], maxNum: Option[Double], avgNum: Option[Double],
    stdevNum: Option[Double], sumNum: Option[Double], fracSum: Option[Double],
    zeroCt: Option[Long], negCt: Option[Long],
    minTs: Option[String], maxTs: Option[String],
    distinctDateCt: Option[Long],
    // shape characteristics (defaults keep older pinned baselines valid)
    embeddedSpaceCt: Option[Long] = None, upperCt: Option[Long] = None,
    lowerCt: Option[Long] = None, numericStrCt: Option[Long] = None,
    dateStrCt: Option[Long] = None, posCt: Option[Long] = None,
    fracValueCt: Option[Long] = None, futureCt: Option[Long] = None,
    weekendCt: Option[Long] = None,
    spanDays: Option[Long] = None, recencyDays: Option[Long] = None,
    p25Num: Option[Double] = None, medianNum: Option[Double] = None,
    p75Num: Option[Double] = None)

object ColProfile {

  /** Merge two partial profiles of the SAME column over disjoint row
    * sets — the incremental-profiling primitive: at 100 TB, profile only
    * the new partitions and merge into the standing baseline instead of
    * rescanning history. Algebraic statistics (counts, sums, min/max)
    * merge exactly; derived ones (avg) re-derive from the merged sums;
    * non-mergeable ones (distinct counts, stddev without the second
    * moment, percentiles) come back None — callers needing those at scale
    * keep mergeable sketches instead (HLL via approx mode, KLL for
    * quantiles).
    */
  def merge(a: ColProfile, b: ColProfile): ColProfile = {
    require(a.table == b.table && a.column == b.column,
      s"cannot merge ${a.table}.${a.column} with ${b.table}.${b.column}")
    // one-sided None passes the other side through (an empty/all-null
    // slice contributes nothing to the union's sum); only both-None —
    // no values anywhere — stays None
    def addL(x: Option[Long], y: Option[Long]) =
      (x ++ y).reduceOption(_ + _)
    def addD(x: Option[Double], y: Option[Double]) =
      (x ++ y).reduceOption(_ + _)
    def minD(x: Option[Double], y: Option[Double]) =
      (x ++ y).reduceOption((p: Double, q: Double) => math.min(p, q))
    def maxD(x: Option[Double], y: Option[Double]) =
      (x ++ y).reduceOption((p: Double, q: Double) => math.max(p, q))
    def minS(x: Option[String], y: Option[String]) =
      (x ++ y).reduceOption((p, q) => if (p <= q) p else q)
    def maxS(x: Option[String], y: Option[String]) =
      (x ++ y).reduceOption((p, q) => if (p >= q) p else q)
    val valueCt = a.valueCt + b.valueCt
    val sumNum = addD(a.sumNum, b.sumNum)
    a.copy(
      recordCt = a.recordCt + b.recordCt,
      valueCt = valueCt,
      nullCt = a.nullCt + b.nullCt,
      distinctCt = None, // not mergeable exactly; use HLL sketches at scale
      minLen = (a.minLen ++ b.minLen)
        .reduceOption((p: Long, q: Long) => math.min(p, q)),
      maxLen = (a.maxLen ++ b.maxLen)
        .reduceOption((p: Long, q: Long) => math.max(p, q)),
      avgLen = None,
      blankCt = addL(a.blankCt, b.blankCt),
      minStr = minS(a.minStr, b.minStr),
      maxStr = maxS(a.maxStr, b.maxStr),
      minNum = minD(a.minNum, b.minNum),
      maxNum = maxD(a.maxNum, b.maxNum),
      avgNum = sumNum.map(s => if (valueCt == 0) 0.0 else s / valueCt),
      stdevNum = None, // needs the second-moment sum; profile keeps it
      sumNum = sumNum,
      fracSum = addD(a.fracSum, b.fracSum),
      zeroCt = addL(a.zeroCt, b.zeroCt),
      negCt = addL(a.negCt, b.negCt),
      minTs = minS(a.minTs, b.minTs),
      maxTs = maxS(a.maxTs, b.maxTs),
      distinctDateCt = None,
      embeddedSpaceCt = addL(a.embeddedSpaceCt, b.embeddedSpaceCt),
      upperCt = addL(a.upperCt, b.upperCt),
      lowerCt = addL(a.lowerCt, b.lowerCt),
      numericStrCt = addL(a.numericStrCt, b.numericStrCt),
      dateStrCt = addL(a.dateStrCt, b.dateStrCt),
      posCt = addL(a.posCt, b.posCt),
      fracValueCt = addL(a.fracValueCt, b.fracValueCt),
      futureCt = addL(a.futureCt, b.futureCt),
      weekendCt = addL(a.weekendCt, b.weekendCt),
      spanDays = None, recencyDays = None,
      // percentiles are not exactly mergeable — keep KLL sketches at scale
      p25Num = None, medianNum = None, p75Num = None)
  }

  private val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(java.time.ZoneOffset.UTC)

  /** Collect a profile DataFrame (output of [[Profiler.profile]]) into
    * driver-side records. One row per column — never large.
    */
  def fromRows(profile: DataFrame): Seq[ColProfile] = {
    profile.collect().toSeq.map { r =>
      def l(f: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(f))) None
        else Some(r.getAs[Number](f).longValue())
      def d(f: String): Option[Double] =
        if (r.isNullAt(r.fieldIndex(f))) None
        else Some(r.getAs[Number](f).doubleValue())
      def s(f: String): Option[String] =
        Option(r.getAs[String](f))
      def t(f: String): Option[String] =
        if (r.isNullAt(r.fieldIndex(f))) None
        else Some(TsFmt.format(r.getAs[java.sql.Timestamp](f).toInstant))
      ColProfile(
        r.getAs[String]("table_name"), r.getAs[String]("column_name"),
        r.getAs[Long]("ordinal"), r.getAs[String]("data_type"),
        r.getAs[Long]("record_ct"), r.getAs[Long]("value_ct"),
        r.getAs[Long]("null_ct"), l("distinct_ct"),
        l("min_len"), l("max_len"), d("avg_len"), l("blank_ct"),
        s("min_str"), s("max_str"),
        d("min_num"), d("max_num"), d("avg_num"), d("stdev_num"),
        d("sum_num"), d("frac_sum"), l("zero_ct"), l("neg_ct"),
        t("min_ts"), t("max_ts"), l("distinct_date_ct"),
        l("embedded_space_ct"), l("upper_ct"), l("lower_ct"),
        l("numeric_str_ct"), l("date_str_ct"), l("pos_ct"),
        l("frac_value_ct"), l("future_ct"), l("weekend_ct"),
        l("span_days"), l("recency_days"),
        d("p25_num"), d("median_num"), d("p75_num"))
    }
  }
}
