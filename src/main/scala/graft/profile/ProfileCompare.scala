package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-vs-target / baseline-vs-refresh profile comparison — the
  * reference's "Quickly compare source to target data during migration"
  * use case (reference README.md:211): profile both sides, join per
  * column, and report per-statistic drift. The profiles are one row per
  * column, so the comparison join is trivially broadcast; at 100 TB the
  * only heavy work is the two profiling scans themselves.
  */
object ProfileCompare {

  /** The statistics compared, in output order. */
  val Stats: Seq[String] = Seq("record_ct", "value_ct", "null_ct",
    "distinct_ct", "min_num", "max_num", "avg_num", "sum_num")

  /** Unpivot the compared stats of a profile DataFrame to
    * (column_name, stat, value) — all values as DOUBLE.
    */
  private def unpivot(profile: DataFrame): DataFrame = {
    val entries = Stats.map(s =>
      struct(lit(s).as("stat"), col(s).cast(DoubleType).as("value")))
    profile.select(col("column_name"),
        explode(array(entries: _*)).as("e"))
      .select(col("column_name"), col("e.stat"), col("e.value"))
  }

  /** Per-(column, stat) comparison of two profiles: baseline value,
    * current value, absolute delta, and a match flag. Columns present on
    * only one side surface with the other side null (full outer join).
    */
  def diff(baseline: DataFrame, current: DataFrame): DataFrame = {
    val b = unpivot(baseline).withColumnRenamed("value", "baseline")
    val c = unpivot(current).withColumnRenamed("value", "current")
    b.join(c, Seq("column_name", "stat"), "full_outer")
      .withColumn("delta",
        when(col("baseline").isNotNull && col("current").isNotNull,
          round(col("current") - col("baseline"), 4)))
      .withColumn("matches",
        coalesce(col("baseline") === col("current"),
          col("baseline").isNull && col("current").isNull))
      .orderBy("column_name", "stat")
  }

  /** Baseline-vs-refresh comparison of a table against pinned baseline
    * profiles: profiles the live table and diffs it against the literals.
    */
  def diffAgainstPinned(df: DataFrame, tableName: String,
                        pinned: Seq[ColProfile],
                        spark: SparkSession): DataFrame = {
    import spark.implicits._
    val baseline = pinned.map { p =>
      (p.column, p.recordCt.toDouble, p.valueCt.toDouble, p.nullCt.toDouble,
        p.distinctCt.map(_.toDouble), p.minNum, p.maxNum, p.avgNum, p.sumNum)
    }.toDF("column_name" +: Stats: _*)
    diff(baseline, Profiler.profile(df, tableName))
  }

  /** Driver gate for the HLL/approx profile tier (the designated 100 TB
    * first-pass mode — reference README.md:207-209 profiling claim):
    * the exact and approx profiles of the same table are joined per
    * column, and one row is emitted per statistic that violates the
    * mode's documented error contract. Expected EMPTY — the DuckDB
    * oracle is a typed zero-row SELECT, so the driver's row/hash
    * compare is a real regression gate on the sketch wiring (before
    * this, only ProfilerSpec guarded the mode).
    *
    * Bounds: distinct counts (HyperLogLog, default rsd 0.05) must land
    * within max(2, 10% of exact) — the ProfilerSpec property bound;
    * percentiles (approx_percentile, accuracy 10000 → rank error
    * ≤ 0.01% of rows) within 5% of the exact quantile (floor 1e-6 for
    * zero-valued quantiles); every other statistic rides the SAME
    * expression tree in both modes and must match EXACTLY (null-safe —
    * the one-column-per-pass base aggregation is identical in both).
    */
  def approxCheck(exact: DataFrame, approx: DataFrame): DataFrame = {
    val statCols = exact.columns.toSeq
      .filterNot(Set("table_name", "column_name"))
    val e = exact.select(col("column_name") +:
      statCols.map(c => col(c).as(s"e_$c")): _*)
    val a = approx.select(col("column_name") +:
      statCols.map(c => col(c).as(s"a_$c")): _*)
    val hllStats = Set("distinct_ct", "distinct_date_ct")
    val pctStats = Set("p25_num", "median_num", "p75_num")
    val checks = statCols.map { st =>
      val ev = col(s"e_$st"); val av = col(s"a_$st")
      val ed = ev.cast(DoubleType); val ad = av.cast(DoubleType)
      val bad =
        if (hllStats(st) || pctStats(st)) {
          val bound =
            if (hllStats(st)) greatest(lit(2.0), lit(0.1) * ed)
            else greatest(lit(0.05) * abs(ed), lit(1e-6))
          when(ev.isNull && av.isNull, lit(false))
            .when(ev.isNull || av.isNull, lit(true))
            .otherwise(abs(ad - ed) > bound)
        } else !(ev <=> av)
      struct(lit(st).as("stat"), bad.as("bad"),
        ev.cast(StringType).as("exact_v"),
        av.cast(StringType).as("approx_v"))
    }
    e.join(a, "column_name")
      .select(col("column_name"), explode(array(checks: _*)).as("c"))
      .filter(col("c.bad"))
      .select(col("column_name"), col("c.stat").as("stat"),
        col("c.exact_v").as("exact_v"), col("c.approx_v").as("approx_v"))
      .orderBy("column_name", "stat")
  }

  /** Typed zero-row oracle for [[approxCheck]] — expected-empty is the
    * whole contract, so the oracle only has to agree on the schema.
    */
  val approxCheckOracleSql: String =
    """SELECT CAST(NULL AS VARCHAR) AS column_name,
      |  CAST(NULL AS VARCHAR) AS stat, CAST(NULL AS VARCHAR) AS exact_v,
      |  CAST(NULL AS VARCHAR) AS approx_v
      |WHERE false""".stripMargin

  /** DuckDB oracle for [[diffAgainstPinned]]: the current side recomputes
    * each stat with the same SQL formulas as ProfileOracle, the baseline
    * side is the pinned literal.
    */
  def pinnedOracleSql(table: String, pinned: Seq[ColProfile]): String = {
    def lit(v: Option[Double]): String =
      v.map(_.toString).getOrElse("NULL")
    val parts = pinned.flatMap { p =>
      val c = p.column
      val isNum = Set("int", "bigint", "double", "float")(p.dataType)
      val s1 = s"sum(CAST($c AS DECIMAL(28,6)))"
      // every branch must contain an aggregate so each SELECT is a
      // one-row aggregation even when the stat is NULL for this type
      val nullAgg = "min(CAST(NULL AS DOUBLE))"
      val currentSql: Map[String, String] = Map(
        "record_ct" -> "CAST(count(*) AS DOUBLE)",
        "value_ct" -> s"CAST(count($c) AS DOUBLE)",
        "null_ct" -> s"CAST(count(*) - count($c) AS DOUBLE)",
        "distinct_ct" -> s"CAST(count(DISTINCT $c) AS DOUBLE)",
        "min_num" ->
          (if (isNum) s"CAST(min($c) AS DOUBLE)" else nullAgg),
        "max_num" ->
          (if (isNum) s"CAST(max($c) AS DOUBLE)" else nullAgg),
        "avg_num" ->
          (if (isNum) s"round(CAST($s1 AS DOUBLE)/count($c), 4)"
           else nullAgg),
        "sum_num" ->
          (if (isNum) s"CAST($s1 AS DOUBLE)" else nullAgg))
      val baselineVal: Map[String, String] = Map(
        "record_ct" -> p.recordCt.toDouble.toString,
        "value_ct" -> p.valueCt.toDouble.toString,
        "null_ct" -> p.nullCt.toDouble.toString,
        "distinct_ct" -> lit(p.distinctCt.map(_.toDouble)),
        "min_num" -> lit(p.minNum), "max_num" -> lit(p.maxNum),
        "avg_num" -> lit(p.avgNum), "sum_num" -> lit(p.sumNum))
      Stats.map { s =>
        val cur = currentSql(s)
        val base = s"CAST(${baselineVal(s)} AS DOUBLE)"
        s"""SELECT '$c' AS column_name, '$s' AS stat, $base AS baseline,
           |  $cur AS current,
           |  CASE WHEN $base IS NOT NULL AND $cur IS NOT NULL
           |    THEN round($cur - $base, 4) END AS delta,
           |  coalesce($base = $cur, $base IS NULL AND $cur IS NULL)
           |    AS matches
           |FROM $table""".stripMargin
      }
    }
    parts.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY column_name, stat")
  }
}
