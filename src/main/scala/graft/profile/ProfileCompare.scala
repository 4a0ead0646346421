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
