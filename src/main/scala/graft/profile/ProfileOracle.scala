package graft.profile

import graft.Tables

/** DuckDB-SQL mirror of [[Profiler]] — generates, from the static table
  * metadata in [[graft.Tables]], the exact same statistics the Spark profiler
  * computes, so the driver's oracle compare hash-matches. One SELECT per
  * column UNION ALL'd, ORDER BY column_name (same as the Spark side).
  *
  * Every numeric output is either exact (counts, mins/maxes, DECIMAL sums) or
  * derived from exact sums with the identical double formula + round(,4) —
  * see the parity notes on [[Profiler]].
  */
object ProfileOracle {

  private def label(kind: String): String = kind match {
    case "long"               => "bigint"
    case "int"                => "int"
    case "double"             => "double"
    case "string" | "json"    => "string"
    case "timestamp" | "tsns" => "timestamp"
    case other                => other
  }

  def profilable(kind: String): Boolean =
    Set("string", "json", "int", "long", "double", "timestamp", "tsns",
      "floatarr")(kind)

  /** SQL for one column's profile row. */
  private def colSql(table: String, c: String, kind: String,
                     ordinal: Int): String = {
    val isStr = kind == "string" || kind == "json"
    val isNum = Set("int", "long", "double")(kind)
    val isTs = kind == "timestamp" || kind == "tsns"
    val isFrac = kind == "double"
    val isArr = kind == "floatarr"
    // ns-precision parquet timestamps: truncate to micros like Spark does
    val tsCol = if (kind == "tsns") s"CAST($c AS TIMESTAMP)" else c

    val s1 = s"sum(CAST($c AS DECIMAL(28,6)))"
    val s2 = s"sum(CAST(CAST($c AS DOUBLE)*CAST($c AS DOUBLE) AS DECIMAL(28,6)))"
    val nCt = s"count($c)"
    val stdNum = s"CAST($s2 AS DOUBLE) - CAST($s1 AS DOUBLE)*CAST($s1 AS DOUBLE)/$nCt"

    def bigintOrNull(expr: String, cond: Boolean): String =
      if (cond) s"CAST($expr AS BIGINT)" else "CAST(NULL AS BIGINT)"
    def doubleOrNull(expr: String, cond: Boolean): String =
      if (cond) expr else "CAST(NULL AS DOUBLE)"

    Seq(
      s"'$table' AS table_name",
      s"'$c' AS column_name",
      s"CAST($ordinal AS BIGINT) AS ordinal",
      s"'${label(kind)}' AS data_type",
      "CAST(count(*) AS BIGINT) AS record_ct",
      s"CAST($nCt AS BIGINT) AS value_ct",
      s"CAST(count(*) - $nCt AS BIGINT) AS null_ct",
      s"CAST(count(DISTINCT $c) AS BIGINT) AS distinct_ct",
      (if (isArr) s"CAST(min(len($c)) AS BIGINT)"
       else bigintOrNull(s"min(length($c))", isStr)) + " AS min_len",
      (if (isArr) s"CAST(max(len($c)) AS BIGINT)"
       else bigintOrNull(s"max(length($c))", isStr)) + " AS max_len",
      (if (isArr)
        s"round(CAST(sum(CAST(len($c) AS BIGINT)) AS DOUBLE)/$nCt, 4)"
      else doubleOrNull(
        s"round(CAST(sum(CAST(length($c) AS BIGINT)) AS DOUBLE)/$nCt, 4)",
        isStr)) + " AS avg_len",
      bigintOrNull(s"count(CASE WHEN trim($c) = '' THEN 1 END)", isStr) +
        " AS blank_ct",
      (if (isStr) s"min($c)" else "CAST(NULL AS VARCHAR)") + " AS min_str",
      (if (isStr) s"max($c)" else "CAST(NULL AS VARCHAR)") + " AS max_str",
      doubleOrNull(s"CAST(min($c) AS DOUBLE)", isNum) + " AS min_num",
      doubleOrNull(s"CAST(max($c) AS DOUBLE)", isNum) + " AS max_num",
      doubleOrNull(s"round(CAST($s1 AS DOUBLE)/$nCt, 4)", isNum) +
        " AS avg_num",
      doubleOrNull(
        s"CASE WHEN $nCt > 1 THEN round(sqrt(greatest($stdNum, 0.0)/($nCt - 1)), 4) END",
        isNum) + " AS stdev_num",
      doubleOrNull(s"CAST($s1 AS DOUBLE)", isNum) + " AS sum_num",
      doubleOrNull(
        s"CAST(sum(CAST($c AS DECIMAL(28,6)) - CAST(floor($c) AS DECIMAL(28,6))) AS DOUBLE)",
        isFrac) + " AS frac_sum",
      bigintOrNull(s"count(CASE WHEN $c = 0 THEN 1 END)", isNum) +
        " AS zero_ct",
      bigintOrNull(s"count(CASE WHEN $c < 0 THEN 1 END)", isNum) +
        " AS neg_ct",
      (if (isTs) s"min($tsCol)" else "CAST(NULL AS TIMESTAMP)") + " AS min_ts",
      (if (isTs) s"max($tsCol)" else "CAST(NULL AS TIMESTAMP)") + " AS max_ts",
      bigintOrNull(s"count(CASE WHEN contains($c, ' ') THEN 1 END)", isStr) +
        " AS embedded_space_ct",
      bigintOrNull(s"count(CASE WHEN $c = upper($c) THEN 1 END)", isStr) +
        " AS upper_ct",
      bigintOrNull(s"count(CASE WHEN $c = lower($c) THEN 1 END)", isStr) +
        " AS lower_ct",
      bigintOrNull(
        s"count(CASE WHEN TRY_CAST($c AS DOUBLE) IS NOT NULL THEN 1 END)",
        isStr) + " AS numeric_str_ct",
      bigintOrNull(
        s"count(CASE WHEN TRY_CAST($c AS DATE) IS NOT NULL THEN 1 END)",
        isStr) + " AS date_str_ct",
      bigintOrNull(s"count(CASE WHEN $c > 0 THEN 1 END)", isNum) +
        " AS pos_ct",
      bigintOrNull(s"count(CASE WHEN $c <> floor($c) THEN 1 END)", isFrac) +
        " AS frac_value_ct",
      bigintOrNull(
        s"count(CASE WHEN $tsCol > TIMESTAMP '${graft.quality.TestEvaluator.AsOfTs}' THEN 1 END)",
        isTs) + " AS future_ct",
      // Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday
      bigintOrNull(
        s"count(CASE WHEN dayofweek(CAST($tsCol AS DATE)) IN (0, 6) THEN 1 END)",
        isTs) + " AS weekend_ct",
      bigintOrNull(s"count(DISTINCT CAST($c AS DATE))", isTs) +
        " AS distinct_date_ct",
    ).mkString("SELECT ", ", ", s" FROM $table")
  }

  /** Full-table profile oracle, mirroring `Profiler.profile(df, table)`. */
  def sql(table: String): String = {
    val cols = Tables.meta(table).zipWithIndex
      .filter { case ((_, kind), _) => profilable(kind) }
    val union = cols.map { case ((c, kind), i) => colSql(table, c, kind, i) }
      .mkString("\nUNION ALL\n")
    s"SELECT * FROM (\n$union\n) ORDER BY column_name"
  }

  /** Oracle for `Profiler.topK` (string columns only — casting numerics to
    * string differs across engines).
    */
  def topKSql(table: String, column: String, k: Int = 10): String =
    s"""SELECT '$table' AS table_name, '$column' AS column_name, value, value_ct FROM (
       |  SELECT $column AS value, CAST(count(*) AS BIGINT) AS value_ct
       |  FROM $table WHERE $column IS NOT NULL GROUP BY $column
       |) ORDER BY value_ct DESC, value LIMIT $k""".stripMargin
}
