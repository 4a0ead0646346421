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

  /** SQL for one column's profile row; `rel` is the scanned relation
    * (the table itself, or a sampled subquery labeled as the table).
    */
  private def colSql(table: String, c: String, kind: String,
                     ordinal: Int, rel: String): String = {
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
    // 3rd/4th-power sums + central moments, mirroring Profiler's exact
    // decimal sums and double formula trees term-for-term (IEEE doubles are
    // deterministic given identical expression trees)
    val cD = s"CAST($c AS DOUBLE)"
    // magnitude-guarded like the Spark side (Profiler.MomentSafeAbs):
    // any row past the bound nulls the whole moment sum
    val momGuard =
      s"count(CASE WHEN NOT (abs($cD) < 30000000.0) THEN 1 END) = 0"
    val s3 = s"CASE WHEN $momGuard THEN sum(CASE WHEN abs($cD) < " +
      s"30000000.0 THEN CAST($cD*$cD*$cD AS DECIMAL(38,6)) END) END"
    val s4 = s"CASE WHEN $momGuard THEN sum(CASE WHEN abs($cD) < " +
      s"30000000.0 THEN CAST($cD*$cD*$cD*$cD AS DECIMAL(38,6)) END) END"
    val meanS = s"(CAST($s1 AS DOUBLE)/$nCt)"
    val m2S = s"(CAST($s2 AS DOUBLE)/$nCt - $meanS*$meanS)"
    val m3S = s"(CAST($s3 AS DOUBLE)/$nCt - 3.0*$meanS*(CAST($s2 AS DOUBLE)/$nCt) + 2.0*$meanS*$meanS*$meanS)"
    val m4S = s"(CAST($s4 AS DOUBLE)/$nCt - 4.0*$meanS*(CAST($s3 AS DOUBLE)/$nCt) + 6.0*$meanS*$meanS*(CAST($s2 AS DOUBLE)/$nCt) - 3.0*$meanS*$meanS*$meanS*$meanS)"

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
      // round-2 widening (51-characteristic surface) — string content classes
      bigintOrNull(s"count(CASE WHEN $c <> ltrim($c) THEN 1 END)", isStr) +
        " AS lead_space_ct",
      bigintOrNull(
        s"count(CASE WHEN contains($c, '''') OR contains($c, '\"') THEN 1 END)",
        isStr) + " AS quote_ct",
      bigintOrNull(
        s"count(CASE WHEN regexp_matches($c, '[^\\x00-\\x7F]') THEN 1 END)",
        isStr) + " AS non_ascii_ct",
      bigintOrNull(
        s"count(CASE WHEN regexp_matches($c, '^[A-Za-z ]+$$') THEN 1 END)",
        isStr) + " AS alpha_ct",
      bigintOrNull(
        s"count(CASE WHEN upper(trim($c)) IN ('Y','N','YES','NO','TRUE','FALSE','T','F') THEN 1 END)",
        isStr) + " AS boolean_ct",
      bigintOrNull(
        s"count(CASE WHEN regexp_matches($c, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$$') THEN 1 END)",
        isStr) + " AS email_ct",
      bigintOrNull(
        s"count(CASE WHEN regexp_matches($c, '^[0-9]{5}(-[0-9]{4})?$$') THEN 1 END)",
        isStr) + " AS zip_ct",
      bigintOrNull(
        s"count(CASE WHEN upper(trim($c)) IN ('N/A','NA','NONE','NULL','UNKNOWN','MISSING','-','?','TBD') THEN 1 END)",
        isStr) + " AS dummy_ct",
      doubleOrNull(
        s"round(CAST(sum(CAST(CASE WHEN length(trim($c)) > 0 THEN len(regexp_split_to_array(trim($c), '\\s+')) ELSE 0 END AS BIGINT)) AS DOUBLE)/$nCt, 4)",
        isStr) + " AS avg_words",
      // numeric distribution shape
      doubleOrNull(s"round(quantile_cont($cD, 0.25), 4)", isNum) +
        " AS p25_num",
      doubleOrNull(s"round(quantile_cont($cD, 0.5), 4)", isNum) +
        " AS median_num",
      doubleOrNull(s"round(quantile_cont($cD, 0.75), 4)", isNum) +
        " AS p75_num",
      doubleOrNull(
        s"CASE WHEN $nCt > 2 AND $m2S > 0 THEN round($m3S / sqrt($m2S*$m2S*$m2S), 4) END",
        isNum) + " AS skew_num",
      doubleOrNull(
        s"CASE WHEN $nCt > 3 AND $m2S > 0 THEN round($m4S / ($m2S*$m2S) - 3.0, 4) END",
        isNum) + " AS kurt_num",
      doubleOrNull(
        s"CAST(max($c) AS DOUBLE) - CAST(min($c) AS DOUBLE)", isNum) +
        " AS range_num",
      doubleOrNull(
        s"CASE WHEN $nCt > 1 AND CAST($s1 AS DOUBLE) <> 0.0 THEN round(sqrt(greatest($stdNum, 0.0)/($nCt - 1)) / $meanS, 4) END",
        isNum) + " AS cv_num",
      bigintOrNull(s"count(CASE WHEN $c % 10 = 0 THEN 1 END)", isNum) +
        " AS round_num_ct",
      // timestamp placement
      bigintOrNull(
        s"count(CASE WHEN date_trunc('day', $tsCol) = $tsCol THEN 1 END)",
        isTs) + " AS midnight_ct",
      bigintOrNull(
        s"count(CASE WHEN hour($tsCol) >= 9 AND hour($tsCol) < 17 THEN 1 END)",
        isTs) + " AS work_hours_ct",
      bigintOrNull(
        s"date_diff('day', CAST(min($tsCol) AS DATE), CAST(max($tsCol) AS DATE))",
        isTs) + " AS span_days",
      bigintOrNull(
        s"date_diff('day', CAST(max($tsCol) AS DATE), DATE '${graft.quality.TestEvaluator.AsOfTs.take(10)}')",
        isTs) + " AS recency_days",
      bigintOrNull(s"count(DISTINCT CAST($c AS DATE))", isTs) +
        " AS distinct_date_ct",
    ).mkString("SELECT ", ", ", s" FROM $rel")
  }

  /** Full-table profile oracle, mirroring `Profiler.profile(df, table)`.
    * `from` overrides the scanned relation (e.g. a sampled subquery)
    * while `table` still labels the rows.
    */
  def sql(table: String, from: String = ""): String = {
    val rel = if (from.isEmpty) table else from
    val cols = Tables.meta(table).zipWithIndex
      .filter { case ((_, kind), _) => profilable(kind) }
    val union = cols.map { case ((c, kind), i) =>
      colSql(table, c, kind, i, rel)
    }.mkString("\nUNION ALL\n")
    s"SELECT * FROM (\n$union\n) ORDER BY column_name"
  }

  /** Oracle for `Profiler.profileSampled(hashKey = Some(k))`: the profile
    * of the md5-drawn subset with the identical outer scaling —
    * extensive counts round(x/fraction), extensive sums x/fraction,
    * distinct_ct nulled. `drawSql` must render the SAME key expression
    * the Spark side hashes; `fraction` must be a value whose bps
    * (fraction·10⁴) is exact.
    */
  def sampledSql(table: String, fraction: Double, drawSql: String): String = {
    val bps = math.round(fraction * 10000).toInt
    val sub = s"(SELECT * FROM $table WHERE ('0x' || substr(md5('ps:' || " +
      s"$drawSql), 1, 6))::BIGINT % 10000 < $bps)"
    val replaces =
      Profiler.ExtensiveCounts.toSeq.sorted.map(c =>
        s"CAST(round($c/$fraction) AS BIGINT) AS $c") ++
      Profiler.ExtensiveSums.toSeq.sorted.map(c => s"$c/$fraction AS $c") :+
      "CAST(NULL AS BIGINT) AS distinct_ct"
    s"""SELECT * REPLACE (${replaces.mkString(", ")})
       |FROM (${sql(table, sub)}) ORDER BY column_name""".stripMargin
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
