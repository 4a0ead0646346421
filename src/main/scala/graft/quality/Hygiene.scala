package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-hygiene detectors — the reference's "27 data hygiene detectors"
  * surface (reference README.md:207-209) re-expressed as ONE aggregation
  * pass per table: every detector is a plain aggregate (no distinct
  * aggregation anywhere, so no Expand and no extra passes), emitting one
  * (column, detector, measure, triggered) row per applicable detector.
  *
  * Detector inventory (27, matching the reference's declared count;
  * type-gated):
  *   strings:    untrimmed_values, empty_strings, numeric_as_string,
  *               date_as_string, control_chars, leading_zero_numbers,
  *               embedded_quotes, non_ascii_values, case_inconsistency,
  *               dummy_values, boolean_as_string, multi_space_values,
  *               overlong_values
  *   numerics:   zero_heavy, negatives_present, zero_variance,
  *               integer_as_float, sentinel_values, huge_magnitude,
  *               rare_negatives
  *   timestamps: future_dates, epoch_defaults, far_past_dates,
  *               single_weekday, midnight_only
  *   all:        all_null, high_missing
  */
object Hygiene {

  /** Missing-rate threshold for the high_missing detector. */
  val MissingThreshold = 0.2
  /** Zero-rate threshold for the zero_heavy detector. */
  val ZeroThreshold = 0.5
  /** Max-length threshold for the overlong_values detector. */
  val OverlongLen = 1000

  private case class Det(name: String, measure: Column, measureSql: String)

  /** triggered = f(measure), shared by the Spark plan and the oracle. */
  private def triggered(detector: String, m: Column): Column =
    detector match {
      case "high_missing"    => m > MissingThreshold
      case "zero_heavy"      => m > ZeroThreshold
      case "overlong_values" => m > OverlongLen
      case _                 => m > 0
    }

  private def triggeredSql(detector: String, mSql: String): String =
    detector match {
      case "high_missing"    => s"$mSql > $MissingThreshold"
      case "zero_heavy"      => s"$mSql > $ZeroThreshold"
      case "overlong_values" => s"$mSql > $OverlongLen"
      case _                 => s"$mSql > 0"
    }

  private def kindIsFrac(dt: DataType): Boolean =
    dt == DoubleType || dt == FloatType || dt.isInstanceOf[DecimalType]

  private def detectors(f: StructField): Seq[Det] = {
    val c = col(f.name)
    val cs = f.name
    val isStr = f.dataType == StringType
    val isNum = f.dataType.isInstanceOf[NumericType]
    val isTs = f.dataType == TimestampType
    def cnt(cond: Column) = count(when(cond, 1)).cast(DoubleType)
    def cntSql(cond: String) =
      s"CAST(count(CASE WHEN $cond THEN 1 END) AS DOUBLE)"
    val nAll = count(lit(1)).cast(DoubleType)
    val nAllSql = "CAST(count(*) AS DOUBLE)"

    val common = Seq(
      Det("all_null", nAll - count(c).cast(DoubleType),
        s"($nAllSql - CAST(count($cs) AS DOUBLE))"),
      Det("high_missing",
        round((nAll - count(c).cast(DoubleType)) / nAll, 4),
        s"round(($nAllSql - CAST(count($cs) AS DOUBLE))/$nAllSql, 4)"))

    val str = if (!isStr) Seq.empty else Seq(
      Det("untrimmed_values", cnt(c.isNotNull && c =!= trim(c)),
        cntSql(s"$cs IS NOT NULL AND $cs <> trim($cs)")),
      Det("empty_strings", cnt(trim(c) === ""),
        cntSql(s"trim($cs) = ''")),
      Det("numeric_as_string",
        when(count(c) > 0 &&
          cnt(c.isNotNull && c.try_cast(DoubleType).isNotNull) === count(c),
          1.0).otherwise(0.0),
        s"CASE WHEN count($cs) > 0 AND ${cntSql(s"$cs IS NOT NULL AND TRY_CAST($cs AS DOUBLE) IS NOT NULL")} = count($cs) THEN 1.0 ELSE 0.0 END"),
      Det("date_as_string",
        when(count(c) > 0 &&
          cnt(c.isNotNull && c.try_cast(DateType).isNotNull) === count(c),
          1.0).otherwise(0.0),
        s"CASE WHEN count($cs) > 0 AND ${cntSql(s"$cs IS NOT NULL AND TRY_CAST($cs AS DATE) IS NOT NULL")} = count($cs) THEN 1.0 ELSE 0.0 END"),
      Det("control_chars", cnt(c.rlike("[\\x00-\\x1F]")),
        cntSql(s"regexp_matches($cs, '[\\x00-\\x1F]')")),
      Det("leading_zero_numbers", cnt(c.rlike("^0[0-9]+$")),
        cntSql(s"regexp_matches($cs, '^0[0-9]+$$')")),
      Det("embedded_quotes", cnt(c.contains("'") || c.contains("\"")),
        cntSql(s"contains($cs, '''') OR contains($cs, '\"')")),
      Det("non_ascii_values", cnt(c.rlike("[^\\x00-\\x7F]")),
        cntSql(s"regexp_matches($cs, '[^\\x00-\\x7F]')")),
      // both all-upper and all-lower spellings present → inconsistent casing
      Det("case_inconsistency",
        least(cnt(c === upper(c) && c =!= lower(c)),
          cnt(c === lower(c) && c =!= upper(c))),
        s"least(${cntSql(s"$cs = upper($cs) AND $cs <> lower($cs)")}, ${cntSql(s"$cs = lower($cs) AND $cs <> upper($cs)")})"),
      Det("dummy_values", cnt(upper(trim(c)).isin("N/A", "NA", "NONE",
        "NULL", "UNKNOWN", "MISSING", "-", "?", "TBD")),
        cntSql(s"upper(trim($cs)) IN ('N/A','NA','NONE','NULL','UNKNOWN','MISSING','-','?','TBD')")),
      Det("boolean_as_string",
        when(count(c) > 0 &&
          cnt(upper(trim(c)).isin("Y", "N", "YES", "NO", "TRUE", "FALSE",
            "T", "F")) === count(c).cast(DoubleType), 1.0).otherwise(0.0),
        s"CASE WHEN count($cs) > 0 AND ${cntSql(s"upper(trim($cs)) IN ('Y','N','YES','NO','TRUE','FALSE','T','F')")} = CAST(count($cs) AS DOUBLE) THEN 1.0 ELSE 0.0 END"),
      Det("multi_space_values", cnt(c.contains("  ")),
        cntSql(s"contains($cs, '  ')")),
      Det("overlong_values",
        coalesce(max(length(c)).cast(DoubleType), lit(0.0)),
        s"coalesce(CAST(max(length($cs)) AS DOUBLE), 0.0)"))

    val num = if (!isNum) Seq.empty else Seq(
      Det("zero_heavy",
        when(count(c) > 0, round(cnt(c === 0) / count(c), 4)).otherwise(0.0),
        s"CASE WHEN count($cs) > 0 THEN round(${cntSql(s"$cs = 0")}/count($cs), 4) ELSE 0.0 END"),
      Det("negatives_present", cnt(c < 0), cntSql(s"$cs < 0")),
      Det("zero_variance",
        when(count(c) > 1 && min(c) === max(c), 1.0).otherwise(0.0),
        s"CASE WHEN count($cs) > 1 AND min($cs) = max($cs) THEN 1.0 ELSE 0.0 END"),
      // fractional type but every value is whole → wrong storage type
      Det("integer_as_float",
        if (kindIsFrac(f.dataType))
          when(count(c) > 0 && cnt(c =!= floor(c)) === 0.0, 1.0)
            .otherwise(0.0)
        else lit(0.0),
        if (kindIsFrac(f.dataType))
          s"CASE WHEN count($cs) > 0 AND ${cntSql(s"$cs <> floor($cs)")} = 0.0 THEN 1.0 ELSE 0.0 END"
        // aggregate-shaped constant: a bare literal SELECT ... FROM t
        // would fan out to one row per input row
        else "coalesce(min(0.0), 0.0)"),
      Det("sentinel_values",
        cnt(c.isin(-1, -99, -999, 999, 9999, 99999, 999999)),
        cntSql(s"$cs IN (-1,-99,-999,999,9999,99999,999999)")),
      Det("huge_magnitude", cnt(abs(c) > 1e9),
        cntSql(s"abs($cs) > 1000000000.0")),
      // a handful of negatives in an overwhelmingly positive column
      Det("rare_negatives",
        when(cnt(c > 0) >= cnt(c < 0) * 20 && cnt(c < 0) > 0, cnt(c < 0))
          .otherwise(0.0),
        s"CASE WHEN ${cntSql(s"$cs > 0")} >= ${cntSql(s"$cs < 0")} * 20 AND ${cntSql(s"$cs < 0")} > 0 THEN ${cntSql(s"$cs < 0")} ELSE 0.0 END"))

    val ts = if (!isTs) Seq.empty else Seq(
      Det("future_dates",
        cnt(c > to_timestamp(lit(TestEvaluator.AsOfTs))),
        cntSql(s"$cs > TIMESTAMP '${TestEvaluator.AsOfTs}'")),
      Det("epoch_defaults",
        cnt(to_date(c).isin("1970-01-01", "1900-01-01")),
        cntSql(
          s"CAST($cs AS DATE) IN (DATE '1970-01-01', DATE '1900-01-01')")),
      Det("far_past_dates", cnt(c < to_timestamp(lit("1950-01-01 00:00:00"))),
        cntSql(s"$cs < TIMESTAMP '1950-01-01 00:00:00'")),
      // all events on one day-of-week: a schedule artifact, not real data.
      // Spark dayofweek is 1..7 and DuckDB 0..6, but min=max is invariant
      // under relabeling.
      Det("single_weekday",
        when(count(c) > 1 &&
          min(dayofweek(c)) === max(dayofweek(c)), 1.0).otherwise(0.0),
        s"CASE WHEN count($cs) > 1 AND min(dayofweek(CAST($cs AS DATE))) = max(dayofweek(CAST($cs AS DATE))) THEN 1.0 ELSE 0.0 END"),
      // every timestamp at 00:00:00 → dates stored as timestamps
      Det("midnight_only",
        when(count(c) > 0 &&
          cnt(date_trunc("DAY", c) === c) === count(c).cast(DoubleType),
          1.0).otherwise(0.0),
        s"CASE WHEN count($cs) > 0 AND ${cntSql(s"date_trunc('day', $cs) = $cs")} = CAST(count($cs) AS DOUBLE) THEN 1.0 ELSE 0.0 END"))

    common ++ str ++ num ++ ts
  }

  /** All hygiene findings for a table in one aggregation pass. */
  def report(df: DataFrame, tableName: String): DataFrame = {
    val entries = df.schema.fields.toSeq
      .filter(f => graft.profile.Profiler.isProfilable(f.dataType))
      .flatMap(f => detectors(f).map(d => (f.name, d)))
    require(entries.nonEmpty, s"no profilable columns in $tableName")
    val aggs = entries.zipWithIndex.map { case ((_, d), i) =>
      d.measure.as(s"__m_$i")
    }
    val structs = entries.zipWithIndex.map { case ((cn, d), i) =>
      val m = col(s"__m_$i")
      struct(
        lit(tableName).as("table_name"),
        lit(cn).as("column_name"),
        lit(d.name).as("detector"),
        m.as("measure"),
        triggered(d.name, m).as("triggered"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(structs: _*)).as("h")).select("h.*")
      .orderBy("column_name", "detector")
  }

  /** DuckDB oracle mirror of [[report]], generated from the static table
    * metadata (same pattern as ProfileOracle). Only for tables without
    * ns-precision timestamp columns.
    */
  def oracleSql(table: String): String = {
    val fields = graft.Tables.meta(table).flatMap { case (cn, kind) =>
      val dt = kind match {
        case "long"            => LongType
        case "int"             => IntegerType
        case "double"          => DoubleType
        case "string" | "json" => StringType
        case "timestamp"       => TimestampType
        case _                 => NullType
      }
      if (graft.profile.Profiler.isProfilable(dt)) Some(StructField(cn, dt))
      else None
    }
    val parts = fields.flatMap { f =>
      detectors(f).map { d =>
        s"""SELECT '$table' AS table_name, '${f.name}' AS column_name,
           |  '${d.name}' AS detector, ${d.measureSql} AS measure,
           |  ${triggeredSql(d.name, d.measureSql)} AS triggered
           |FROM $table""".stripMargin
      }
    }
    parts.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY column_name, detector")
  }
}
