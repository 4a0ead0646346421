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
  * Detector inventory (type-gated):
  *   strings:    untrimmed_values, empty_strings, numeric_as_string,
  *               date_as_string, control_chars
  *   numerics:   zero_heavy, negatives_present, zero_variance
  *   timestamps: future_dates, epoch_defaults
  *   all:        all_null, high_missing
  */
object Hygiene {

  /** Missing-rate threshold for the high_missing detector. */
  val MissingThreshold = 0.2
  /** Zero-rate threshold for the zero_heavy detector. */
  val ZeroThreshold = 0.5

  private case class Det(name: String, measure: Column, measureSql: String)

  /** triggered = f(measure), shared by the Spark plan and the oracle. */
  private def triggered(detector: String, m: Column): Column =
    detector match {
      case "high_missing" => m > MissingThreshold
      case "zero_heavy"   => m > ZeroThreshold
      case _              => m > 0
    }

  private def triggeredSql(detector: String, mSql: String): String =
    detector match {
      case "high_missing" => s"$mSql > $MissingThreshold"
      case "zero_heavy"   => s"$mSql > $ZeroThreshold"
      case _              => s"$mSql > 0"
    }

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
        cntSql(s"regexp_matches($cs, '[\\x00-\\x1F]')")))

    val num = if (!isNum) Seq.empty else Seq(
      Det("zero_heavy",
        when(count(c) > 0, round(cnt(c === 0) / count(c), 4)).otherwise(0.0),
        s"CASE WHEN count($cs) > 0 THEN round(${cntSql(s"$cs = 0")}/count($cs), 4) ELSE 0.0 END"),
      Det("negatives_present", cnt(c < 0), cntSql(s"$cs < 0")),
      Det("zero_variance",
        when(count(c) > 1 && min(c) === max(c), 1.0).otherwise(0.0),
        s"CASE WHEN count($cs) > 1 AND min($cs) = max($cs) THEN 1.0 ELSE 0.0 END"))

    val ts = if (!isTs) Seq.empty else Seq(
      Det("future_dates",
        cnt(c > to_timestamp(lit(TestEvaluator.AsOfTs))),
        cntSql(s"$cs > TIMESTAMP '${TestEvaluator.AsOfTs}'")),
      Det("epoch_defaults",
        cnt(to_date(c).isin("1970-01-01", "1900-01-01")),
        cntSql(
          s"CAST($cs AS DATE) IN (DATE '1970-01-01', DATE '1900-01-01')")))

    common ++ str ++ num ++ ts
  }

  /** All hygiene findings for a table in one aggregation pass. */
  def report(df: DataFrame, tableName: String): DataFrame = {
    val entries = df.schema.fields
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
