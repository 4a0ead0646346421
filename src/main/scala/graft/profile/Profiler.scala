package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler.
  *
  * Re-expresses the reference's "data profiling of 51 data characteristics …
  * fast in database SQL execution (no data copies)"
  * (reference README.md:207-209; parameter vocabulary in
  * demo/input_data/data_tests.csv — Baseline_Ct / Baseline_Value_Ct /
  * Baseline_Unique_Ct / Baseline_Avg / Baseline_SD / Baseline_Sum / min-max
  * dates / value lengths) as a single wide Spark `agg()`: one struct of
  * statistics per input column, then `explode` to one profile row per column.
  *
  * Scale notes (100 TB): the non-distinct statistics are ONE scan + ONE
  * partial-aggregate shuffle of a single row. Distinct counts are computed
  * in ONE NARROW PASS PER DISTINCT EXPRESSION (column pruning means each
  * pass scans only its own column) and recombined with crossJoin — putting
  * them all in one agg() would make Catalyst plan an Expand that replicates
  * every input row once per distinct expression, the same scale hazard the
  * quality evaluator avoids (see TestEvaluator). `exactDistinct=false`
  * switches the distinct passes to HyperLogLog (`approx_count_distinct`)
  * when oracle parity is not required.
  *
  * Numeric parity design: sums are computed in DECIMAL(28,6) — exact and
  * addition-order-independent, so results hash-match any other engine
  * computing the same decimal sums. Mean/stddev are then *derived* from the
  * exact sums in double math, which is deterministic given identical inputs.
  */
object Profiler {

  /** DECIMAL type used for exact, order-independent numeric sums. */
  val SumDec: DecimalType = DecimalType(28, 6)

  def typeLabel(dt: DataType): String = dt match {
    case LongType      => "bigint"
    case IntegerType   => "int"
    case DoubleType    => "double"
    case FloatType     => "float"
    case StringType    => "string"
    case TimestampType => "timestamp"
    case _: DecimalType => "decimal"
    case BooleanType   => "boolean"
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => "floatarr"
    case other         => other.simpleString
  }

  /** Profile every (profilable) column of `df` in one aggregate pass.
    * Output: one row per column, ordered by column_name (deterministic for
    * the oracle hash compare).
    */
  def profile(df: DataFrame, tableName: String,
              exactDistinct: Boolean = true): DataFrame = {
    val fields = df.schema.fields.zipWithIndex.filter {
      case (f, _) => isProfilable(f.dataType)
    }
    require(fields.nonEmpty, s"no profilable columns in $tableName")
    def dct(c: Column) =
      if (exactDistinct) countDistinct(c) else approx_count_distinct(c)

    // base pass: every non-distinct statistic for every column, one scan
    val baseAggs = fields.map { case (f, i) =>
      columnStats(f, i, tableName).as(s"__p_$i")
    }
    val basePass = df.agg(baseAggs.head, baseAggs.tail: _*)
    // one narrow pass per distinct expression — no Expand anywhere
    val distinctPasses = fields.map { case (f, i) =>
      df.agg(dct(col(f.name)).as(s"__d_$i"))
    } ++ fields.collect { case (f, i) if f.dataType == TimestampType =>
      df.agg(dct(to_date(col(f.name))).as(s"__dd_$i"))
    }
    val agged = distinctPasses.foldLeft(basePass)(_.crossJoin(_))

    val structs = fields.map { case (f, i) =>
      val isTs = f.dataType == TimestampType
      val baseCols = BaseFieldsHead.map(n => col(s"__p_$i.$n").as(n))
      val tailCols = BaseFieldsTail.map(n => col(s"__p_$i.$n").as(n))
      struct((baseCols :+ col(s"__d_$i").as("distinct_ct")) ++ tailCols :+
        (if (isTs) col(s"__dd_$i") else lit(null).cast(LongType))
          .as("distinct_date_ct"): _*)
    }
    agged.select(explode(array(structs: _*)).as("p"))
      .select("p.*")
      .orderBy("column_name")
  }

  /** Output field order around the two distinct-count slots. */
  private val BaseFieldsHead = Seq("table_name", "column_name", "ordinal",
    "data_type", "record_ct", "value_ct", "null_ct")
  private val BaseFieldsTail = Seq("min_len", "max_len", "avg_len",
    "blank_ct", "min_str", "max_str", "min_num", "max_num", "avg_num",
    "stdev_num", "sum_num", "frac_sum", "zero_ct", "neg_ct", "min_ts",
    "max_ts", "embedded_space_ct", "upper_ct", "lower_ct",
    "numeric_str_ct", "date_str_ct", "pos_ct", "frac_value_ct",
    "future_ct", "weekend_ct")

  def isProfilable(dt: DataType): Boolean = dt match {
    case StringType | TimestampType => true
    case _: NumericType             => true
    // embedding columns: cardinality + element-count stats (min/max/avg
    // length reuse the string length slots)
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** stddev from exact decimal sums: sqrt((s2 - s1^2/n) / (n-1)).
    * Deterministic across engines because s1/s2 are exact decimals.
    */
  private def derivedStd(s1: Column, s2: Column, n: Column): Column = {
    val num = s2.cast(DoubleType) - s1.cast(DoubleType) * s1.cast(DoubleType) / n
    when(n > 1, sqrt(greatest(num, lit(0.0)) / (n - lit(1))))
  }

  /** All non-distinct statistics of one column (the distinct counts are
    * separate passes — see [[profile]]).
    */
  private def columnStats(f: StructField, i: Int, table: String): Column = {
    val c = col(f.name)
    val isStr = f.dataType == StringType
    val isNum = f.dataType.isInstanceOf[NumericType]
    val isTs = f.dataType == TimestampType
    val isArr = f.dataType.isInstanceOf[ArrayType]
    val isFrac = f.dataType == DoubleType || f.dataType == FloatType ||
      f.dataType.isInstanceOf[DecimalType]
    def nl = lit(null).cast(LongType)
    def nd = lit(null).cast(DoubleType)
    def ns = lit(null).cast(StringType)
    def nt = lit(null).cast(TimestampType)

    val valueCt = count(c)
    // exact decimal sums for numeric columns
    val dec = c.cast(SumDec)
    val s1 = sum(dec)
    val s2 = sum((c.cast(DoubleType) * c.cast(DoubleType)).cast(SumDec))
    val lenSum = sum(length(c).cast(LongType))

    struct(
      lit(table).as("table_name"),
      lit(f.name).as("column_name"),
      lit(i.toLong).as("ordinal"),
      lit(typeLabel(f.dataType)).as("data_type"),
      count(lit(1)).as("record_ct"),
      valueCt.as("value_ct"),
      count(when(c.isNull, 1)).as("null_ct"),
      (if (isStr) min(length(c)).cast(LongType)
       else if (isArr) min(size(c)).cast(LongType) else nl).as("min_len"),
      (if (isStr) max(length(c)).cast(LongType)
       else if (isArr) max(size(c)).cast(LongType) else nl).as("max_len"),
      (if (isStr) round(lenSum.cast(DoubleType) / valueCt, 4)
       else if (isArr)
         round(sum(size(c).cast(LongType)).cast(DoubleType) / valueCt, 4)
       else nd).as("avg_len"),
      (if (isStr) count(when(trim(c) === "", 1)) else nl).as("blank_ct"),
      (if (isStr) min(c) else ns).as("min_str"),
      (if (isStr) max(c) else ns).as("max_str"),
      (if (isNum) min(c).cast(DoubleType) else nd).as("min_num"),
      (if (isNum) max(c).cast(DoubleType) else nd).as("max_num"),
      (if (isNum) round(s1.cast(DoubleType) / valueCt, 4) else nd)
        .as("avg_num"),
      (if (isNum) round(derivedStd(s1, s2, valueCt), 4) else nd)
        .as("stdev_num"),
      // Final representation is DOUBLE: the decimal sum is exact and
      // order-independent internally, but DECIMAL(38,x) output columns do
      // not hash-match the DuckDB oracle's representation, while doubles
      // derived from the same exact decimal do (CORRECTNESS_r01 analysis).
      (if (isNum) s1.cast(DoubleType) else nd).as("sum_num"),
      (if (isFrac)
        sum(dec - floor(c).cast(SumDec)).cast(DoubleType)
      else nd).as("frac_sum"),
      (if (isNum) count(when(c === 0, 1)) else nl).as("zero_ct"),
      (if (isNum) count(when(c < 0, 1)) else nl).as("neg_ct"),
      (if (isTs) min(c) else nt).as("min_ts"),
      (if (isTs) max(c) else nt).as("max_ts"),
      // shape characteristics (toward the reference's 51-characteristic
      // profile): string content classes, numeric sign, date placement
      (if (isStr) count(when(c.contains(" "), 1)) else nl)
        .as("embedded_space_ct"),
      (if (isStr) count(when(c === upper(c), 1)) else nl).as("upper_ct"),
      (if (isStr) count(when(c === lower(c), 1)) else nl).as("lower_ct"),
      (if (isStr) count(when(c.try_cast(DoubleType).isNotNull, 1)) else nl)
        .as("numeric_str_ct"),
      (if (isStr) count(when(c.try_cast(DateType).isNotNull, 1)) else nl)
        .as("date_str_ct"),
      (if (isNum) count(when(c > 0, 1)) else nl).as("pos_ct"),
      (if (isFrac) count(when(c =!= floor(c), 1)) else nl)
        .as("frac_value_ct"),
      (if (isTs)
        count(when(c > to_timestamp(lit(graft.quality.TestEvaluator.AsOfTs)),
          1))
      else nl).as("future_ct"),
      (if (isTs) count(when(dayofweek(c).isin(1, 7), 1)) else nl)
        .as("weekend_ct"),
    )
  }

  /** Top-k most frequent values of one column (the profiling "LOV"
    * characteristic backing LOV_Match test generation —
    * reference demo/input_data/data_tests.csv `Baseline_Value=('No','Yes')`).
    * Separate grouped pass; at scale this is a partial-agg'd groupBy on a
    * single column (map-side combine), cheap relative to the main scan.
    */
  def topK(df: DataFrame, tableName: String, column: String,
           k: Int = 10): DataFrame =
    // orderBy+limit plans as TakeOrderedAndProject: each partition keeps a
    // local top-k heap and the driver merges k·P rows — no global single-
    // partition window over all value groups (the r1 plan's scale hazard).
    // Rank is implied by the (value_ct desc, value) output order; emitting a
    // row_number column would force a WindowExec for zero information.
    df.filter(col(column).isNotNull)
      .groupBy(col(column).cast(StringType).as("value"))
      .agg(count(lit(1)).as("value_ct"))
      .orderBy(col("value_ct").desc, col("value"))
      .limit(k)
      .select(lit(tableName).as("table_name"), lit(column).as("column_name"),
        col("value"), col("value_ct"))
}
