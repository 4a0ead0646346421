package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Population Stability Index — the "data drift" member of the
  * reference's declared anomaly family (reference README.md:207-209),
  * complementing the mean-shift tests (B8) with a whole-distribution
  * comparison: the live column is histogrammed over bins pinned at
  * baseline time and each bin contributes (p−q)·ln(p/q) drift mass.
  * PSI ≥ 0.2 is the conventional re-baseline alarm.
  *
  * Scale shape: ONE scan with a tiny groupBy (nBins keys, map-side
  * combine), one-row total crossJoined back (no window), constant-folded
  * scalar math. The epsilon keeps ln defined on empty bins (standard
  * practice) and the formula tree is mirrored term-for-term in the
  * oracle.
  */
object DriftPsi {

  val Eps = 1e-6

  /** Per-bin PSI terms of `column` against pinned uniform-bin baseline
    * fractions over [mn, mx] captured at profiling time. The baseline
    * arrives as COUNTS (not fractions): both engines derive q with the
    * same IEEE division — a pre-divided literal round-trips through
    * DuckDB's decimal parser one ulp off.
    */
  def psi(df: DataFrame, table: String, column: String,
          mn: Double, mx: Double, baselineCounts: Seq[Long],
          baselineTotal: Long, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val baselineFracs = baselineCounts.map(_.toDouble / baselineTotal)
    val nBins = baselineFracs.size
    val c = col(column)
    val bin = least(lit(nBins - 1), greatest(lit(0),
      floor((c - lit(mn)) / (lit(mx) - lit(mn)) * nBins).cast(IntegerType)))
    val binned = df.filter(c.isNotNull)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
    val base = baselineFracs.zipWithIndex
      .map { case (q, i) => (i, q) }.toDF("bin", "q")
    val total = binned.agg(sum(col("n")).cast(DoubleType).as("__tot"))
    val p = col("n").cast(DoubleType) / col("__tot")
    base.join(binned, Seq("bin"), "left").na.fill(0L, Seq("n"))
      .crossJoin(total)
      .select(
        lit(table).as("table_name"), lit(column).as("column_name"),
        col("bin").cast(LongType).as("bin"),
        col("q").as("baseline_frac"),
        round(p, 4).as("live_frac"),
        round((p - col("q")) * log((p + lit(Eps)) / (col("q") + lit(Eps))),
          4).as("psi_term"))
      .orderBy("bin")
  }

  /** DuckDB mirror of [[psi]] with identical formula trees. */
  def oracleSql(table: String, column: String, mn: Double, mx: Double,
                baselineCounts: Seq[Long], baselineTotal: Long): String = {
    val nBins = baselineCounts.size
    // q as the same IEEE division the Spark side performs — a pre-divided
    // decimal literal would round-trip one ulp off through DuckDB
    val values = baselineCounts.zipWithIndex
      .map { case (c, i) =>
        s"($i, CAST($c AS DOUBLE)/CAST($baselineTotal AS DOUBLE))"
      }.mkString(", ")
    val binExpr =
      s"least(${nBins - 1}, greatest(0, CAST(floor(($column - $mn)/($mx - $mn)*$nBins) AS INT)))"
    val p = "CAST(coalesce(n, 0) AS DOUBLE)/tot"
    s"""WITH binned AS (
       |  SELECT $binExpr AS bin, count(*) AS n FROM $table
       |  WHERE $column IS NOT NULL GROUP BY 1),
       |base AS (SELECT * FROM (VALUES $values) t(bin, q)),
       |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM binned)
       |SELECT '$table' AS table_name, '$column' AS column_name,
       |  CAST(base.bin AS BIGINT) AS bin, base.q AS baseline_frac,
       |  round($p, 4) AS live_frac,
       |  round(($p - base.q) * ln(($p + $Eps)/(base.q + $Eps)), 4)
       |    AS psi_term
       |FROM base LEFT JOIN binned ON base.bin = binned.bin, tot
       |ORDER BY bin""".stripMargin
  }
}
