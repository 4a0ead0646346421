package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is exposed twice: as a `queries` entry (Spark
  * DataFrame program) and, where ANSI-SQL-expressible, as an `oracleSql`
  * entry the driver runs under DuckDB on the same parquet tables. Column
  * names and value representations are kept hash-identical (see parity notes
  * in graft.profile.Profiler).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (ProfileQueries.queries, ProfileQueries.oracles),
    (RelationalQueries.queries, RelationalQueries.oracles),
    (QualityQueries.queries, QualityQueries.oracles),
    (EventQueries.queries, EventQueries.oracles),
    (TextQueries.queries, TextQueries.oracles),
    (SimQueries.queries, SimQueries.oracles),
    (MediaQueries.queries, MediaQueries.oracles),
    (AudioQueries.queries, AudioQueries.oracles),
    (MulawQueries.queries, MulawQueries.oracles),
    (VideoQueries.queries, VideoQueries.oracles),
    (JpegQueries.queries, JpegQueries.oracles),
    (ConfigQueries.queries, ConfigQueries.oracles),
    (RecallQueries.queries, RecallQueries.oracles),
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
