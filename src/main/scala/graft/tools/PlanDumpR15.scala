package graft.tools

import java.nio.file.{Files, Paths}

/** Round-15 plan evidence trail. Two modes:
  *  - `query <outDir> <suffix> <name...>`: explain("formatted") of
  *    registered queries (same as PlanDumpR14);
  *  - `profpass <outDir> <suffix> <table>`: the PROFILER's per-column
  *    pass plans (the registered profile queries are eager — their
  *    result frame is a LocalRelation, so the scan passes are where
  *    plan changes show). Dumps every percentile pass of the table.
  *    Honors -Dgraft.fanout.off for the before side.
  */
object PlanDumpR15 {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    Files.createDirectories(outDir)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    mode match {
      case "query" =>
        args.drop(3).foreach { name =>
          try {
            val df = graft.SparkEntry.queries(name)(spark, dir)
            Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), fmt(df))
            println(s"dumped $name")
          } catch { case e: Throwable =>
            println(s"FAILED $name: ${e.getClass.getSimpleName} ${e.getMessage}")
          }
        }
      case "profpass" =>
        val table = args(3)
        val df = graft.Tables.load(spark, dir, table)
        val passes = graft.profile.Profiler.passesFor(df,
          distincts = "exact", exactPercentiles = true)
        val pct = passes.filter(_.columns.exists(_.startsWith("__q_")))
        val txt = pct.zipWithIndex.map { case (p, i) =>
          s"== percentile pass ${p.columns.mkString(",")} ==\n" + fmt(p)
        }.mkString("\n\n")
        Files.writeString(
          outDir.resolve(s"profile_${table}_pctpass_$suffix.txt"), txt)
        println(s"dumped ${pct.size} percentile passes of $table")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
