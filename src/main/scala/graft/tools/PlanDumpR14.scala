package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` of named registered queries to
  * individual files — the round-14 plan evidence trail
  * (`plans/r14/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.PlanDumpR14 <outDir> <suffix> <query...>
  */
object PlanDumpR14 {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    Files.createDirectories(outDir)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.drop(2).foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"dumped $name")
      } catch { case e: Throwable =>
        println(s"FAILED $name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
