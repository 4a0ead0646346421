package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic for the AQE skew-join gate (`ev_skew_join`, not itself
  * registered): prints the scan's map-task count, the corpus part-file
  * layout, OptimizeSkewedJoin's DEBUG sizes, and the final adaptive
  * plan. Findings that shaped the PlansSpec gate:
  *
  *  - the rule fired (median 595 B vs hot 12.5 KB) yet split NOTHING
  *    while the corpus was one part file: a parquet file is one row
  *    group, one row group is one mapper, and AQE can only split a
  *    skewed partition along MAPPER boundaries — `repartition(10)`
  *    on the corpus write is what makes the split observable at test
  *    scale (at 100 TB thousands of mappers is the given);
  *  - a rollup grouping ON the join key suppresses the split entirely
  *    (the SMJ's output partitioning satisfies it, and the rule
  *    refuses to introduce an extra shuffle) — the registered query
  *    groups on the error hour instead, see EventQueries.skewJoin.
  *
  * Run: `sbt "runMain graft.tools.SkewScratch"`.
  */
object SkewScratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("8", "8")
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.adaptive",
      org.apache.logging.log4j.Level.DEBUG)
    val sf = "/root/testdata/sf0.001"
    val src = graft.Tables.load(spark, sf, "events")
    val dir = java.nio.file.Files.createTempDirectory("skewjoin").toString
    src.crossJoin(spark.range(10).toDF("k"))
      .withColumn("event_id", col("event_id") * 10 + col("k")).drop("k")
      .withColumn("user_id",
        when(col("event_id") % 10 =!= 0, lit(1L)).otherwise(col("user_id")))
      // many part files: one file is one parquet row group, i.e. ONE
      // mapper owning every hot row -- and AQE can only split a skewed
      // partition along mapper boundaries
      .repartition(10)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.files.maxPartitionBytes" -> "16KB",
      "spark.sql.files.openCostInBytes" -> "0"
    ).foreach { case (k, v) => spark.conf.set(k, v) }
    val scanParts = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "error").rdd.getNumPartitions
    println(s"=== SCAN MAP TASKS: $scanParts ===")
    val files = new java.io.File(s"$dir/events.parquet").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    println(s"=== PART FILES: ${files.length}, sizes: ${files.map(_.length).mkString(",")} ===")
    val df = graft.queries.EventQueries.skewJoin(spark, dir)
    df.collect()
    println("=== FINAL PLAN ===")
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
