package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: runs every SparkEntry query's logical→physical planning
  * and greps the executed plan for scale hazards. Run via
  *   sbt "runMain graft.tools.PlanAudit <sfDir>"
  * Hazards flagged:
  *   - Expand                 (distinct-aggregate / rollup row replication)
  *   - CartesianProduct       (unkeyed join)
  *   - Window with no partitioning (single-partition sort of everything)
  *   - BroadcastNestedLoopJoin (non-equi broadcast join)
  *
  * BroadcastNestedLoopJoin hits are informational, not necessarily wrong:
  * the profile/dq queries recombine one-row aggregate passes with
  * crossJoin (1×1 rows), and brute-force KNN intentionally crossJoins the
  * corpus against a broadcast query set. A BNLJ over two large sides WOULD
  * be a defect.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val plan = qe.executedPlan.toString
        // An unpartitioned window sorts the whole input on one task; the
        // plan STRING always prints ordering args inside
        // windowspecdefinition(...), so inspect the node's partitionSpec.
        val globalWindow = qe.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }.nonEmpty
        val hazards = Seq(
          "Expand" -> plan.contains("Expand"),
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" ->
            plan.contains("BroadcastNestedLoopJoin"),
          "GlobalWindow" -> globalWindow,
        ).collect { case (h, true) => h }
        if (hazards.nonEmpty) { bad += 1
          println(s"HAZARD $name: ${hazards.mkString(", ")}")
        } else println(s"clean  $name")
      } catch { case e: Throwable =>
        bad += 1; println(s"ERROR  $name: ${e.getMessage}")
      }
    }
    println(s"== audit done, $bad flagged ==")
    spark.stop()
  }
}
