package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: runs every SparkEntry query's logical→physical planning
  * and greps the executed plan for scale hazards. Run via
  *   sbt "runMain graft.tools.PlanAudit <sfDir>"
  * Hazards flagged:
  *   - Expand                 (distinct-aggregate / rollup row replication)
  *   - NestedLoopJoin         (cartesian/broadcast nested loop where
  *                             NEITHER logical side is a one-row aggregate
  *                             — 1×N recombinations of scalar passes are
  *                             benign and suppressed)
  *   - Window with no partitioning (single-partition sort of everything)
  *
  * Queries in [[BruteForceByDesign]] are reported as `noted` instead of
  * `HAZARD` when their only hit is the nested loop: the exact KNN /
  * exact-cosine tiers are documented all-pairs scans kept as oracle
  * baselines for the LSH paths.
  */
object PlanAudit {

  /** Documented all-pairs tiers (scaladoc'd in sim.Similarity): the
    * brute-force oracle baselines for the LSH-bucketed scale paths.
    */
  val BruteForceByDesign: Set[String] =
    Set("knn_embeddings",
      // the pure-SQL twin of knn_embeddings: same brute-force tier,
      // same oracle, same documented all-pairs posture
      "knn_sql_embeddings",
      "neardup_cosine_embeddings",
      // candidate tier IS cosineNearDupPairs (same documented block-tiled
      // all-pairs scan; swap in the LSH tier at corpus scale)
      "semantic_dedup_pairs",
      // the recall gate's ground truth IS the knn brute-force tier: a
      // recall check against exact truth cannot avoid the exact tier it
      // audits (SimQueries.annIvfRecallCheck; bounded to NQueries rows)
      "ann_ivf_recall_check",
      // recall checks compare an ANN tier against the brute-force
      // oracle top-K BY DEFINITION — the all-pairs side is the truth
      // set, on NQueries query rows only
      "ann_pq_recall_check",
      // the user×slot coverage FRAME is the semantics, not an accident:
      // a broadcast cross of two control-plane-sized sides (distinct
      // pipelines × driver-expanded cron slots), both orders of
      // magnitude below event count (EventOps.missedRuns)
      "ev_missed_runs")

  /** Queries whose global (unpartitioned) window runs over CONTROL-PLANE
    * rows, where a global sequence IS the operator's contract:
    * OutcomeExport.pack numbers test outcomes (one row per test
    * definition, 10²–10⁴ at any corpus size — never per data row) in the
    * reference's deterministic walk order to chunk them 100-per-post.
    */
  val GlobalOrderByDesign: Set[String] = Set("dq_export_rollup_customer",
    // same pack step, same contract: the quick-start pipeline numbers
    // its ~10² generated-test outcomes through OutcomeExport.pack
    "pipeline_quickstart")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local("4", "4")
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
        // A nested-loop join is only a hazard when neither logical side
        // is bounded to one row (scalar-aggregate recombination) and no
        // TOP-LEVEL equality conjunct between non-literal sides could
        // have hash-partitioned it. (An EqualTo under OR, or against a
        // literal, does not make a join hash-joinable — and a Generate/
        // Expand above a scalar aggregate multiplies rows, so it is not
        // one-row.)
        import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe,
          EqualTo, Expression, Literal}
        import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
          Expand, Generate, Join, LogicalPlan, UnaryNode}
        def oneRow(p: LogicalPlan): Boolean = p match {
          case a: Aggregate => a.groupingExpressions.isEmpty
          case _: Generate | _: Expand => false
          case u: UnaryNode => oneRow(u.child)
          case _            => p.maxRows.exists(_ <= 1L)
        }
        def conjuncts(e: Expression): Seq[Expression] = e match {
          case And(l, r) => conjuncts(l) ++ conjuncts(r)
          case x         => Seq(x)
        }
        def hashableEquality(cond: Option[Expression]): Boolean =
          cond.exists(conjuncts(_).exists {
            case EqualTo(l, r) =>
              !l.isInstanceOf[Literal] && !r.isInstanceOf[Literal]
            case EqualNullSafe(l, r) =>
              !l.isInstanceOf[Literal] && !r.isInstanceOf[Literal]
            case _ => false
          })
        val realNestedLoop = qe.optimizedPlan.collect {
          case j: Join if !oneRow(j.left) && !oneRow(j.right) &&
              !hashableEquality(j.condition) => j
        }.nonEmpty
        val hazards = Seq(
          "Expand" -> plan.contains("Expand"),
          "NestedLoopJoin" -> ((plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")) && realNestedLoop),
          "GlobalWindow" -> globalWindow,
        ).collect { case (h, true) => h }
        if (hazards == Seq("NestedLoopJoin") && BruteForceByDesign(name))
          println(s"noted  $name: all-pairs tier by design")
        else if (hazards == Seq("GlobalWindow") && GlobalOrderByDesign(name))
          println(s"noted  $name: control-plane global sequence by design")
        else if (hazards.nonEmpty) { bad += 1
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
