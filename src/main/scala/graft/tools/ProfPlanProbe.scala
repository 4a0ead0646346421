package graft.tools

/** Round-15: split one profile invocation's wall into (a) pass
  * CONSTRUCTION (DataFrame build + analysis), (b) optimization +
  * physical planning (forced via queryExecution.executedPlan), and
  * (c) concurrent execution of the pre-planned passes — to decide
  * whether the profiler family is driver-planning-bound or
  * compute-bound at sf0.1.
  */
object ProfPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val table = args.headOption.getOrElse("lineitem")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val df = graft.Tables.load(spark, dir, table)
    def t[A](f: => A): (A, Double) = {
      val w = System.nanoTime(); val a = f
      (a, (System.nanoTime() - w) / 1e9)
    }
    // warm: one full profile (codegen, page cache)
    graft.profile.Profiler.profile(df, table).collect()
    for (i <- 1 to reps) {
      val (passes, tBuild) = t(graft.profile.Profiler.passesFor(df,
        distincts = "exact", exactPercentiles = true))
      val (_, tPlan) = t(passes.foreach(_.queryExecution.executedPlan))
      val (_, tExec) = t(graft.operators.ConcurrentPasses.collectOneRow(
        spark, passes))
      val (_, tFull) = t(graft.profile.Profiler.profile(df, table).collect())
      println(f"run $i: build $tBuild%5.2f s, plan $tPlan%5.2f s, " +
        f"exec(concurrent, pre-planned) $tExec%5.2f s | " +
        f"full profile() $tFull%5.2f s  [${passes.size} passes]")
    }
    spark.stop()
  }
}
