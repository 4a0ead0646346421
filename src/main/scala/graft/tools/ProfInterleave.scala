package graft.tools

/** Interleaved serial-vs-concurrent collection A/B for the profiler
  * passes (r15): same JVM, alternating arms per round, so host drift
  * cannot masquerade as a concurrency effect. Arms:
  *  - serial: pre-planned passes collected one by one on the caller
  *  - conc:   ConcurrentPasses.collectOneRow (pool 16)
  *  - full:   Profiler.profile() end to end (build+plan+collect)
  */
object ProfInterleave {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val table = args.headOption.getOrElse("lineitem")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val df = graft.Tables.load(spark, dir, table)
    val passes = graft.profile.Profiler.passesFor(df,
      distincts = "exact", exactPercentiles = true)
    passes.foreach(_.collect()) // warm
    def t(f: => Unit): Double = {
      val w = System.nanoTime(); f; (System.nanoTime() - w) / 1e9
    }
    for (i <- 1 to rounds) {
      val ts = t(passes.foreach(_.collect()))
      val tc = t(graft.operators.ConcurrentPasses.collectOneRow(spark, passes))
      val tf = t(graft.profile.Profiler.profile(df, table).collect())
      println(f"round $i: serial $ts%5.2f s | concurrent $tc%5.2f s | " +
        f"full $tf%5.2f s")
    }
    spark.stop()
  }
}
