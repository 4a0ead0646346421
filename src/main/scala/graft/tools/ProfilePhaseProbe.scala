package graft.tools

/** Decomposes the profile family's steady-state cost (VERDICT r7 "Next
  * round #4"). Since the r8 concurrent-collect rework Profiler.profile
  * is EAGER (ConcurrentPasses contract): plan construction, analysis
  * AND all scan passes execute inside the profile() call, so the probe
  * reports that single phase honestly as "profile (eager)" plus the
  * residual assembly cost of collecting the LocalRelation-backed
  * result. Run after warm-up so the codegen cache is hot and the split
  * is the steady-state one.
  */
object ProfilePhaseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    def t[A](f: => A): (A, Double) = {
      val w = System.nanoTime(); val a = f
      (a, (System.nanoTime() - w) / 1e9)
    }
    for (i <- 1 to args.headOption.map(_.toInt).getOrElse(5)) {
      val (df, eager) = t(graft.profile.Profiler.profile(li, "lineitem"))
      val (_, residual) = t(df.collect())
      println(f"run $i: profile (eager, passes included) $eager%.2f s, " +
        f"residual local assembly $residual%.2f s")
    }
    spark.stop()
  }
}
