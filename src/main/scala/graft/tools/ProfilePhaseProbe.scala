package graft.tools

/** Decomposes the profile family's steady-state cost (VERDICT r7 "Next
  * round #4"): how much of a profile invocation is DataFrame
  * construction + Catalyst analysis (driver-side, serial) vs executed
  * plan preparation vs actual job execution. Run after warm-up so the
  * codegen cache is hot and the split is the steady-state one.
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
      val (df, build) = t(graft.profile.Profiler.profile(li, "lineitem"))
      val (_, exec) = t(df.collect())
      println(f"run $i: build $build%.2f s, execute $exec%.2f s")
    }
    spark.stop()
  }
}
