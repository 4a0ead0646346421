package graft.tools
object PlanPhases {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    args.foreach { name =>
      def t[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val (df, tBuild) = t(graft.SparkEntry.queries(name)(spark, dir))
      val (_, tAna) = t(df.queryExecution.analyzed)
      val (_, tOpt) = t(df.queryExecution.optimizedPlan)
      val (_, tPhys) = t(df.queryExecution.executedPlan)
      println(f"$name: build $tBuild%.2f analyze $tAna%.2f optimize $tOpt%.2f physical $tPhys%.2f")
    }
    spark.stop()
  }
}
