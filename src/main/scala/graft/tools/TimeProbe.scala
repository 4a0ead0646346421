package graft.tools
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    args.foreach { name =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan // force planning
      val t1 = System.nanoTime()
      df.collect()
      val t2 = System.nanoTime()
      df.collect()
      val t3 = System.nanoTime()
      println(f"$name: plan ${(t1-t0)/1e9}%.2f exec1 ${(t2-t1)/1e9}%.2f exec2 ${(t3-t2)/1e9}%.2f")
    }
    spark.stop()
  }
}
