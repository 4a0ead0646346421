package graft.tools

/** Interleaved A/B of Tables.fanout per query (round-14): on this box
  * host-steal bursts make isolated runs unreliable, so fanout-on and
  * fanout-off reps alternate within one JVM and the per-config MIN is
  * compared. Usage: runMain graft.tools.FanoutAb <reps> <query...>
  */
object FanoutAb {
  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val on = collection.mutable.ArrayBuffer.empty[Double]
      val off = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        System.clearProperty("graft.fanout.off"); on += run()
        System.setProperty("graft.fanout.off", "1"); off += run()
      }
      System.clearProperty("graft.fanout.off")
      println(f"$name%-36s on=${on.min}%5.2f off=${off.min}%5.2f " +
        f"(on ${on.map(t => f"$t%.2f").mkString(",")} | " +
        f"off ${off.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
