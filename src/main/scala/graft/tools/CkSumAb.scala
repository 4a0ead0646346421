package graft.tools

/** Interleaved A/B of spark.sql.streaming.checkpoint.fileChecksum.enabled
  * on representative stream gates (round-14): Spark 4.1 writes a
  * companion checksum file for every checkpoint file (offset log,
  * commit log, state delta), doubling the per-trigger file ops of the
  * ephemeral per-run gate checkpoints.
  * Usage: runMain graft.tools.CkSumAb <reps> <gate...>
  */
object CkSumAb {
  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val key = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
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
        spark.conf.set(key, "true"); on += run()
        spark.conf.set(key, "false"); off += run()
      }
      spark.conf.unset(key)
      println(f"$name%-36s on=${on.min}%5.2f off=${off.min}%5.2f " +
        f"(on ${on.map(t => f"$t%.2f").mkString(",")} | " +
        f"off ${off.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
