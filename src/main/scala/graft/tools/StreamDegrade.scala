package graft.tools

import scala.jdk.CollectionConverters._

/** Round-15 diagnosis: stream gates run back-to-back in one JVM degrade
  * severely (BENCH_r15_mid solo medians 3-10× their sweep medians;
  * CkSumAb reps drifting 6 → 18 s). This probe runs one gate N times
  * and prints wall, GC delta, heap, live thread count, and the JVM's
  * loaded state-store maintenance thread population so the accumulating
  * resource is attributable.
  *
  * Usage: runMain graft.tools.StreamDegrade <reps> <query> [gcEach]
  */
object StreamDegrade {
  def main(args: Array[String]): Unit = {
    val reps = args(0).toInt
    val name = args(1)
    val gcEach = args.length > 2 && args(2) == "gc"
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries(name)
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def heapMb: Long = {
      val m = java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage
      m.getUsed >> 20
    }
    def threads: (Int, Int) = {
      val all = Thread.getAllStackTraces.keySet.asScala.toSeq
      (all.size, all.count(t =>
        t.getName.contains("state-store-maintenance") ||
          t.getName.contains("rocksdb")))
    }
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    for (i <- 1 to reps) {
      if (gcEach) { System.gc(); Thread.sleep(200) }
      val (g0, t0) = (gcMs, System.nanoTime())
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val (nThreads, nMaint) = threads
      println(f"rep $i: wall $wall%6.2f s  gc ${gcMs - g0}%5d ms  " +
        f"heap $heapMb%5d MB  threads $nThreads%4d  " +
        f"maint/rocksdb $nMaint%3d")
    }
    // leaked-thread attribution: histogram of thread-name prefixes
    // (digits stripped) so the grower is identifiable
    Thread.getAllStackTraces.keySet.asScala.toSeq
      .map(_.getName.replaceAll("[0-9]+", "#"))
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy(-_._2).take(16)
      .foreach { case (n, c) => println(f"$c%4d  $n") }
    spark.stop()
  }
}
