package graft.tools

import scala.jdk.CollectionConverters._

/** Diagnostic behind the round-7 profiler rework: times repeated
  * profile invocations on sf0.1 lineitem while tracking Janino compile
  * count/time (CodegenMetrics) and GC time per invocation. This is the
  * probe that surfaced (a) ~100 unique codegen units per profile
  * invocation with the pre-rework per-column passes (meta literals in
  * every pass's result projection made every unit unique), (b) the
  * 100-entry generated-class cache thrashing across invocations, and
  * (c) the codegen STAGE ID baked into generated class names defeating
  * cross-stage sharing — fixed respectively by canonicalized meta-free
  * passes, spark.sql.codegen.cache.maxEntries, and
  * spark.sql.codegen.useIdInClassName=false in Sessions. Steady state
  * after the fixes: 0 compiles per repeat invocation.
  */
object ProfileCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    // optional 2nd arg: ConcurrentPasses pool-width override, for the
    // width sweep behind the r9 profile_lineitem-creep diagnosis
    args.drop(1).headOption
      .foreach(w => spark.conf.set("spark.graft.passPool", w))
    val li = graft.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    val h = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    for (i <- 1 to args.headOption.map(_.toInt).getOrElse(8)) {
      val (c0, t0, g0, w0) =
        (h.getCount, h.getSnapshot.getValues.sum, gcMs, System.nanoTime())
      graft.profile.Profiler.profile(li, "lineitem").collect()
      println(f"run $i: wall ${(System.nanoTime() - w0) / 1e9}%.2f s, " +
        s"compiles ${h.getCount - c0}, " +
        s"compile-ms ${h.getSnapshot.getValues.sum - t0}, " +
        s"gc-ms ${gcMs - g0}")
    }
    spark.stop()
  }
}
