package graft.tools

import org.apache.spark.scheduler._

/** Round-14 measurement (guide §1/§7): decompose a registered query's
  * wall-clock into scheduled work (jobs / stages / tasks / summed task
  * time) vs driver-side time (planning, codegen, job submission gaps).
  * wall >> task-time/cores means the query is driver- or
  * stage-boundary-bound, not compute-bound — the optimization target is
  * then the NUMBER of jobs/stages/tasks, not the per-task work.
  *
  * Usage: runMain graft.tools.QueryAnatomy <query> [query...]
  * (each query runs twice; the SECOND run is reported, so codegen
  * compilation and page-cache warm-up are excluded)
  */
object QueryAnatomy {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null)
          taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      Seq(jobs, stages, tasks, taskMs).foreach(_.set(0))
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; give the bus a
      // moment to drain before reading (listenerBus.waitUntilEmpty is
      // private[spark])
      Thread.sleep(400)
      println(f"$name%-40s wall=$wall%6.2f jobs=${jobs.get}%4d " +
        f"stages=${stages.get}%4d tasks=${tasks.get}%6d " +
        f"taskSec=${taskMs.get / 1000.0}%8.2f")
    }
    spark.stop()
  }
}
