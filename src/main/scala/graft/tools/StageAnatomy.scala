package graft.tools

import org.apache.spark.scheduler._

/** Per-STAGE decomposition of one registered query (round-14, guide
  * §7.1): which stages carry the task time that QueryAnatomy reported
  * in aggregate. Prints every stage of the query's second run with its
  * task count, summed task time, and the stage name (callsite).
  *
  * Usage: runMain graft.tools.StageAnatomy <query>
  */
object StageAnatomy {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    case class St(name: String, var tasks: Int = 0, var ms: Long = 0L,
                  var gcMs: Long = 0L, var rows: Long = 0L)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val record = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (record.get)
          stages.putIfAbsent(s.stageInfo.stageId,
            St(s.stageInfo.name.take(110)))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val st = stages.get(t.stageId)
        if (st != null && t.taskInfo != null) st.synchronized {
          st.tasks += 1
          st.ms += t.taskInfo.duration
          if (t.taskMetrics != null) {
            st.gcMs += t.taskMetrics.jvmGCTime
            st.rows += t.taskMetrics.outputMetrics.recordsWritten +
              t.taskMetrics.shuffleWriteMetrics.recordsWritten
          }
        }
      }
    })
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val name = args(0)
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
    record.set(true)
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    record.set(false)
    println(f"== $name wall=$wall%.2f ==")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2.ms).take(25).foreach {
      case (id, st) =>
        println(f"stage=$id%5d tasks=${st.tasks}%4d taskSec=${st.ms / 1000.0}%8.2f gcSec=${st.gcMs / 1000.0}%6.2f shufRows=${st.rows}%9d  ${st.name}")
    }
    spark.stop()
  }
}
