package graft.tools

/** Round-14 measurement (guide §1/§2): how much of a stream gate's
  * wall-clock is per-trigger fixed cost proportional to the SHUFFLE /
  * STATE PARTITION count? Each stateful micro-batch commits one state
  * store (delta file + commit marker) per shuffle partition, and every
  * foreachBatch delta write produces one parquet part per non-empty
  * partition — at sf0.1 a trigger carries a few thousand rows, so 32
  * partitions is 32× the file ops for no parallelism gain. This probe
  * times representative gates with `spark.sql.shuffle.partitions`
  * scoped to each candidate value around the gate invocation (streams
  * read the conf at query start; checkpoints here are fresh per run).
  *
  * Usage: runMain graft.tools.StreamShufProbe [parts,parts,...] [reps]
  */
object StreamShufProbe {
  def main(args: Array[String]): Unit = {
    val parts = (if (args.length > 0) args(0) else "32,8,4")
      .split(",").map(_.trim).toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val gates = Seq(
      "stream_liveness_availablenow", "stream_volume_restart",
      "stream_late_update", "stream_sessions_bounded",
      "stream_journeys_multi_bounded", "stream_profile_restart",
      "stream_rule_alerts_bounded", "stream_sessions_restart_rocksdb")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warmup
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    gates.foreach { g =>
      val fn = graft.SparkEntry.queries(g)
      // INTERLEAVED reps (32,16,8,4,32,16,8,4,...) so JVM/codegen
      // warm-up is spread evenly across configs instead of crediting
      // whichever config happens to run last; one throwaway warm-up
      // rep per gate first. Config is applied via the env-override knob
      // the gate itself reads (SPARK_GRAFT_STREAM_PARTS is env-only, so
      // this probe uses the system property fallback — see
      // streamGateParts) rather than the session conf, which the gate
      // scope would overwrite anyway.
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$g warmup FAILED: $e") }
      val acc = scala.collection.mutable.Map.empty[String, Vector[Double]]
        .withDefaultValue(Vector.empty)
      (1 to reps).foreach { _ =>
        parts.foreach { p =>
          System.setProperty("graft.stream.parts", p)
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          acc(p) = acc(p) :+ (System.nanoTime() - t0) / 1e9
        }
      }
      System.clearProperty("graft.stream.parts")
      parts.foreach { p =>
        val ts = acc(p)
        println(f"$g%-36s parts=$p%-3s min=${ts.min}%6.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
