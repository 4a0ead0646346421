package graft.tools

import org.apache.spark.sql.functions._

/** Batch-count scaling curve for the bounded streaming sessionizer
  * (r5 verdict #8: `stream_sessions_bounded` ran 5.5× at sf1 vs sf0.1
  * — 10× the rows but ALSO 11 staged part-files vs one, i.e. 11
  * micro-batches vs one, and the artifact alone can't apportion the
  * cost between corpus size and state-store rounds).
  *
  * Holds the corpus FIXED (sf1 events, 1 M rows) and varies ONLY the
  * micro-batch count: events are range-partitioned by `ts` into k
  * files (file-name order == event-time order, preserving the
  * sessionizer's per-key arrival contract documented on
  * `sessionSummariesBounded`), staged through the identical
  * `boundedStreamRun` drop-folder path, and timed end-to-end. A flat
  * per-row cost plus a linear per-batch term (checkpoint + state-store
  * commit per micro-batch) is the expected — and healthy — shape: it
  * means 100 TB cost is set by trigger cadence, not corpus size.
  *
  * Usage: runMain graft.tools.StreamCurve [sf1Dir] [k,k,k]
  */
object StreamCurve {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/repo/testdata_sf1"
    val ks = (if (args.length > 1) args(1) else "1,11,110")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")

    val ev = spark.read.parquet(s"$src/events.parquet")
    val nRows = ev.count()
    val results = ks.map { k =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-curve-$k").toString
      // range-partition on ts: part-file NAME order is event-time order,
      // so the staged drop folder replays like a real time-ordered feed
      ev.repartitionByRange(k, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val parts = new java.io.File(s"$dir/events.parquet").listFiles()
        .count(_.getName.endsWith(".parquet"))
      // warm-up is absorbed by the k=first run; each run is a fresh
      // stream + checkpoint, so there is no cross-run state to reuse
      val t0 = System.nanoTime()
      val out = graft.streaming.StreamingOps
        .sessionSummariesBounded(spark, dir, 1800L)
      val n = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[curve] k=$k%3d files=$parts batches~$parts " +
        f"rows=$nRows sessions=$n time=$sec%.2fs")
      (k, parts, sec, n)
    }
    val json = results.map { case (k, p, s, n) =>
      s"""{"k":$k,"files":$p,"sec":$s,"sessions":$n}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"stream_batch_curve","rows":$nRows,"runs":$json}""")
    spark.stop()
  }
}
