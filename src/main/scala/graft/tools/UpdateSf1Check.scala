package graft.tools

import org.apache.spark.sql.functions._

/** One-off validation that the update-mode monitors match their batch
  * twins at the MULTI-FILE sf1 layout (where the raw replica-per-file
  * staging had silently dropped batches 1..9 behind the global
  * watermark before the time-sliced staging fix).
  */
object UpdateSf1Check {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/testdata_sf1"
    val spark = graft.Sessions.local("16", "16")
    spark.sparkContext.setLogLevel("ERROR")
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(xxhash64(df.columns.map(col): _*)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect()(0)
    val ev = graft.Tables.load(spark, dir, "events")
    val late = graft.streaming.StreamingOps.lateStartUpdateRun(spark, dir,
      "0 6 * * *", 600)
    val bLate = graft.events.EventOps.lateStarts(ev, "0 6 * * *", 600,
      spark)
    println(s"late: stream=${sig(late.result)} batch=${sig(bLate)} " +
      s"match=${sig(late.result) == sig(bLate)} " +
      s"evict peak=${late.peakStateRows} final=${late.finalStateRows}")
    val vol = graft.streaming.StreamingOps.volumeUpdateRun(spark, dir)
    val bVol = graft.events.EventOps.volumeAnomalies(ev)
    println(s"volume: match=${sig(vol.result) == sig(bVol)} " +
      s"evict peak=${vol.peakStateRows} final=${vol.finalStateRows}")
    spark.stop()
  }
}
