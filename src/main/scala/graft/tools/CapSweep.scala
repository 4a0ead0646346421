package graft.tools

import org.apache.spark.sql.functions._

/** Candidate-volume sweep over the LSH hot-bucket cap at a given SF
  * dir: computes the collapsed-tier signatures ONCE, then candidate
  * counts + final-key occupancy histograms for several cap values —
  * the decision data for [[graft.text.Dedup.LshMaxBucket]] (r14: does
  * a lower cap flatten the sf1→sf10 candidate slope without touching
  * the recall floors?).
  *   sbt "runMain graft.tools.CapSweep <sfDir> [caps...]"
  */
object CapSweep {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/testdata_sf1"
    val caps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
               else Seq(128, 64, 32)
    val spark = graft.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.Dedup
    val df = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val classes = df
      .select(md5(Dedup.normalize(col("text"))).as("__h"), col("doc_id"))
      .groupBy(col("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
    val reps = classes.join(df, Seq("doc_id"))
    val sh = Dedup.shingles(reps, "text", "doc_id", 2).localCheckpoint(true)
    val sigs = Dedup.minhashSignatures(sh, "doc_id", 128, crossEngine = true)
      .localCheckpoint(true)
    val nDocs = sigs.count()
    println(s"[sweep] dir=$dir reps=$nDocs")
    caps.foreach { cap =>
      val t0 = System.nanoTime()
      val cand = Dedup.lshCandidates(sigs, "doc_id", 128, 32,
        crossEngine = true, maxBucket = cap).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] cap=$cap%4d candidates=$cand%12d " +
        f"perDoc=${cand.toDouble / nDocs}%8.1f wall=$secs%7.1fs")
    }
    spark.stop()
  }
}
