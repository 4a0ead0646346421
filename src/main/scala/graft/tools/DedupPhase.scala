package graft.tools

import org.apache.spark.sql.functions._

/** Phase timing of the minhash near-dup pipeline at sf0.1 (round-14):
  * shingles → signatures → lsh candidates → verify, each drained to
  * noop twice (second time reported). Attributes the wall seconds the
  * bench charges to neardup_minhash_collapsed_documents.
  */
object DedupPhase {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val D = graft.text.Dedup
    val df = graft.Tables.load(spark, dir, "documents")
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val classes = df
      .select(md5(D.normalize(col("text"))).as("__h"), col("doc_id"))
      .groupBy(col("__h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("__sz"))
    val reps = classes
      .join(df.select(col("doc_id"), col("text")), Seq("doc_id"))
      .localCheckpoint(true)
    time("shingles")(D.shingles(reps, "text", "doc_id", 2))
    val sh = D.shingles(reps, "text", "doc_id", 2).localCheckpoint(true)
    time("minhash(crossEngine)")(
      D.minhashSignatures(sh, "doc_id", 128, crossEngine = true))
    time("minhash(xxhash)")(
      D.minhashSignatures(sh, "doc_id", 128, crossEngine = false))
    val sigs = D.minhashSignatures(sh, "doc_id", 128, crossEngine = true)
      .localCheckpoint(true)
    time("lshCandidates")(
      D.lshCandidates(sigs, "doc_id", 128, 32, crossEngine = true))
    val cand = D.lshCandidates(sigs, "doc_id", 128, 32, crossEngine = true)
      .localCheckpoint(true)
    println(s"candidate pairs: ${cand.count()}")
    time("verifyPairs")(D.verifyPairs(cand, sh, "doc_id", 0.4))
    spark.stop()
  }
}
