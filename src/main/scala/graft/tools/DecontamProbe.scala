package graft.tools

import org.apache.spark.sql.functions._

/** Decomposes stream_decontam_bounded's wall clock (the diagnostic that
  * found the r9 memory-sink bottleneck). Findings at sf0.1, local[32]:
  *
  *  - passthrough stream over the same staged drop: ~0.7-1.5 s (harness)
  *  - the batch equivalents of both branches: ~1.5 s total — the Bloom
  *    probe and the exact-verify join are effectively free
  *  - the MEMORY-SINK stream held at ~7-9 s regardless of which branch
  *    ran, and a no-compute stream pushing the same ~1M rows cost ~6-7 s
  *    → the cost was driver-side memory-sink row delivery (~6 µs/row),
  *    not computation. The synthetic corpus is heavily contaminated, so
  *    the per-hit evidence stream is ~1M rows.
  *  - .repartition(32) before the heavy lambda made it SLOWER (11-13 s):
  *    the explode was never the bottleneck.
  *
  * Fix shipped: per-batch per-doc aggregation in foreachBatch into the
  * keyed ParquetMergeSink (exact — each doc lives wholly in one batch);
  * the gate dropped to ~2.5 s median-of-5. This probe retains the
  * memory-sink variant for regression comparison.
  */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.TextQueries.{BenchSplit, ShingleN}
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val all = graft.Tables.load(spark, dir, "documents")
    val schema = all.schema
    val bench = all.filter(col("doc_id") < BenchSplit)
    val bs = graft.text.Dedup.shingles(bench, "text", "doc_id", ShingleN)
      .select(col("shingle")).distinct().localCheckpoint(true)
    val bloom = graft.functions.Bloom.buildCounted(bs, "shingle", 0.01)
    val joined = (0 until ShingleN).map(j => s"words[i + $j]").mkString(", ")
    def withSh(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("doc_id") >= BenchSplit)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("words"))
      .filter(size(col("words")) >= ShingleN)
      .select(col("doc_id"), array_distinct(expr(
        s"transform(slice(words, 1, size(words) - ${ShingleN - 1})," +
          s" (w, i) -> concat_ws(' ', $joined))")).as("shs"))
    def memorySinkRun(build: String => org.apache.spark.sql.DataFrame): Unit =
      graft.streaming.StreamingOps.boundedStreamRun(spark,
        s"$dir/documents.parquet", build,
        sink => sink.groupBy().count()).count()
    all.count()
    (1 to 2).foreach { round =>
      println(s"-- round $round")
      time("batch-hits") {
        withSh(all).select(col("doc_id"), explode(col("shs")).as("shingle"))
          .filter(bloom.mightContain(col("shingle")))
          .join(bs, "shingle").count()
      }
      time("memsink-hits") { memorySinkRun(drop =>
        withSh(spark.readStream.schema(schema).parquet(drop))
          .select(col("doc_id"), explode(col("shs")).as("shingle"))
          .filter(bloom.mightContain(col("shingle")))
          .join(bs, "shingle").select(col("doc_id"))) }
      time("shipped-gate") {
        graft.queries.TextQueries
          .queries("stream_decontam_bounded")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
