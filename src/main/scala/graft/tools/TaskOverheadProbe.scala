package graft.tools

/** Isolate the apparent ~0.2 s fixed cost per task observed on every
  * 32-task codec stage: time trivial 32-task jobs of different shapes
  * in the standard session and report wall per job.
  */
object TaskOverheadProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f; f; f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 3e6}%8.1f ms/run")
    }
    time("rdd 32 empty tasks") {
      spark.sparkContext.parallelize(1 to 32, 32).map(_ + 1).count()
    }
    time("ds range->repartition(32) identity") {
      spark.range(500).repartition(32).mapPartitions(it => it)
        .write.format("noop").mode("overwrite").save()
    }
    time("ds range->repartition(32) tuple map") {
      spark.range(500).as[Long].repartition(32)
        .mapPartitions(_.map(d => (d, "x", d * 2, d * 3)))
        .toDF("a", "b", "c", "d")
        .write.format("noop").mode("overwrite").save()
    }
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id")).as[Long]
    time("docs fanout identity map") {
      graft.Tables.fanout(docs).mapPartitions(it => it)
        .write.format("noop").mode("overwrite").save()
    }
    time("docs fanout wav encode (audio_meta body)") {
      graft.Tables.fanout(docs).mapPartitions(_.map { d =>
        val bytes = graft.multimodal.Wav.encode(8000,
          Array.tabulate(520 + 8 * (d % 7).toInt)(i =>
            (((d + i) % 256).toInt - 128).toShort))
        (d, bytes.length.toLong)
      }).toDF("doc_id", "n")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
