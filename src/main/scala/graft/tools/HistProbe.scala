package graft.tools

import org.apache.spark.sql.functions._

/** Final-key occupancy histogram for the widened LSH candidate tier at
  * a given SF dir: per-pass-1 bucket states (cool / hot), the widened
  * sub-bucket distribution inside hot buckets, and the pre-distinct
  * pair emissions of the OLD semantics (cool buckets only — hot
  * dropped) vs the NEW (cool + widened sub-buckets ≤ cap). The
  * r14 adjudication data for the collapse query's scale slope.
  *   sbt "runMain graft.tools.HistProbe <sfDir>"
  */
object HistProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/testdata_sf1"
    val spark = graft.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text.Dedup
    val cap = Dedup.LshMaxBucket
    val df = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val classes = df
      .select(md5(Dedup.normalize(col("text"))).as("__h"), col("doc_id"))
      .groupBy(col("__h")).agg(min(col("doc_id")).as("doc_id"))
    val reps = classes.join(df, Seq("doc_id"))
    val sh = Dedup.shingles(reps, "text", "doc_id", 2)
    val sigs = Dedup.minhashSignatures(sh, "doc_id", 128, crossEngine = true)
      .localCheckpoint(true)
    val k = 128; val bands = 32; val r = k / bands
    def key(j: Int) = concat_ws(":",
      (j * r until (j + 1) * r).map(i => col("sig")(i).cast("string")): _*)
    val bandStructs = (0 until bands).map { j =>
      struct(lit(j).as("band"), key(j).as("bh"),
        key((j + 1) % bands).as("bx"))
    }
    val buckets = sigs.select(col("doc_id"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bh").as("bh"), col("bb.bx").as("bx"))
      .localCheckpoint(true)
    val n1 = buckets.groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    println(s"[hist] dir=$dir cap=$cap bandRows=${buckets.count()} " +
      s"distinctKeys=${n1.count()}")
    // pass-1 occupancy histogram
    n1.select(when(col("n") === 1, "1").when(col("n") <= 8, "2-8")
        .when(col("n") <= 32, "9-32").when(col("n") <= cap, s"33-$cap")
        .otherwise(s">$cap (hot)").as("bin"), col("n"))
      .groupBy("bin")
      .agg(count(lit(1)).as("buckets"), sum(col("n")).as("rows"),
        sum(col("n") * (col("n") - 1) / 2).as("pairEmits"))
      .orderBy("bin").collect()
      .foreach(r => println(s"[hist]   pass1 ${r.getString(0)}: " +
        s"buckets=${r.getLong(1)} rows=${r.getLong(2)} " +
        s"pairEmits=${r.getAs[Any](3)}"))
    val oldEmit = n1.filter(col("n") <= cap)
      .agg(sum(col("n") * (col("n") - 1) / 2)).head()
      .getAs[Number](0).longValue()
    // widened sub-buckets inside hot pass-1 buckets
    val hot = n1.filter(col("n") > cap).select("band", "bh")
    val sub = buckets.join(hot, Seq("band", "bh"))
      .groupBy("band", "bh", "bx").agg(count(lit(1)).as("m"))
      .localCheckpoint(true)
    val subStats = sub.agg(count(lit(1)), max(col("m")),
      sum(when(col("m") <= cap, col("m") * (col("m") - 1) / 2)
        .otherwise(0))).head()
    println(s"[hist] hot sub-buckets=${subStats.getLong(0)} " +
      s"maxSub=${subStats.getAs[Any](1)} " +
      s"subPairEmits=${subStats.getAs[Any](2)}")
    println(s"[hist] pre-distinct pair emissions: old(coolOnly)=$oldEmit " +
      s"new=${oldEmit + subStats.getAs[Number](2).longValue()}")
    spark.stop()
  }
}
