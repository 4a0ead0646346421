package graft.tools

import org.apache.spark.sql.functions._

/** One-off: LSH band-bucket size distribution + shingle df tail at a
  * given SF dir — decides hot-bucket-cap vs stop-shingle-cap for the
  * minhash candidate explosion.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/testdata_sf1"
    val spark = graft.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    import graft.text.Dedup
    val sh = Dedup.shingles(df, "text", "doc_id", 2).localCheckpoint(true)
    println("[probe] shingle df tail (top 10):")
    sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .orderBy(desc("df")).limit(10).collect()
      .foreach(r => println(s"[probe]   df=${r.getLong(1)} '${r.getString(0)}'"))
    val nDocs = df.count()
    val dfq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    println(s"[probe] docs=$nDocs distinct shingles=${dfq.count()}")
    Seq(64, 256, 1024).foreach { cap =>
      val over = dfq.filter(col("df") > cap)
        .agg(count(lit(1)), sum(col("df"))).head()
      println(s"[probe] df>$cap: shingles=${over.getLong(0)} occurrences=${Option(over.get(1)).getOrElse(0L)}")
    }
    val sigs = Dedup.minhashSignatures(sh, "doc_id", 128, true)
      .localCheckpoint(true)
    val r = 128 / 32
    val bandStructs = (0 until 32).map { j =>
      val slots = (j * r until (j + 1) * r).map(i => col("sig")(i))
      struct(lit(j).as("band"),
        concat_ws(":", slots.map(_.cast("string")): _*).as("bh"))
    }
    val buckets = sigs.select(col("doc_id"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val sizes = buckets.groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).localCheckpoint(true)
    println("[probe] bucket-size histogram (size-range -> buckets, pairs):")
    sizes.select(
        when(col("n") <= 2, "2")
          .when(col("n") <= 8, "3-8")
          .when(col("n") <= 32, "9-32")
          .when(col("n") <= 128, "33-128")
          .when(col("n") <= 512, "129-512")
          .otherwise(">512").as("bin"),
        col("n"))
      .groupBy("bin")
      .agg(count(lit(1)).as("buckets"),
        sum(col("n") * (col("n") - 1) / 2).as("pairs"))
      .orderBy("bin").collect()
      .foreach(r => println(s"[probe]   ${r.getString(0)}: buckets=${r.getLong(1)} pairs=${r.getAs[Any](2)}"))
    spark.stop()
  }
}
