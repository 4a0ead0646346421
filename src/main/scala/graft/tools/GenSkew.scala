package graft.tools

import org.apache.spark.sql.functions._

/** Skewed-key variant of the sf1 scale-gate data (r5 verdict #6: the
  * GenScale corpus is uniform by construction, so the sf1 gate never
  * exercised the salted two-stage aggregation or the keyed windows
  * under a heavy hitter). Rewrites `events.user_id` with a
  * deterministic Zipf(~1) draw — `new_id = floor(U ^ u)` where `U` is
  * the uniform corpus' user count and `u` is a [0,1) hash of the event
  * id — giving P(rank ≤ r) = ln r / ln U: the hottest user owns
  * ln 2 / ln U ≈ 7% of ALL rows (≈70 k events vs 67 uniform), the top
  * 10 users ≈ 25%. Every other table is reused verbatim from the
  * uniform sf1 directory (hard-linked parquet parts), so a per-query
  * skew/uniform time ratio isolates exactly the key-distribution
  * change.
  *
  * Usage: runMain graft.tools.GenSkew [sf1Dir] [outDir]
  */
object GenSkew {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/repo/testdata_sf1"
    val out = if (args.length > 1) args(1)
      else "/root/repo/testdata_sf1_skew"
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")

    val ev = spark.read.parquet(s"$src/events.parquet")
    val nUsers = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    // u in [0,1): 48-bit md5 prefix (cross-engine reproducible — the
    // oracle-parity hash ladder), then the inverse-CDF of Zipf(1)
    val u = conv(substring(md5(col("event_id").cast("string")), 1, 12),
      16, 10).cast("double") / lit(math.pow(2, 48))
    val zipfRank = floor(pow(lit(nUsers.toDouble), u)).cast("long")
    ev.withColumn("user_id", zipfRank)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val top = spark.read.parquet(s"$out/events.parquet")
      .groupBy("user_id").count().orderBy(desc("count")).limit(3)
      .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(", ")
    println(s"[genskew] events rewritten, top user rows: $top")

    // remaining tables: hard-link the uniform parts (no data copy)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    tables.foreach { t =>
      val from = new java.io.File(s"$src/$t.parquet")
      val to = new java.io.File(s"$out/$t.parquet")
      if (to.exists()) {
        to.listFiles().foreach(_.delete()); to.delete()
      }
      to.mkdirs()
      from.listFiles().filter(_.isFile).foreach { f =>
        java.nio.file.Files.createLink(
          new java.io.File(to, f.getName).toPath, f.toPath)
      }
      println(s"[genskew] $t linked (${from.listFiles().count(_.isFile)} parts)")
    }
    spark.stop()
  }
}
