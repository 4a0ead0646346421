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

    // documents: one dominant BOILERPLATE family at ~10% of rows — the
    // web-crawl regime the doc-family operators must survive (r8 verdict
    // #7). A deterministic md5 draw selects members; their text becomes
    // a shared ~60-word template with ONE per-doc deterministic edit
    // (bigram Jaccard vs the base ≈ 0.87 — firmly in near-dup range, so
    // the family lands in the SAME minhash band buckets and stresses
    // the hot-bucket caps), and the 1/100 core keeps the unedited
    // template byte-identical (an exact-dup heavy hitter for the
    // hash-groupBy tier and the collapse guard). The family also gets
    // one dominant source domain (mixture/rollup skew) and its shingle
    // document frequencies spike (BM25/TF-IDF skew). n_chars stays
    // consistent with the rewritten text.
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val draw = conv(substring(md5(col("doc_id").cast("string")), 1, 12),
      16, 10).cast("long")
    val words = (0 until 60).map(i => s"'bpw${i % 40}'").mkString(", ")
    val boiler = expr(
      s"""concat_ws(' ', transform(array($words), (w, i) ->
         |  CASE WHEN i = CAST(doc_id % 60 AS INT) AND doc_id % 100 != 0
         |       THEN concat('bpr', CAST(doc_id % 97 AS STRING))
         |       ELSE w END))""".stripMargin)
    val isBoiler = draw % 10 === 0
    docs
      .withColumn("text", when(isBoiler, boiler).otherwise(col("text")))
      .withColumn("source",
        when(isBoiler, lit("boilerplate.crawl")).otherwise(col("source")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val nBoiler = spark.read.parquet(s"$out/documents.parquet")
      .filter(col("source") === "boilerplate.crawl").count()
    println(s"[genskew] documents rewritten, boilerplate family: " +
      s"$nBoiler rows")

    // remaining tables: hard-link the uniform parts (no data copy)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "embeddings")
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
