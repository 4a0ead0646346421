package graft.tools

import org.apache.spark.sql.functions._

/** One-off decomposition of the near-dup pipelines' stage costs at a
  * given SF dir — used to attribute the collapsed variant's sf1 cost
  * (counts + wall per stage, both variants side by side).
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/testdata_sf1"
    val spark = graft.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    import graft.text.Dedup

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val n = 2; val k = 128; val bands = 32; val minJ = 0.4; val xe = true
    // raw pipeline stages
    val shRaw = t("raw shingles+ckpt") {
      Dedup.shingles(df, "text", "doc_id", n).localCheckpoint(true)
    }
    println(s"[probe] raw shingle rows = ${shRaw.count()}")
    val sigRaw = t("raw signatures") {
      Dedup.minhashSignatures(shRaw, "doc_id", k, xe).localCheckpoint(true)
    }
    val candRaw = t("raw candidates+ckpt") {
      Dedup.lshCandidates(sigRaw, "doc_id", k, bands, xe)
        .localCheckpoint(true)
    }
    println(s"[probe] raw candidates = ${candRaw.count()}")
    val verRaw = t("raw verify") {
      Dedup.verifyPairs(candRaw, shRaw, "doc_id", minJ).count()
    }
    println(s"[probe] raw verified = $verRaw")

    // collapsed pipeline stages
    val classes = t("classes agg") {
      df.select(md5(Dedup.normalize(col("text"))).as("__h"), col("doc_id"))
        .groupBy(col("__h"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("__sz"))
        .localCheckpoint(true)
    }
    println(s"[probe] classes = ${classes.count()}")
    val reps = t("reps join+ckpt") {
      classes.join(df.select(col("doc_id"), col("text")), Seq("doc_id"))
        .localCheckpoint(true)
    }
    val shC = t("collapsed shingles+ckpt") {
      Dedup.shingles(reps, "text", "doc_id", n).localCheckpoint(true)
    }
    println(s"[probe] collapsed shingle rows = ${shC.count()}")
    val sigC = t("collapsed signatures") {
      Dedup.minhashSignatures(shC, "doc_id", k, xe).localCheckpoint(true)
    }
    val candC = t("collapsed candidates+ckpt") {
      Dedup.lshCandidates(sigC, "doc_id", k, bands, xe)
        .localCheckpoint(true)
    }
    println(s"[probe] collapsed candidates = ${candC.count()}")
    val verC = t("collapsed verify") {
      Dedup.verifyPairs(candC, shC, "doc_id", minJ).count()
    }
    println(s"[probe] collapsed verified = $verC")

    // full registered queries end to end for reference
    t("full neardup_minhash") {
      graft.SparkEntry.queries("neardup_minhash_documents")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("full collapsed") {
      graft.SparkEntry.queries("neardup_minhash_collapsed_documents")(
        spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
