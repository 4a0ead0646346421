package graft.tools

import org.apache.spark.sql.functions._

/** One-off diagnostic for the prod ANN banding at sf1: bucket-size
  * distribution per band, where the planted cl_norm members land, and
  * whether their buckets survive the cap.
  */
object BucketDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("16", "16")
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.{SimQueries, TextQueries}
    val emb = spark.read.parquet(
      "/root/repo/testdata_sf1_planted/embeddings.parquet")
    val planes = graft.sim.Similarity.lshPlanes(TextQueries.AnnProdBands,
      TextQueries.AnnProdPlanesPerBand, SimQueries.Dim,
      TextQueries.AnnSeed)
    val b = TextQueries.AnnProdBands
    val r = TextQueries.AnnProdPlanesPerBand
    val keyed = emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("id"), explode(array((0 until b).map { bb =>
        struct(lit(bb).as("band"),
          graft.sim.Similarity.intBucketExpr(col("v"),
            planes.slice(bb * r, (bb + 1) * r)).as("bucket"))
      }: _*)).as("x"))
      .select(col("id"), col("x.band").as("band"),
        col("x.bucket").as("bucket"))
    println("== bucket size distribution (top 10 per count) ==")
    keyed.groupBy("band", "bucket").count()
      .orderBy(desc("count")).show(10, false)
    println("== distinct buckets per band ==")
    keyed.groupBy("band").agg(countDistinct("bucket")).show(8, false)
    println("== cl_norm members' buckets ==")
    keyed.filter(col("id") >= GenPlant.idOf(3, 0) &&
        col("id") < GenPlant.idOf(3, 16))
      .groupBy("band", "bucket").count().orderBy("band").show(40, false)
    val cap = TextQueries.annProdCap(emb.count())
    println(s"== adaptive cap: $cap ==")
    val sizes = keyed.groupBy("band", "bucket").count()
    val clBuckets = keyed.filter(col("id") >= GenPlant.idOf(3, 0) &&
        col("id") < GenPlant.idOf(3, 16))
      .select("band", "bucket").distinct()
    println("== sizes of buckets containing cl_norm members ==")
    sizes.join(clBuckets, Seq("band", "bucket")).orderBy("band")
      .show(40, false)
    spark.stop()
  }
}
