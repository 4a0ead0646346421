package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.{MultimodalOps, Ppm}

/** Multimodal surface. Two tiers:
  *
  *  - `media_meta_documents`: the documents' text payloads stand in for
  *    opaque media bytes, exercising the binary-column path (byte
  *    length, content hash, container sniffing).
  *  - `media_features_documents`: REAL image decode. Each document gets
  *    a deterministic 16×16 PPM image whose pixel values are a closed
  *    form of (doc_id, x, y); the query encodes it, decodes it back
  *    with the hand-rolled [[Ppm]] parser partition-parallel, and
  *    emits integer pixel statistics. The DuckDB oracle computes the
  *    SAME statistics from the closed form directly — so a hash match
  *    proves the decoder reproduced every pixel, end to end.
  */
object MediaQueries {

  private def media(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text").cast("binary").as("media"))

  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    MultimodalOps.withMediaMeta(media(s, dir), "media")
      .select(col("doc_id"), col("n_bytes"), col("sha256"), col("format"))
      .orderBy("doc_id")

  /** The oracle mirrors the PRINTABLE magics (text-derived payloads can
    * legitimately start with "P6" or "RIFF"; the png/jpeg magics are
    * invalid UTF-8 lead bytes and cannot open a parquet string), so a
    * corpus refresh cannot desynchronize the sniff from the oracle.
    */
  val mediaMetaSql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
      |  sha256(text) AS sha256,
      |  CASE WHEN text LIKE 'P6%' THEN 'ppm'
      |       WHEN text LIKE 'RIFF%' THEN 'riff'
      |       ELSE 'unknown' END AS format
      |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin

  /** Synthetic image geometry + the pixel closed form shared by the
    * Spark encode side and the DuckDB oracle.
    */
  val ImgW = 16
  val ImgH = 16

  private[queries] def synthPixel(d: Long, x: Int, y: Int)
      : (Int, Int, Int) = (
    ((31 * d + 16 * y + 7 * x) % 256).toInt,
    ((17 * d + 5 * x * y + 3) % 256).toInt,
    ((53 * d + 11 * x + 13 * y) % 256).toInt)

  /** (doc_id, P6 payload) — encoded executor-side, one image per doc. */
  private def ppmMedia(s: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    Tables.load(s, dir, "documents").filter(col("doc_id") < 50)
      .select(col("doc_id")).as[Long]
      .map(d => (d, Ppm.encode(ImgW, ImgH, (x, y) => synthPixel(d, x, y))))
  }

  /** Decoded pixel statistics via the real PPM parser behind the
    * pluggable MediaDecoder contract (partition-parallel, no driver
    * involvement). All stats are integer-exact; means re-derive from
    * the sums with the same expression tree as the oracle.
    */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    val feats = MultimodalOps
      .extractFeatures(ppmMedia(s, dir), new Ppm.FeatureDecoder)
      .toDF("doc_id", "f")
    def fl(i: Int) = element_at(col("f"), i).cast("long")
    feats.select(col("doc_id"),
        fl(1).as("width"), fl(2).as("height"), fl(8).as("n_pixels"),
        fl(3).as("sum_r"), fl(4).as("sum_g"), fl(5).as("sum_b"),
        fl(6).as("min_lum"), fl(7).as("max_lum"))
      .withColumn("mean_r",
        round(col("sum_r").cast("double") / col("n_pixels"), 4))
      .withColumn("mean_g",
        round(col("sum_g").cast("double") / col("n_pixels"), 4))
      .withColumn("mean_b",
        round(col("sum_b").cast("double") / col("n_pixels"), 4))
      .orderBy("doc_id")
  }

  /** The oracle rebuilds every pixel from the closed form (no PPM in
    * sight) and aggregates — agreement means the decoder read back
    * exactly the bytes the encoder laid out.
    */
  val mediaFeaturesSql: String =
    s"""WITH px AS (
       |  SELECT d.doc_id,
       |    (31 * d.doc_id + 16 * y.y + 7 * x.x) % 256 AS r,
       |    (17 * d.doc_id + 5 * x.x * y.y + 3) % 256 AS g,
       |    (53 * d.doc_id + 11 * x.x + 13 * y.y) % 256 AS b
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 50) d,
       |    (SELECT unnest(generate_series(0, ${ImgW - 1})) AS x) x,
       |    (SELECT unnest(generate_series(0, ${ImgH - 1})) AS y) y)
       |SELECT doc_id, CAST($ImgW AS BIGINT) AS width,
       |  CAST($ImgH AS BIGINT) AS height,
       |  CAST(count(*) AS BIGINT) AS n_pixels,
       |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
       |  CAST(sum(b) AS BIGINT) AS sum_b,
       |  CAST(min(299*r + 587*g + 114*b) AS BIGINT) AS min_lum,
       |  CAST(max(299*r + 587*g + 114*b) AS BIGINT) AS max_lum,
       |  round(CAST(sum(r) AS DOUBLE) / count(*), 4) AS mean_r,
       |  round(CAST(sum(g) AS DOUBLE) / count(*), 4) AS mean_g,
       |  round(CAST(sum(b) AS DOUBLE) / count(*), 4) AS mean_b
       |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta_documents" -> (mediaMeta _),
    "media_features_documents" -> (mediaFeatures _),
  )

  val oracles: Map[String, String] = Map(
    "media_meta_documents" -> mediaMetaSql,
    "media_features_documents" -> mediaFeaturesSql,
  )
}
