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

  /** Decoded feature vectors → the stat columns, shared by the plain
    * and resized feature queries. All stats are integer-exact; means
    * re-derive from the sums with the same expression tree as the
    * oracle.
    */
  private def pixelStats(feats: DataFrame): DataFrame = {
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

  /** Decoded pixel statistics via the real PPM parser behind the
    * pluggable MediaDecoder contract (partition-parallel, no driver
    * involvement).
    */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    pixelStats(MultimodalOps
      .extractFeatures(ppmMedia(s, dir), new Ppm.FeatureDecoder)
      .toDF("doc_id", "f"))

  /** Oracle builder: rebuild every pixel of a `w`×`h` grid from the
    * closed form with source coordinates `(sx, sy)` (SQL expressions
    * over x.x / y.y) and aggregate — agreement means the decode (and,
    * for the resize variant, the resample) reproduced exactly the bytes
    * the encoder laid out.
    */
  private def pixelStatsSql(w: Int, h: Int, sx: String, sy: String) =
    s"""WITH px AS (
       |  SELECT d.doc_id,
       |    (31 * d.doc_id + 16 * ($sy) + 7 * ($sx)) % 256 AS r,
       |    (17 * d.doc_id + 5 * ($sx) * ($sy) + 3) % 256 AS g,
       |    (53 * d.doc_id + 11 * ($sx) + 13 * ($sy)) % 256 AS b
       |  FROM (SELECT doc_id FROM documents WHERE doc_id < 50) d,
       |    (SELECT unnest(generate_series(0, ${w - 1})) AS x) x,
       |    (SELECT unnest(generate_series(0, ${h - 1})) AS y) y)
       |SELECT doc_id, CAST($w AS BIGINT) AS width,
       |  CAST($h AS BIGINT) AS height,
       |  CAST(count(*) AS BIGINT) AS n_pixels,
       |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
       |  CAST(sum(b) AS BIGINT) AS sum_b,
       |  CAST(min(299*r + 587*g + 114*b) AS BIGINT) AS min_lum,
       |  CAST(max(299*r + 587*g + 114*b) AS BIGINT) AS max_lum,
       |  round(CAST(sum(r) AS DOUBLE) / count(*), 4) AS mean_r,
       |  round(CAST(sum(g) AS DOUBLE) / count(*), 4) AS mean_g,
       |  round(CAST(sum(b) AS DOUBLE) / count(*), 4) AS mean_b
       |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val mediaFeaturesSql: String = pixelStatsSql(ImgW, ImgH, "x.x", "y.y")

  /** Resize geometry: 16×16 → 8×8, so nearest-neighbor source pixel of
    * output (x, y) is exactly (2x, 2y) — SQL-expressible.
    */
  val ResizeW = 8
  val ResizeH = 8

  /** Encode → nearest-neighbor resize (MediaTransform contract) →
    * decode → statistics, all partition-parallel. The oracle samples
    * the closed form at the resampled coordinates, so a hash match
    * proves the whole transform chain byte-for-byte.
    */
  def mediaResize(s: SparkSession, dir: String): DataFrame =
    pixelStats(MultimodalOps
      .extractFeatures(
        MultimodalOps.transformMedia(ppmMedia(s, dir),
          new Ppm.Resize(ResizeW, ResizeH)),
        new Ppm.FeatureDecoder)
      .toDF("doc_id", "f"))

  val mediaResizeSql: String =
    pixelStatsSql(ResizeW, ResizeH,
      s"(x.x * $ImgW) // $ResizeW", s"(y.y * $ImgH) // $ResizeH")

  /** "Keyframe" sampling over the binary payload (text bytes stand in
    * for media): `NFrames` equal byte ranges per document, reported as
    * (length, sha256) per frame. BOTH sides restrict to pure-ASCII
    * payloads so DuckDB's character slicing and Spark's byte slicing
    * address identical offsets by construction — not by luck of the
    * current corpus.
    */
  val NFrames = 4

  def mediaFrames(s: SparkSession, dir: String): DataFrame = {
    val asciiDocs = Tables.load(s, dir, "documents")
      .filter(col("doc_id") < 50 &&
        !col("text").rlike("[^\\x00-\\x7F]"))
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    MultimodalOps.frameSample(asciiDocs, "media", "doc_id", NFrames)
      .select(col("doc_id"), col("frame_no"),
        length(col("frame")).cast("long").as("n_bytes"),
        sha2(col("frame"), 256).as("sha256"))
      .orderBy("doc_id", "frame_no")
  }

  val mediaFramesSql: String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS len
       |  FROM documents
       |  WHERE doc_id < 50 AND NOT regexp_matches(text, '[^\\x00-\\x7F]')
       |    AND length(text) >= $NFrames),
       |f AS (SELECT doc_id, i.i AS frame_no,
       |    substring(text, CAST(i.i * (len // $NFrames) AS INT) + 1,
       |      CAST(len // $NFrames AS INT)) AS frame
       |  FROM d, (SELECT unnest(generate_series(0, ${NFrames - 1})) AS i) i)
       |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
       |  CAST(length(frame) AS BIGINT) AS n_bytes, sha256(frame) AS sha256
       |FROM f ORDER BY doc_id, frame_no""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta_documents" -> (mediaMeta _),
    "media_features_documents" -> (mediaFeatures _),
    "media_resize_documents" -> (mediaResize _),
    "media_frames_documents" -> (mediaFrames _),
  )

  val oracles: Map[String, String] = Map(
    "media_meta_documents" -> mediaMetaSql,
    "media_features_documents" -> mediaFeaturesSql,
    "media_resize_documents" -> mediaResizeSql,
    "media_frames_documents" -> mediaFramesSql,
  )
}
