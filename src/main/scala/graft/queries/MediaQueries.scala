package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.MultimodalOps

/** Multimodal plumbing surface: the documents' text payloads stand in for
  * opaque media bytes (no codecs in the container), exercising the real
  * binary-column path — byte length, content hash, container sniffing, and
  * the partition-parallel stub feature extraction.
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

  val mediaMetaSql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
      |  sha256(text) AS sha256, 'unknown' AS format
      |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin

  /** Stub feature extraction (rows-only: hash-derived features are
    * engine-specific by design — see MultimodalOps.StubDecoder). Output is
    * exploded to hash-stable scalar rows (doc_id, dim, feature) — a bare
    * array&lt;float&gt; column is not sortable/hashable by the checker.
    */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = media(s, dir).as[(Long, Array[Byte])]
    MultimodalOps.extractFeatures(ds, new MultimodalOps.StubDecoder(16))
      .toDF("doc_id", "features")
      .select(col("doc_id"), posexplode(col("features")).as(Seq("dim", "feature")))
      .select(col("doc_id"), col("dim").cast("long").as("dim"),
        col("feature").cast("double").as("feature"))
      .orderBy("doc_id", "dim")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta_documents" -> (mediaMeta _),
    "media_features_documents" -> (mediaFeatures _),
  )

  val oracles: Map[String, String] = Map(
    "media_meta_documents" -> mediaMetaSql,
  )
}
