package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus feature extraction shaped for
  * a 100 TB pipeline (per-partition batched decode, no driver involvement).
  *
  * Decoders plug in behind [[MediaDecoder]] / [[MediaTransform]]. A REAL
  * pure-JVM image codec exists for PPM ([[Ppm.FeatureDecoder]] /
  * [[Ppm.Resize]] — actual pixel statistics, oracle-verified); for
  * formats whose codecs are absent in this container (jpeg/png/audio)
  * the [[StubDecoder]]/[[StubResizer]] stand-ins keep the plumbing
  * testable, and swapping in a codec is a one-class change.
  */
object MultimodalOps {

  /** Magic-byte container sniffing — cheap metadata without decoding. */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hexPrefix = hex(substring(bin, 1, 4))
    when(hexPrefix.startsWith("89504E47"), "png")
      .when(hexPrefix.startsWith("5036"), "ppm") // "P6"

      .when(hexPrefix.startsWith("FFD8FF"), "jpeg")
      .when(hexPrefix.startsWith("52494646"), "riff") // wav/avi containers
      .when(hexPrefix.startsWith("00000018") ||
        hexPrefix.startsWith("00000020"), "mp4")
      .otherwise("unknown")
  }

  /** JVM-side magic dispatch over the implemented codecs — the
    * heterogeneous-ingest twin of [[sniffFormat]] (which is a column
    * expression and cannot tell WAV from AVI inside the shared RIFF
    * magic). Used by the mixed-format front door to route each payload
    * to its codec leg; anything unrecognized quarantines as bad_magic.
    */
  def sniffBytes(bytes: Array[Byte]): String =
    if (Png.hasSignature(bytes)) "png"
    else if (Jpeg.hasSignature(bytes)) "jpeg"
    else if (Riff.hasMagic(bytes, "WAVE")) "wav"
    else if (Riff.hasMagic(bytes, "AVI ")) "avi"
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6')
      "ppm"
    else "unknown"

  /** Byte size, content hash, and sniffed container format for a binary
    * media column — pure column expressions, one scan.
    */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(binCol)).cast(LongType))
      .withColumn("sha256", sha2(col(binCol), 256))
      .withColumn("format", sniffFormat(col(binCol)))

  /** Deterministic "frame sampling": slice the payload into `n` equal byte
    * ranges (stand-in for video keyframe extraction; the slicing plumbing —
    * binary substring per row, one output row per frame — is the real
    * shape).
    */
  def frameSample(df: DataFrame, binCol: String, idCol: String,
                  n: Int): DataFrame =
    df.select(col(idCol), col(binCol).as("media"),
        length(col(binCol)).as("len"))
      .filter(col("len") >= n)
      .select(col(idCol), explode(expr(
        s"""transform(sequence(0, ${n - 1}),
           |  i -> struct(i AS frame_no,
           |    substring(media, CAST(i * (len div $n) AS INT) + 1,
           |      CAST(len div $n AS INT)) AS frame))""".stripMargin))
        .as("f"))
      .select(col(idCol), col("f.frame_no").cast(LongType).as("frame_no"),
        col("f.frame"))

  /** Pluggable decoder: bytes → fixed-width feature vector. */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** STUB decoder — media codecs are absent in this container. Produces a
    * deterministic pseudo-feature vector seeded by a rolling hash of the
    * payload, so tests can assert shape, determinism and partition
    * behavior. Replace with an image/audio decoder for real features.
    */
  class StubDecoder(val dim: Int = 16) extends MediaDecoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      var h = 1125899906842597L
      bytes.foreach(b => h = 31 * h + b)
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(i) = (h % 1000L) / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Pluggable bytes → bytes media transform (resize / transcode /
    * re-encode stand-in), same swap-one-class contract as [[MediaDecoder]].
    */
  trait MediaTransform extends Serializable {
    def transform(bytes: Array[Byte]): Array[Byte]
  }

  /** STUB resizer — stride-samples the payload down to at most
    * `targetBytes` bytes (deterministic, order-preserving). The real shape
    * is the contract: binary in, smaller binary out, applied
    * partition-parallel with per-partition codec init.
    */
  class StubResizer(val targetBytes: Int) extends MediaTransform {
    require(targetBytes > 0)
    def transform(bytes: Array[Byte]): Array[Byte] = {
      if (bytes.length <= targetBytes) bytes
      else {
        val out = new Array[Byte](targetBytes)
        var i = 0
        while (i < targetBytes) {
          // spread picks across the payload: index = floor(i * len/target)
          out(i) = bytes((i.toLong * bytes.length / targetBytes).toInt)
          i += 1
        }
        out
      }
    }
  }

  /** Partition-parallel media transform: (id, bytes) → (id, bytes). */
  def transformMedia(ds: Dataset[(Long, Array[Byte])],
                     t: MediaTransform): Dataset[(Long, Array[Byte])] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec init happens here in a real implementation
      it.map { case (id, bytes) => (id, t.transform(bytes)) }
    }
  }

  /** Partition-parallel feature extraction: mapPartitions so a real decoder
    * amortizes model/codec init once per partition (the mapInPandas batch
    * shape, in Scala). Input: (id, bytes); output: (id, features).
    */
  def extractFeatures(ds: Dataset[(Long, Array[Byte])],
                      decoder: MediaDecoder)
      : Dataset[(Long, Array[Float])] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init happens here in a real implementation
      it.map { case (id, bytes) => (id, decoder.decode(bytes)) }
    }
  }
}
