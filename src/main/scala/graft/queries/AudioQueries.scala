package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Wav

/** REAL audio bytes through the multimodal tier — the audio leg of the
  * brief's image/audio/video opaque-binary columns, built exactly like
  * the image tier ([[MediaQueries]]): each document gets a deterministic
  * PCM16 mono WAVE payload whose samples are an integer closed form of
  * (doc_id, sample index); the queries encode it executor-side,
  * round-trip it through the hand-rolled [[Wav]] codec
  * partition-parallel, and emit integer-exact sample statistics,
  * fingerprints, or quarantine verdicts. The DuckDB oracles recompute
  * the SAME values from the closed form directly — a hash match proves
  * the codec reproduced every sample end to end.
  *
  * Five rungs, mirroring the image tier one-for-one:
  *
  *  - `audio_meta`: chunk-walk header parse only (the cheap pre-decode
  *    metadata pass) — per-doc VARIABLE sample counts so the oracle pins
  *    parsed values to the encode geometry per row, not to a constant.
  *  - `audio_features`: full decode → n/sum|v|/peak/zero-crossings/rms.
  *  - `audio_downsample`: decode → 2:1 decimation → RE-ENCODE at half
  *    rate → decode again → the same statistics (the audio twin of
  *    `media_resize`: the oracle samples the closed form at 2i, so a
  *    match proves the whole transform chain sample-for-sample).
  *  - `audio_neardup`: Haitsma–Kalker-style energy-delta fingerprint →
  *    the SAME capped Hamming-banded candidate join + exact verify the
  *    image dHash rides ([[MediaQueries.neardupFromHashes]]), with
  *    PLANTED near-duplicates (sample-level +1 jitter on a source doc's
  *    waveform — bytes differ, delta signs survive).
  *  - `audio_quarantine`: planted malformed payloads (flipped magic,
  *    truncated chunk walk, header declaring more samples than present)
  *    routed to a (status, reason) column while healthy rows still
  *    yield exact statistics.
  *
  * Scale posture is the image tier's: encode/decode/fingerprint are
  * embarrassingly parallel over rows (the driver never sees a sample),
  * the near-dup candidate volume is Σ bucket² over 16-bit band buckets
  * bounded by the hot-band cap, and the only shuffles are the banded
  * join's.
  */
object AudioQueries {

  val SampleRate = 8000
  /** Fingerprint corpus length: exactly the fingerprint frame grid. */
  val FpSamples: Int = Wav.FpFrames * Wav.FpFrameLen // 520

  /** Variable meta/features length: 520 + 8·(doc_id mod 7) samples —
    * always a multiple of 8, so duration_ms = n/8 is integer-exact at
    * 8 kHz.
    */
  def nSamplesOf(d: Long): Int = FpSamples + 8 * (d % 7).toInt

  /** Waveform closed form, the audio analog of
    * [[MediaQueries.ndPixelBase]]: doc·index CROSS terms (13·d·i) plus a
    * doc-dependent QUADRATIC term (11·(d%128+3)·i²) so per-frame
    * energies are doc-specific pseudo-random walks — without the
    * quadratic term successive samples form an arithmetic progression
    * mod 2048 and unrelated docs share energy-delta signs (the same
    * degeneracy the image form's comment documents). e = d/256 mixes the
    * id bits ABOVE the modulus so docs d and d+2048k differ. Validated
    * empirically: planted pairs Hamming ≤ 2, unrelated pairs mean 32/64.
    */
  def rawSample(d: Long, i: Int): Long = {
    val e = d / 256
    (31 * d + 17 * e + (7 + d % 64) * i + 13 * d * i +
      11 * ((d % 128) + 3) * i.toLong * i + 5 * e * i.toLong * i) % 2048
  }

  /** Sample value in [-1024, 1023]. */
  def synthSample(d: Long, i: Int): Short =
    (rawSample(d, i) - 1024).toShort

  /** The same closed form as a DuckDB SQL expression over a src id
    * expression and a sample-index expression.
    */
  private[queries] def rawSql(src: String, i: String): String =
    s"((31 * $src + 17 * ($src // 256) + (7 + $src % 64) * $i" +
      s" + 13 * $src * $i + 11 * (($src % 128) + 3) * $i * $i" +
      s" + 5 * ($src // 256) * $i * $i) % 2048)"

  private def docs(s: SparkSession, dir: String) = {
    import s.implicits._
    // NO fanout here (r14 A/B, tools/FanoutAb): this family's per-row
    // codec work is sub-millisecond, so the fan-out exchange costs more
    // than it buys (audio_meta 0.44 s without vs 0.68 s with).
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
  }

  // ---------------------------------------------------------------------
  // audio_meta: header parse only, variable geometry per doc

  def audioMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .mapPartitions(_.map { d =>
        val n = nSamplesOf(d)
        val bytes = Wav.encode(SampleRate,
          Array.tabulate(n)(i => synthSample(d, i)))
        val h = Wav.header(bytes)
        (d, "wav", h.sampleRate.toLong, h.channels.toLong,
          h.bitsPerSample.toLong, h.nSamples.toLong,
          h.nSamples.toLong * 1000 / h.sampleRate)
      })
      .toDF("doc_id", "format", "sample_rate", "channels",
        "bits_per_sample", "n_samples", "duration_ms")
      .orderBy("doc_id")
  }

  val audioMetaSql: String =
    s"""SELECT doc_id, 'wav' AS format,
       |  CAST($SampleRate AS BIGINT) AS sample_rate,
       |  CAST(1 AS BIGINT) AS channels,
       |  CAST(16 AS BIGINT) AS bits_per_sample,
       |  CAST($FpSamples + 8 * (doc_id % 7) AS BIGINT) AS n_samples,
       |  CAST(($FpSamples + 8 * (doc_id % 7)) // 8 AS BIGINT)
       |    AS duration_ms
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // audio_features: full decode → integer-exact sample statistics

  /** Statistics over a decoded sample array; rms is emitted RAW (the
    * rounding happens in the DataFrame with Spark's `round`, the same
    * expression tree as the oracle's).
    */
  private[queries] def statsRow(d: Long, samples: Array[Short])
      : (Long, Long, Long, Long, Long, Double) = {
    var sumAbs = 0L; var peak = 0L; var zc = 0L; var sumSq = 0L
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toLong
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      sumSq += v * v
      if (i > 0 && ((samples(i - 1) < 0) != (v < 0))) zc += 1
      i += 1
    }
    (d, samples.length.toLong, sumAbs, peak, zc,
      math.sqrt(sumSq.toDouble / samples.length))
  }

  private[queries] def featuresOf(decoded: org.apache.spark.sql.Dataset[
      (Long, Long, Long, Long, Long, Double)]): DataFrame =
    decoded.toDF("doc_id", "n_samples", "sum_abs", "peak",
        "zero_crossings", "rms_raw")
      .withColumn("rms", round(col("rms_raw"), 4)).drop("rms_raw")
      .orderBy("doc_id")

  def audioFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    featuresOf(docs(s, dir).mapPartitions(_.map { d =>
      val bytes = Wav.encode(SampleRate,
        Array.tabulate(nSamplesOf(d))(i => synthSample(d, i)))
      statsRow(d, Wav.decode(bytes)._2)
    }))
  }

  /** Oracle statistics over a per-doc closed-form sample series; `vSel`
    * maps the series index to the sampled value expression and `nExpr`
    * bounds the series.
    */
  private def featureStatsSql(src: String, nExpr: String, idxMax: Int,
      keepEvery: Int): String = {
    val keep =
      if (keepEvery == 1) "" else s" AND i.i % $keepEvery = 0"
    s"""WITH s AS (
       |  SELECT d.doc_id, i.i AS i,
       |    ${rawSql(src, "i.i")} - 1024 AS v
       |  FROM (SELECT doc_id FROM documents) d,
       |    (SELECT unnest(generate_series(0, $idxMax)) AS i) i
       |  WHERE i.i < $nExpr$keep),
       |w AS (SELECT doc_id, v,
       |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
       |  FROM s)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
       |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
       |  CAST(max(abs(v)) AS BIGINT) AS peak,
       |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) <> (v < 0))
       |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / count(*)), 4) AS rms
       |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val audioFeaturesSql: String = featureStatsSql("d.doc_id",
    s"$FpSamples + 8 * (d.doc_id % 7)", FpSamples + 8 * 6 - 1, 1)

  // ---------------------------------------------------------------------
  // audio_downsample: 2:1 decimation, re-encoded at half rate and
  // decoded AGAIN — the oracle samples the closed form at 2i, so a hash
  // match proves decode → decimate → encode → decode sample-for-sample.

  def audioDownsample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    featuresOf(docs(s, dir).mapPartitions(_.map { d =>
      val bytes = Wav.encode(SampleRate,
        Array.tabulate(nSamplesOf(d))(i => synthSample(d, i)))
      val (_, orig) = Wav.decode(bytes)
      val half = Array.tabulate(orig.length / 2)(i => orig(2 * i))
      val re = Wav.encode(SampleRate / 2, half)
      val (h2, dec) = Wav.decode(re)
      require(h2.sampleRate == SampleRate / 2)
      statsRow(d, dec)
    }))
  }

  val audioDownsampleSql: String = featureStatsSql("d.doc_id",
    s"$FpSamples + 8 * (d.doc_id % 7)", FpSamples + 8 * 6 - 1, 2)

  // ---------------------------------------------------------------------
  // audio_neardup: energy-delta fingerprint + the shared banded join.
  // Plant rule mirrors the image tier: doc_id ≡ 6 (mod 10) renders
  // doc_id − 3's waveform with a sparse +1 jitter ((i + doc_id) ≡ 0
  // mod 41 — ~13 of 520 samples). Each jittered sample moves its
  // frame's energy by ±1, so delta signs — the fingerprint bits —
  // survive (measured: planted Hamming ≤ 2 of 64).

  val AudPlantMod = 10L
  val AudPlantRes = 6L
  val AudPlantDelta = 3L
  val AudJitterMod = 41L
  /** Pair threshold: exact Hamming ≤ 6 of 64 bits (image tier's). */
  val AudMaxHamming = 6
  /** Hot-band cap — [[MediaQueries.NdBandCap]]'s role for audio. */
  val AudBandCap = 200

  def audPlanted(d: Long): Boolean =
    d % AudPlantMod == AudPlantRes && d >= AudPlantMod

  /** Near-dup corpus sample form incl. the plant. */
  def synthNdSample(d: Long, i: Int): Short = {
    val src = if (audPlanted(d)) d - AudPlantDelta else d
    val raw = rawSample(src, i)
    val rj =
      if (audPlanted(d) && (i + d) % AudJitterMod == 0) (raw + 1) % 2048
      else raw
    (rj - 1024).toShort
  }

  /** (doc_id, fingerprint band 0..3) — encode + decode + fingerprint
    * partition-parallel.
    */
  private def fpHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .mapPartitions(_.map { d =>
        val bytes = Wav.encode(SampleRate,
          Array.tabulate(FpSamples)(i => synthNdSample(d, i)))
        val bs = Wav.energyBands(Wav.decode(bytes)._2)
        (d, bs(0), bs(1), bs(2), bs(3))
      })
      .toDF("doc_id", "b0", "b1", "b2", "b3")
  }

  def audioNeardup(s: SparkSession, dir: String): DataFrame =
    MediaQueries.neardupFromHashes(
      fpHashes(s, dir).localCheckpoint(true),
      AudBandCap, AudMaxHamming)

  /** Full-pipeline oracle: closed-form samples → frame energies →
    * delta-sign bits → 16-bit bands → the shared capped-banded tail.
    */
  val audioNeardupSql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % $AudPlantMod = $AudPlantRes
       |           AND doc_id >= $AudPlantMod
       |         THEN doc_id - $AudPlantDelta ELSE doc_id END AS src,
       |    (doc_id % $AudPlantMod = $AudPlantRes
       |       AND doc_id >= $AudPlantMod) AS planted
       |  FROM documents),
       |s AS (
       |  SELECT m.doc_id, i.i AS i,
       |    (CASE WHEN m.planted AND (i.i + m.doc_id) % $AudJitterMod = 0
       |          THEN (${rawSql("m.src", "i.i")} + 1) % 2048
       |          ELSE ${rawSql("m.src", "i.i")} END) - 1024 AS v
       |  FROM m,
       |    (SELECT unnest(generate_series(0, ${FpSamples - 1})) AS i) i),
       |e AS (
       |  SELECT doc_id, i // ${Wav.FpFrameLen} AS f, SUM(abs(v)) AS en
       |  FROM s GROUP BY doc_id, i // ${Wav.FpFrameLen}),
       |bits AS (
       |  SELECT doc_id, f AS i,
       |    CASE WHEN lead(en) OVER (PARTITION BY doc_id ORDER BY f) > en
       |         THEN 1 ELSE 0 END AS bit
       |  FROM e),
       |bands AS (
       |  SELECT doc_id, i // ${Wav.FpBandBits} AS band_no,
       |    CAST(SUM(bit * (1 << (i % ${Wav.FpBandBits}))) AS BIGINT)
       |      AS band_val
       |  FROM bits WHERE i < ${Wav.FpFrames - 1}
       |  GROUP BY doc_id, i // ${Wav.FpBandBits}),
       |""".stripMargin +
      MediaQueries.bandedTailSql(AudBandCap, AudMaxHamming)

  // ---------------------------------------------------------------------
  // audio_quarantine: planted malformed payloads routed to data.
  // doc_id ≡ 4 (mod 10): magic byte flipped (bad_magic);
  // doc_id ≡ 7 (mod 10): truncated to 20 bytes, mid-fmt (corrupt_header);
  // doc_id ≡ 9 (mod 10): last 10 bytes dropped with the header intact —
  // the header DECLARES more sample data than is present, the classic
  // interrupted-upload shape (truncated_data).

  def audioQuarantine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .mapPartitions(_.map { d =>
        val clean = Wav.encode(SampleRate,
          Array.tabulate(nSamplesOf(d))(i => synthSample(d, i)))
        // truncAt=20 is mid-fmt; 44 bytes = the canonical WAVE header
        QuarantineGate.row(d, clean, 20,
          graft.multimodal.Riff.hasMagic(_, "WAVE"), 44, bytes => {
            val (_, samples) = Wav.decode(bytes)
            var sa = 0L
            var i = 0
            while (i < samples.length) {
              sa += math.abs(samples(i).toLong); i += 1
            }
            sa
          })
      })
      .toDF("doc_id", "status", "reason", "sum_abs")
      .orderBy("doc_id")
  }

  val audioQuarantineSql: String =
    s"""WITH s AS (
       |  SELECT d.doc_id, abs(${rawSql("d.doc_id", "i.i")} - 1024) AS a
       |  FROM (SELECT doc_id FROM documents) d,
       |    (SELECT unnest(generate_series(0, ${FpSamples + 8 * 6 - 1}))
       |       AS i) i
       |  WHERE i.i < $FpSamples + 8 * (d.doc_id % 7)),
       |sums AS (SELECT doc_id, CAST(sum(a) AS BIGINT) AS sum_abs
       |  FROM s GROUP BY doc_id)
       |SELECT doc_id,
       |  CASE WHEN doc_id % 10 IN (4, 7, 9) THEN 'quarantined'
       |       ELSE 'ok' END AS status,
       |  CASE WHEN doc_id % 10 = 4 THEN 'bad_magic'
       |       WHEN doc_id % 10 = 7 THEN 'corrupt_header'
       |       WHEN doc_id % 10 = 9 THEN 'truncated_data' END AS reason,
       |  CASE WHEN doc_id % 10 NOT IN (4, 7, 9) THEN sum_abs END
       |    AS sum_abs
       |FROM sums ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "audio_meta_documents" -> (audioMeta _),
    "audio_features_documents" -> (audioFeatures _),
    "audio_downsample_documents" -> (audioDownsample _),
    "audio_neardup_documents" -> (audioNeardup _),
    "audio_quarantine_documents" -> (audioQuarantine _),
  )

  val oracles: Map[String, String] = Map(
    "audio_meta_documents" -> audioMetaSql,
    "audio_features_documents" -> audioFeaturesSql,
    "audio_downsample_documents" -> audioDownsampleSql,
    "audio_neardup_documents" -> audioNeardupSql,
    "audio_quarantine_documents" -> audioQuarantineSql,
  )
}
