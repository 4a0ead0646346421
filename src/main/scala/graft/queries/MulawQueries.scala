package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.{Mulaw, Wav}

/** LOSSY audio tier — G.711 μ-law companding over the WAV corpus (r12
  * verdict #3), the audio analog of the JPEG tier with one crucial
  * difference in oracle posture: μ-law loss is a DETERMINISTIC
  * per-sample quantization with an integer closed form, so the feature
  * and quarantine legs keep FULL hash oracles (the companding arithmetic
  * mirrors into DuckDB SQL bit ops — [[Mulaw.companderSql]]), and only
  * the fingerprint-stability legs use the JPEG-style calibrated
  * tolerance bands.
  *
  * Three rungs:
  *
  *  - `audio_mulaw_features`: encode the synthetic PCM corpus to μ-law
  *    WAVE (format code 7), decode/expand, emit the integer-exact
  *    sample statistics — the oracle recomputes them from
  *    compander(closed form) directly, so a hash match proves the codec
  *    is bit-for-bit the ITU algorithm end to end, container included.
  *  - `audio_mulaw_tolerance_check`: expected-empty violation gate
  *    (the JPEG pattern): codec-vs-closed-form exactness per sample,
  *    a calibrated sample-error band, fingerprint stability across the
  *    companding round trip, planted near-dup separation in the
  *    COMPANDED domain, with vacuous-truth guards. Calibration
  *    ([[graft.tools.MulawProbe]], 2 000-doc sweep, recorded in the
  *    band constants' scaladoc).
  *  - `audio_quarantine_mulaw`: the shared planted-corruption taxonomy
  *    (magic flip / mid-fmt truncation / data declared beyond payload)
  *    over the μ-law container; healthy rows emit the EXACT expanded
  *    sum — a full hash oracle through the lossy codec.
  *
  * 100 TB posture is the audio tier's: one scan, encode/decode/
  * fingerprint embarrassingly parallel per row inside mapPartitions,
  * violation legs are bounded filters over one localCheckpointed pass.
  */
object MulawQueries {

  /** Calibrated tolerance bands ([[graft.tools.MulawProbe]], 2 000-doc
    * sweep): worst per-sample companding error 32 (theory half-step 32
    * for segment-3 inputs) → band 48; on the margin-designed fp corpus
    * worst round-trip and planted-pair Hamming both 0 against a minimum
    * unrelated-pair distance of 14 → bands 6 sit mid-gap — the JPEG
    * tier's calibration discipline.
    */
  val TolSampleErr = 48L
  val TolFpRound = 6
  val TolFpPair = 6

  // ---------------------------------------------------------------------
  // Fingerprint corpus DESIGNED for companding robustness — the JPEG
  // tier's discipline transplanted to audio. The raw audio closed form
  // is NOT fingerprint-stable under μ-law noise (probe: adjacent frame
  // energies land arbitrarily close, and ±32-per-sample quantization
  // flipped up to 24 of 64 delta-sign bits — PAST the 17-bit unrelated
  // floor, so no band could separate). The lossy fp corpus instead
  // fixes each frame to a CONSTANT amplitude 56·k with k a per-block
  // permutation of {2,4,…,18}: adjacent frames inside a block carry
  // DISTINCT permutation values (≥ 2 levels apart → frame energies
  // ≥ 896 apart), block boundaries are de-tied by a conditional swap,
  // and companding moves a frame energy by ≤ 8·32 = 256 ≪ 896 — every
  // delta sign has guaranteed margin, exactly the ≥26-gray argument of
  // the JPEG corpus.

  /** Per-(doc, block) permutation of 0..8 — seeded Fisher–Yates over an
    * LCG stream, the [[JpegQueries.perm]] construction.
    */
  private[graft] def perm9(d: Long, b: Int): Array[Int] = {
    val p = Array.tabulate(9)(identity)
    var s = d * 16 + b + 0x9e3779b9L
    var i = 8
    while (i > 0) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val j = ((s >>> 33) % (i + 1)).toInt
      val t = p(i); p(i) = p(j); p(j) = t
      i -= 1
    }
    p
  }

  /** Amplitude level index (0..8) of frame f: the block permutation,
    * with the block's first two entries swapped when the previous
    * block ends on the same value — consecutive frames NEVER tie.
    */
  private[graft] def fpLevel(d: Long, f: Int): Int = {
    val b = f / 9
    val j = f % 9
    val cur = perm9(d, b)
    val tied = b > 0 && cur(0) == perm9(d, b - 1)(8)
    if (tied && j == 0) cur(1)
    else if (tied && j == 1) cur(0)
    else cur(j)
  }

  /** Lossy-tier fingerprint sample: |v| = 56·(2·(level+1)) constant per
    * frame (≤ 1008, segment ≤ 3 → per-sample companding error ≤ 32),
    * sign alternating within the frame.
    */
  private[graft] def fpSample(d: Long, i: Int): Short = {
    val a = 56 * 2 * (1 + fpLevel(d, i / Wav.FpFrameLen))
    (if (i % 2 == 1) -a else a).toShort
  }

  /** The plant, the audio tier's grammar (doc ≡ 6 mod 10 renders
    * doc − 3's corpus with sparse +1 jitter): frame energy moves by at
    * most the jittered-sample count — sub-noise against the 896 margin.
    */
  private[graft] def fpNdSample(d: Long, i: Int): Short = {
    val src =
      if (AudioQueries.audPlanted(d)) d - AudioQueries.AudPlantDelta
      else d
    val v = fpSample(src, i)
    if (AudioQueries.audPlanted(d) &&
        (i + d) % AudioQueries.AudJitterMod == 0)
      (v + 1).toShort
    else v
  }

  private def docs(s: SparkSession, dir: String) = {
    import s.implicits._
    // NO fanout here (r14 A/B, tools/FanoutAb): this family's per-row
    // codec work is sub-millisecond, so the fan-out exchange costs more
    // than it buys (audio_meta 0.44 s without vs 0.68 s with).
    Tables.load(s, dir, "documents").select(col("doc_id")).as[Long]
  }

  /** The corpus PCM for doc d — the SAME closed form as the lossless
    * audio tier ([[AudioQueries.synthSample]]), so the two tiers gate
    * the same signal through both codecs.
    */
  private def pcmOf(d: Long): Array[Short] =
    Array.tabulate(AudioQueries.nSamplesOf(d))(i =>
      AudioQueries.synthSample(d, i))

  // ---------------------------------------------------------------------
  // audio_mulaw_features: full hash oracle THROUGH the lossy codec

  def mulawFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    AudioQueries.featuresOf(docs(s, dir).mapPartitions(_.map { d =>
      val bytes = Mulaw.encode(AudioQueries.SampleRate, pcmOf(d))
      val (h, samples) = Mulaw.decode(bytes)
      require(h.sampleRate == AudioQueries.SampleRate &&
        h.bitsPerSample == 8, "mulaw: header mismatch")
      AudioQueries.statsRow(d, samples)
    }))
  }

  /** The lossless tier's feature oracle with the sample expression
    * wrapped in the companding closed form — same stats, same rounding
    * discipline (rms rounded once, at the end, both sides).
    */
  val mulawFeaturesSql: String = {
    val raw = AudioQueries.rawSql("d.doc_id", "i.i")
    val v = Mulaw.companderSql(s"($raw - 1024)")
    val n = s"${AudioQueries.FpSamples} + 8 * (d.doc_id % 7)"
    s"""WITH s AS (
       |  SELECT d.doc_id, i.i AS i, $v AS v
       |  FROM (SELECT doc_id FROM documents) d,
       |    (SELECT unnest(generate_series(0,
       |       ${AudioQueries.FpSamples + 8 * 6 - 1})) AS i) i
       |  WHERE i.i < $n),
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

  // ---------------------------------------------------------------------
  // audio_mulaw_tolerance_check: expected-empty violation gate

  def mulawToleranceCheck(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val stats = docs(s, dir)
      .mapPartitions(_.map { d =>
        val orig = pcmOf(d)
        val dec = Mulaw.decode(
          Mulaw.encode(AudioQueries.SampleRate, orig))._2
        // codec-vs-closed-form: the decoded samples must equal the
        // shared roundTrip quantization EXACTLY (count of mismatches)
        var nExactMiss = 0L
        var maxErr = 0L
        var i = 0
        while (i < orig.length) {
          if (dec(i) != Mulaw.roundTrip(orig(i))) nExactMiss += 1
          val e = math.abs(orig(i) - dec(i)).toLong
          if (e > maxErr) maxErr = e
          i += 1
        }
        // fingerprint stability across the companding round trip, on
        // the margin-designed lossy fp corpus (see the corpus note in
        // the object body): fp(original PCM) vs fp(μ-law round trip)
        val fpLen = AudioQueries.FpSamples
        val fpPcm = Array.tabulate(fpLen)(i => fpSample(d, i))
        val fpOrig = Wav.energyBands(fpPcm)
        val fpDec = Wav.energyBands(Mulaw.decode(
          Mulaw.encode(AudioQueries.SampleRate, fpPcm))._2)
        val hdRound = graft.multimodal.Ppm.dHashDistance(fpOrig, fpDec)
        // planted near-dup separation in the COMPANDED domain: both
        // sides of the plant through encode+decode, the lossy tier's
        // candidate-generation posture
        val hdPair =
          if (AudioQueries.audPlanted(d)) {
            def companded(src: Long, nd: Boolean): Array[Int] = {
              val pcm = Array.tabulate(fpLen)(i =>
                if (nd) fpNdSample(src, i) else fpSample(src, i))
              Wav.energyBands(Mulaw.decode(
                Mulaw.encode(AudioQueries.SampleRate, pcm))._2)
            }
            graft.multimodal.Ppm.dHashDistance(
              companded(d, nd = true),
              companded(d - AudioQueries.AudPlantDelta, nd = false)).toLong
          } else -1L
        (d, nExactMiss, maxErr, hdRound.toLong, hdPair)
      })
      .toDF("doc_id", "n_exact_miss", "max_err", "hd_round", "hd_pair")
      .localCheckpoint(true) // one pass; reused by every violation leg
    def viol(name: String, cond: org.apache.spark.sql.Column,
        value: org.apache.spark.sql.Column, bound: Double): DataFrame =
      stats.filter(cond).select(lit(name).as("check"), col("doc_id"),
        value.cast("double").as("value"), lit(bound).as("bound"))
    val exact = viol("codec_exact", col("n_exact_miss") > 0,
      col("n_exact_miss"), 0.0)
    val sampleBand = viol("sample_err", col("max_err") > TolSampleErr,
      col("max_err"), TolSampleErr.toDouble)
    val fpRound = viol("fp_roundtrip", col("hd_round") > TolFpRound,
      col("hd_round"), TolFpRound.toDouble)
    val fpPair = viol("neardup_pair",
      col("hd_pair") >= 0 && col("hd_pair") > TolFpPair,
      col("hd_pair"), TolFpPair.toDouble)
    def vacuous(name: String, measured: DataFrame): DataFrame =
      measured.agg(count(lit(1)).as("n")).filter(col("n") === 0)
        .select(lit(name).as("check"), lit(-1L).as("doc_id"),
          col("n").cast("double").as("value"), lit(1.0).as("bound"))
    val vacDocs = vacuous("vacuous_docs", stats)
    val vacPlanted = vacuous("vacuous_planted",
      stats.filter(col("hd_pair") >= 0))
    exact.unionByName(sampleBand).unionByName(fpRound)
      .unionByName(fpPair).unionByName(vacDocs).unionByName(vacPlanted)
      .orderBy("check", "doc_id")
  }

  /** Typed zero-row oracle: expected-empty IS the contract. */
  val mulawToleranceCheckSql: String =
    """SELECT CAST(NULL AS VARCHAR) AS check,
      |  CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS value,
      |  CAST(NULL AS DOUBLE) AS bound
      |WHERE false""".stripMargin

  // ---------------------------------------------------------------------
  // audio_quarantine_mulaw: planted corruption over the μ-law container,
  // healthy rows EXACT through the lossy codec.
  // ≡4: magic flip (bad_magic); ≡7: truncated at byte 20, mid-fmt
  // (corrupt_header); ≡9: last 10 bytes dropped, header declares more
  // sample data than present (truncated_data). Header extent 58 bytes:
  // RIFF(12) + fmt(26, code-7 layout with cbSize) + fact(12) + data
  // header(8).

  def mulawQuarantine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .mapPartitions(_.map { d =>
        val clean = Mulaw.encode(AudioQueries.SampleRate, pcmOf(d))
        QuarantineGate.row(d, clean, 20,
          graft.multimodal.Riff.hasMagic(_, "WAVE"), 58, bytes => {
            val (_, samples) = Mulaw.decode(bytes)
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

  val mulawQuarantineSql: String = {
    val raw = AudioQueries.rawSql("d.doc_id", "i.i")
    val v = Mulaw.companderSql(s"($raw - 1024)")
    s"""WITH s AS (
       |  SELECT d.doc_id, abs($v) AS a
       |  FROM (SELECT doc_id FROM documents) d,
       |    (SELECT unnest(generate_series(0,
       |       ${AudioQueries.FpSamples + 8 * 6 - 1})) AS i) i
       |  WHERE i.i < ${AudioQueries.FpSamples} + 8 * (d.doc_id % 7)),
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
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "audio_mulaw_features_documents" -> (mulawFeatures _),
    "audio_mulaw_tolerance_check" -> (mulawToleranceCheck _),
    "audio_quarantine_mulaw" -> (mulawQuarantine _),
  )

  val oracles: Map[String, String] = Map(
    "audio_mulaw_features_documents" -> mulawFeaturesSql,
    "audio_mulaw_tolerance_check" -> mulawToleranceCheckSql,
    "audio_quarantine_mulaw" -> mulawQuarantineSql,
  )
}
