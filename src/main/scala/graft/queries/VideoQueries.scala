package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.{Avi, Ppm}

/** REAL video bytes through the multimodal tier — the third leg of the
  * brief's image/audio/video triad, built exactly like the image
  * ([[MediaQueries]]) and audio ([[AudioQueries]]) legs: each document
  * gets a deterministic uncompressed AVI (RIFF + 24-bit DIB frames)
  * whose per-frame pixels are a closed form of (doc_id, frame, x, y);
  * the queries encode it executor-side, round-trip it through the
  * hand-rolled [[Avi]] codec partition-parallel, and emit integer-exact
  * statistics, shot boundaries, or quarantine verdicts. The DuckDB
  * oracles recompute the SAME values from the closed forms directly — a
  * hash match proves the codec reproduced every pixel of every frame.
  *
  * The corpus is a two-scene video: frames before `cutOf(doc_id)`
  * render the document's own [[MediaQueries.ndPixelBase]] image, frames
  * from the cut onward render doc_id + [[SceneDelta]]'s — a genuine
  * shot boundary. Within a scene, frames evolve by a sparse
  * deterministic +1 red jitter keyed by (frame, x, y, doc) — motion
  * that must NOT trip the detector. Validated numerically before
  * building: consecutive-frame dHash Hamming ≥ 22 across the cut,
  * ≤ 2 within a scene (threshold [[CutThreshold]] = 12 sits in the
  * gap with margin on both sides).
  *
  * Five rungs, mirroring the audio leg one-for-one:
  *
  *  - `video_meta`: chunk-walking header parse only (`avih` geometry,
  *    never touching `movi` sample data) — per-doc VARIABLE frame
  *    counts pin parsed values to the encode geometry per row.
  *  - `video_features`: full container decode → per-(doc, frame)
  *    integer pixel statistics.
  *  - `video_framesample`: decode → keep every 2nd frame → RE-ENCODE
  *    at half the frame rate → decode again → the same statistics
  *    (the brief's frame-sample op; the oracle samples the closed form
  *    at source frame 2i, so a match proves the whole chain).
  *  - `video_scene_cuts`: per-frame dHash ([[Ppm.dHashBandsOf]] — the
  *    image tier's hash applies unchanged to decoded frames) →
  *    consecutive-frame Hamming → frames above [[CutThreshold]] are
  *    shot boundaries. The standard pipeline primitive for keyframe
  *    selection in a video training corpus.
  *  - `video_quarantine`: planted malformed payloads (flipped magic,
  *    truncated mid-header, tail bytes dropped so declared frame sizes
  *    overrun the payload) routed to a (status, reason) column while
  *    healthy rows still yield exact statistics.
  *
  * Scale posture is the image/audio tiers': encode/decode/hash are
  * embarrassingly parallel over rows (the driver never sees a pixel),
  * per-doc work is bounded (≤ 12 frames × 16×16), and the only shuffle
  * anywhere is each query's final orderBy.
  */
object VideoQueries {

  val VidW = 16
  val VidH = 16
  /** 40 ms per frame = 25 fps; duration_ms = n_frames · 40, integer. */
  val UsPerFrame = 40000
  /** Scene 2's source id offset: far enough that the two scenes render
    * unrelated gradient-sign patterns (the ndPixelBase cross terms make
    * hashes ~independent 64-bit words for distinct source ids).
    */
  val SceneDelta = 1000000L
  /** Within-scene motion: +1 (mod 256) on red where
    * (7x + 11y + 5·frame + doc_id) ≡ 0 (mod 37) — ~7 of 256 pixels per
    * frame, the same sparse-jitter grammar as the image/audio plants.
    */
  val VidJitterMod = 37L
  /** Shot-boundary threshold on consecutive-frame dHash Hamming (of 64
    * bits): cuts measure ≥ 22, within-scene motion ≤ 2.
    */
  val CutThreshold = 12

  /** 8‥12 frames per doc — variable so meta parses can't pass on a
    * constant.
    */
  def nFramesOf(d: Long): Int = 8 + (d % 5).toInt

  /** The shot boundary: first frame of scene 2, 3‥6. Always ≥ 2 before
    * the last frame, so every doc has within-scene pairs on both sides.
    */
  def cutOf(d: Long): Int = 3 + (d % 4).toInt

  /** Per-frame pixel closed form: scene-selected
    * [[MediaQueries.ndPixelBase]] + within-scene jitter.
    */
  def framePixel(d: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = {
    val src = if (f < cutOf(d)) d else d + SceneDelta
    val (r, g, b) = MediaQueries.ndPixelBase(src, x, y)
    val rj =
      if ((7 * x + 11 * y + 5 * f + d) % VidJitterMod == 0) (r + 1) % 256
      else r
    (rj, g, b)
  }

  private def docs(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.fanout(
      Tables.load(s, dir, "documents").select(col("doc_id")).as[Long])
  }

  private def encodeDoc(d: Long): Array[Byte] =
    Avi.encode(VidW, VidH, nFramesOf(d), UsPerFrame,
      (f, x, y) => framePixel(d, f, x, y))

  // ---------------------------------------------------------------------
  // video_meta: header parse only, variable geometry per doc

  def videoMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .mapPartitions(_.map { d =>
        val h = Avi.header(encodeDoc(d))
        (d, "avi", h.width.toLong, h.height.toLong, h.nFrames.toLong,
          h.microSecPerFrame.toLong, 1000000L / h.microSecPerFrame,
          h.nFrames.toLong * h.microSecPerFrame / 1000)
      })
      .toDF("doc_id", "format", "width", "height", "n_frames",
        "us_per_frame", "fps", "duration_ms")
      .orderBy("doc_id")
  }

  val videoMetaSql: String =
    s"""SELECT doc_id, 'avi' AS format,
       |  CAST($VidW AS BIGINT) AS width, CAST($VidH AS BIGINT) AS height,
       |  CAST(8 + doc_id % 5 AS BIGINT) AS n_frames,
       |  CAST($UsPerFrame AS BIGINT) AS us_per_frame,
       |  CAST(${1000000 / UsPerFrame} AS BIGINT) AS fps,
       |  CAST((8 + doc_id % 5) * ${UsPerFrame / 1000} AS BIGINT)
       |    AS duration_ms
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // video_features: full decode → per-(doc, frame) pixel statistics

  private def frameStats(d: Long, f: Int, img: Ppm.Image)
      : (Long, Long, Long, Long, Long, Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var minL = Long.MaxValue; var maxL = Long.MinValue
    var i = 0
    while (i < img.rgb.length) {
      val r = img.rgb(i); val g = img.rgb(i + 1); val b = img.rgb(i + 2)
      sr += r; sg += g; sb += b
      val l = 299L * r + 587L * g + 114L * b
      if (l < minL) minL = l
      if (l > maxL) maxL = l
      i += 3
    }
    (d, f.toLong, img.nPixels.toLong, sr, sg, sb, minL, maxL)
  }

  def videoFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .mapPartitions(_.flatMap { d =>
        Avi.decodeFrames(encodeDoc(d)).iterator.zipWithIndex
          .map { case (img, f) => frameStats(d, f, img) }
      })
      .toDF("doc_id", "frame_no", "n_pixels", "sum_r", "sum_g", "sum_b",
        "min_lum", "max_lum")
      .orderBy("doc_id", "frame_no")
  }

  /** Oracle scaffolding: the per-(doc, frame) source-id CTE. `fMax` is
    * the inclusive frame-index bound of the series, `fBound` the per-doc
    * frame-count SQL, and `srcFrame` maps the series index to the SOURCE
    * frame number (identity for features, 2i for the sampler).
    */
  private def framesCte(fMax: Int, fBound: String,
      srcFrame: String): String =
    s"""m AS (
       |  SELECT d.doc_id, f.f AS frame_no, $srcFrame AS sf,
       |    CASE WHEN $srcFrame < 3 + d.doc_id % 4 THEN d.doc_id
       |         ELSE d.doc_id + $SceneDelta END AS src
       |  FROM (SELECT doc_id FROM documents) d,
       |    (SELECT unnest(generate_series(0, $fMax)) AS f) f
       |  WHERE f.f < $fBound)""".stripMargin

  /** Full-resolution pixel CTE over `m` (jitter keyed by the SOURCE
    * frame `m.sf`, the frame whose pixels these are).
    */
  private def pxCte: String = {
    val (r, g, b) = MediaQueries.basePixelSql("m.src", "x.x", "y.y")
    s"""px AS (
       |  SELECT m.doc_id, m.frame_no,
       |    CASE WHEN (7 * x.x + 11 * y.y + 5 * m.sf + m.doc_id)
       |              % $VidJitterMod = 0
       |         THEN ($r + 1) % 256 ELSE $r END AS r,
       |    $g AS g, $b AS b
       |  FROM m,
       |    (SELECT unnest(generate_series(0, ${VidW - 1})) AS x) x,
       |    (SELECT unnest(generate_series(0, ${VidH - 1})) AS y) y)""".stripMargin
  }

  private def frameStatsSelect: String =
    s"""SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
       |  CAST(count(*) AS BIGINT) AS n_pixels,
       |  CAST(sum(r) AS BIGINT) AS sum_r,
       |  CAST(sum(g) AS BIGINT) AS sum_g,
       |  CAST(sum(b) AS BIGINT) AS sum_b,
       |  CAST(min(299*r + 587*g + 114*b) AS BIGINT) AS min_lum,
       |  CAST(max(299*r + 587*g + 114*b) AS BIGINT) AS max_lum
       |FROM px GROUP BY doc_id, frame_no
       |ORDER BY doc_id, frame_no""".stripMargin

  val videoFeaturesSql: String =
    s"""WITH ${framesCte(11, "8 + d.doc_id % 5", "f.f")},
       |$pxCte
       |$frameStatsSelect""".stripMargin

  // ---------------------------------------------------------------------
  // video_framesample: keep every 2nd frame, re-encode at half rate,
  // decode AGAIN — the oracle samples the closed form at source frame
  // 2i, so a hash match proves decode → sample → encode → decode
  // frame-for-frame and pixel-for-pixel.

  def videoFramesample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .mapPartitions(_.flatMap { d =>
        val frames = Avi.decodeFrames(encodeDoc(d))
        val sampled = frames.indices.collect {
          case f if f % 2 == 0 => frames(f)
        }
        val re = Avi.encode(VidW, VidH, sampled.length, UsPerFrame * 2,
          (f, x, y) => (sampled(f)(x, y, 0), sampled(f)(x, y, 1),
            sampled(f)(x, y, 2)))
        val h2 = Avi.header(re)
        require(h2.microSecPerFrame == UsPerFrame * 2 &&
          h2.nFrames == sampled.length)
        Avi.decodeFrames(re).iterator.zipWithIndex
          .map { case (img, f) => frameStats(d, f, img) }
      })
      .toDF("doc_id", "frame_no", "n_pixels", "sum_r", "sum_g", "sum_b",
        "min_lum", "max_lum")
      .orderBy("doc_id", "frame_no")
  }

  val videoFramesampleSql: String =
    s"""WITH ${framesCte(5, "(8 + d.doc_id % 5 + 1) // 2", "2 * f.f")},
       |$pxCte
       |$frameStatsSelect""".stripMargin

  // ---------------------------------------------------------------------
  // video_scene_cuts: per-frame dHash → consecutive Hamming → shot
  // boundaries. The oracle rebuilds the WHOLE pipeline from the closed
  // forms — downsampled luminance grid, gradient bits, 16-bit bands,
  // lag, bit_count — so the gate pins every hash bit of every frame.

  def videoSceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .mapPartitions(_.flatMap { d =>
        val hs = Avi.decodeFrames(encodeDoc(d)).map(Ppm.dHashBandsOf)
        (1 until hs.length).iterator.flatMap { f =>
          val ham = Ppm.dHashDistance(hs(f - 1), hs(f))
          if (ham > CutThreshold) Some((d, f.toLong, ham.toLong))
          else None
        }
      })
      .toDF("doc_id", "cut_frame", "hamming")
      .orderBy("doc_id", "cut_frame")
  }

  // dHash grid source coordinates (nearest-neighbor downsample of the
  // 16×16 frame to the 9×8 luminance grid), shared with the image tier
  private val GSx = s"((x.x * $VidW) // ${Ppm.DHashW})"
  private val GSy = s"((y.y * $VidH) // ${Ppm.DHashH})"
  private val (gR, gG, gB) = MediaQueries.basePixelSql("m.src", GSx, GSy)

  val videoSceneCutsSql: String =
    s"""WITH ${framesCte(11, "8 + d.doc_id % 5", "f.f")},
       |g AS (
       |  SELECT m.doc_id, m.frame_no, x.x AS gx, y.y AS gy,
       |    299 * (CASE WHEN (7 * $GSx + 11 * $GSy + 5 * m.sf + m.doc_id)
       |                    % $VidJitterMod = 0
       |             THEN ($gR + 1) % 256 ELSE $gR END)
       |    + 587 * ($gG) + 114 * ($gB) AS lum
       |  FROM m,
       |    (SELECT unnest(generate_series(0, ${Ppm.DHashW - 1})) AS x) x,
       |    (SELECT unnest(generate_series(0, ${Ppm.DHashH - 1})) AS y) y),
       |bits AS (
       |  SELECT doc_id, frame_no, gx, gy * ${Ppm.DHashW - 1} + gx AS i,
       |    CASE WHEN lead(lum) OVER (PARTITION BY doc_id, frame_no, gy
       |                              ORDER BY gx) > lum
       |         THEN 1 ELSE 0 END AS bit
       |  FROM g),
       |bands AS (
       |  SELECT doc_id, frame_no, i // ${Ppm.DHashBandBits} AS band_no,
       |    CAST(SUM(bit * (1 << (i % ${Ppm.DHashBandBits}))) AS BIGINT)
       |      AS band_val
       |  FROM bits WHERE gx < ${Ppm.DHashW - 1}
       |  GROUP BY doc_id, frame_no, i // ${Ppm.DHashBandBits}),
       |h AS (
       |  SELECT doc_id, frame_no,
       |    MAX(CASE WHEN band_no = 0 THEN band_val END) AS b0,
       |    MAX(CASE WHEN band_no = 1 THEN band_val END) AS b1,
       |    MAX(CASE WHEN band_no = 2 THEN band_val END) AS b2,
       |    MAX(CASE WHEN band_no = 3 THEN band_val END) AS b3
       |  FROM bands GROUP BY doc_id, frame_no),
       |lagged AS (
       |  SELECT doc_id, frame_no, b0, b1, b2, b3,
       |    lag(b0) OVER w AS p0, lag(b1) OVER w AS p1,
       |    lag(b2) OVER w AS p2, lag(b3) OVER w AS p3
       |  FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY frame_no)),
       |ham AS (
       |  SELECT doc_id, frame_no,
       |    CAST(bit_count(xor(b0, p0)) + bit_count(xor(b1, p1))
       |       + bit_count(xor(b2, p2)) + bit_count(xor(b3, p3))
       |      AS BIGINT) AS hamming
       |  FROM lagged WHERE p0 IS NOT NULL)
       |SELECT doc_id, CAST(frame_no AS BIGINT) AS cut_frame, hamming
       |FROM ham WHERE hamming > $CutThreshold
       |ORDER BY doc_id, cut_frame""".stripMargin

  // ---------------------------------------------------------------------
  // video_quarantine: planted malformed payloads routed to data.
  // doc_id ≡ 4 (mod 10): magic byte flipped (bad_magic);
  // doc_id ≡ 7 (mod 10): truncated to 24 bytes, mid-hdrl (corrupt_header);
  // doc_id ≡ 9 (mod 10): last 10 bytes dropped with headers intact — the
  // movi LIST declares more frame data than is present, the classic
  // interrupted-upload shape (truncated_data).

  /** Headers end (RIFF preamble + hdrl LIST) — RIFF(12) + LIST hdr(8) +
    * hdrl body(192); anything shorter that still carries the magic is a
    * corrupt header, anything longer a data truncation.
    */
  private val HeaderBytes = 12 + 8 + 192

  def videoQuarantine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .mapPartitions(_.map { d =>
        // truncAt=24 is mid-hdrl
        QuarantineGate.row(d, encodeDoc(d), 24,
          graft.multimodal.Riff.hasMagic(_, "AVI "), HeaderBytes,
          bytes => {
            val frames = Avi.decodeFrames(bytes)
            var sr = 0L
            frames.foreach { img =>
              var i = 0
              while (i < img.rgb.length) { sr += img.rgb(i); i += 3 }
            }
            sr
          })
      })
      .toDF("doc_id", "status", "reason", "sum_r")
      .orderBy("doc_id")
  }

  val videoQuarantineSql: String =
    s"""WITH ${framesCte(11, "8 + d.doc_id % 5", "f.f")},
       |$pxCte,
       |sums AS (SELECT doc_id, CAST(sum(r) AS BIGINT) AS sum_r
       |  FROM px GROUP BY doc_id)
       |SELECT doc_id,
       |  CASE WHEN doc_id % 10 IN (4, 7, 9) THEN 'quarantined'
       |       ELSE 'ok' END AS status,
       |  CASE WHEN doc_id % 10 = 4 THEN 'bad_magic'
       |       WHEN doc_id % 10 = 7 THEN 'corrupt_header'
       |       WHEN doc_id % 10 = 9 THEN 'truncated_data' END AS reason,
       |  CASE WHEN doc_id % 10 NOT IN (4, 7, 9) THEN sum_r END AS sum_r
       |FROM sums ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "video_meta_documents" -> (videoMeta _),
    "video_features_documents" -> (videoFeatures _),
    "video_framesample_documents" -> (videoFramesample _),
    "video_scene_cuts_documents" -> (videoSceneCuts _),
    "video_quarantine_documents" -> (videoQuarantine _),
  )

  val oracles: Map[String, String] = Map(
    "video_meta_documents" -> videoMetaSql,
    "video_features_documents" -> videoFeaturesSql,
    "video_framesample_documents" -> videoFramesampleSql,
    "video_scene_cuts_documents" -> videoSceneCutsSql,
    "video_quarantine_documents" -> videoQuarantineSql,
  )
}
