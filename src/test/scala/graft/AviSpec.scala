package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Avi, Ppm}
import graft.queries.VideoQueries

class AviSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Sf = "/root/testdata/sf0.001"

  private def enc(d: Long): Array[Byte] =
    Avi.encode(VideoQueries.VidW, VideoQueries.VidH,
      VideoQueries.nFramesOf(d), VideoQueries.UsPerFrame,
      (f, x, y) => VideoQueries.framePixel(d, f, x, y))

  test("avi codec round-trips header and every frame pixel exactly") {
    val d = 42L
    val bytes = enc(d)
    val h = Avi.header(bytes)
    assert(h == Avi.Info(16, 16, VideoQueries.nFramesOf(d),
      VideoQueries.UsPerFrame))
    val frames = Avi.decodeFrames(bytes)
    assert(frames.length == h.nFrames)
    for (f <- frames.indices; y <- 0 until 16; x <- 0 until 16) {
      val (r, g, b) = VideoQueries.framePixel(d, f, x, y)
      assert(frames(f)(x, y, 0) == r && frames(f)(x, y, 1) == g &&
        frames(f)(x, y, 2) == b, s"frame $f pixel ($x,$y)")
    }
    // single-frame access agrees with the bulk walk
    val mid = Avi.decodeFrame(bytes, 3)
    assert(mid.rgb.sameElements(frames(3).rgb))
  }

  test("avi row padding: non-multiple-of-4 widths round-trip") {
    val bytes = Avi.encode(5, 3, 2, 1000,
      (f, x, y) => ((f * 37 + x * 11 + y * 3) % 256, x * 40, y * 70))
    val frames = Avi.decodeFrames(bytes)
    for (f <- 0 until 2; y <- 0 until 3; x <- 0 until 5)
      assert(frames(f)(x, y, 0) == (f * 37 + x * 11 + y * 3) % 256 &&
        frames(f)(x, y, 1) == x * 40 && frames(f)(x, y, 2) == y * 70)
  }

  test("avi malformed taxonomy: typed failures, never a crash") {
    val clean = enc(7L)
    def fails(b: Array[Byte], frag: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Avi.decodeFrames(b)
      }
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    val badMagic = clean.clone(); badMagic(0) = 0
    fails(badMagic, "not a RIFF/AVI")
    fails(java.util.Arrays.copyOfRange(clean, 0, 24), "truncated hdrl")
    fails(java.util.Arrays.copyOfRange(clean, 0, clean.length - 10),
      "truncated movi")
    // non-BI_RGB compression code (strf biCompression at 172 + 16)
    val comp = clean.clone(); comp(172 + 16) = 1
    fails(comp, "only BI_RGB")
    // 8-bit frames (strf biBitCount at 172 + 14)
    val bits8 = clean.clone(); bits8(172 + 14) = 8
    fails(bits8, "only 24-bit")
  }

  test("hostile chunk-size words fail typed — no spin, no untyped crash") {
    val clean = enc(7L)
    def le32set(b: Array[Byte], p: Int, v: Long): Unit = {
      b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
      b(p + 2) = ((v >> 16) & 0xff).toByte
      b(p + 3) = ((v >> 24) & 0xff).toByte
    }
    def fails(b: Array[Byte], frag: String): Unit = {
      val e = intercept[IllegalArgumentException](Avi.decodeFrames(b))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    // a size word that is negative as an Int (0xFFFFFFF8): the pre-fix
    // walks advanced by 8 + (-8) = 0 forever
    val negStrh = clean.clone(); le32set(negStrh, 104, 0xFFFFFFF8L)
    fails(negStrh, "bad chunk size")
    // a huge-but-Int-positive size that overruns the payload: the walk
    // must clamp and surface the caller's typed missing/truncated check
    val bigStrh = clean.clone(); le32set(bigStrh, 104, 0x7FFFFF00L)
    fails(bigStrh, "missing strf")
    // same two in the movi frame walk (first frame chunk header at 212+12)
    val negFrame = clean.clone(); le32set(negFrame, 212 + 12 + 4, 0xFFFFFFF8L)
    negFrame(212 + 12) = 'j'.toByte // non-frame id so the size is walked
    fails(negFrame, "bad chunk size")
    val bigFrame = clean.clone(); le32set(bigFrame, 212 + 12 + 4, 0x7FFFFF00L)
    bigFrame(212 + 12) = 'j'.toByte
    fails(bigFrame, "truncated movi")
  }

  test("scene-cut separation: cuts >> threshold >> within-scene motion") {
    for (d <- 0L until 40L) {
      val hs = Avi.decodeFrames(enc(d)).map(Ppm.dHashBandsOf)
      val cut = VideoQueries.cutOf(d)
      for (f <- 1 until hs.length) {
        val ham = Ppm.dHashDistance(hs(f - 1), hs(f))
        if (f == cut)
          assert(ham > VideoQueries.CutThreshold, s"doc $d cut $f: $ham")
        else
          assert(ham <= VideoQueries.CutThreshold,
            s"doc $d within-scene $f: $ham")
      }
    }
  }

  test("video_scene_cuts finds exactly the planted boundary per doc") {
    val rows = VideoQueries.queries("video_scene_cuts_documents")(
        spark, Sf)
      .collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.size == 500) // every doc has exactly one scene cut
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == VideoQueries.cutOf(d).toLong)
      assert(r.getLong(2) > VideoQueries.CutThreshold)
    }
    assert(byDoc.values.forall(_.length == 1))
  }

  test("video_quarantine: planted corruption lands in reasons, healthy rows decode") {
    val rows = VideoQueries.queries("video_quarantine_documents")(
        spark, Sf)
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val d = r.getLong(0)
      (d % 10) match {
        case 4 => assert(r.getString(1) == "quarantined" &&
          r.getString(2) == "bad_magic" && r.isNullAt(3))
        case 7 => assert(r.getString(1) == "quarantined" &&
          r.getString(2) == "corrupt_header")
        case 9 => assert(r.getString(1) == "quarantined" &&
          r.getString(2) == "truncated_data")
        case _ => assert(r.getString(1) == "ok" && r.isNullAt(2) &&
          !r.isNullAt(3))
      }
    }
  }

  test("video_framesample keeps even source frames at half the rate") {
    val feats = VideoQueries.queries("video_features_documents")(
        spark, Sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 10)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    val sampled = VideoQueries.queries("video_framesample_documents")(
        spark, Sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 10)
      .collect()
    sampled.foreach { r =>
      val d = r.getLong(0); val f = r.getLong(1)
      // sampled frame f carries source frame 2f's pixels exactly
      assert(r.getLong(3) == feats((d, 2 * f)))
    }
    // frame counts: ceil(nf / 2)
    val counts = sampled.groupBy(_.getLong(0)).map { case (d, rs) =>
      d -> rs.length
    }
    counts.foreach { case (d, n) =>
      assert(n == (VideoQueries.nFramesOf(d) + 1) / 2)
    }
  }
}
