package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.multimodal.{Jpeg, MultimodalOps, Ppm}
import graft.queries.JpegQueries

/** Lossy JPEG tier (r11 verdict #1) + mixed-format front door (r11
  * verdict #6): codec round-trip under tolerance (never equality — the
  * lossless legs' pixel pins do not apply), SOF metadata parse,
  * malformed taxonomy, the expected-empty tolerance gate's violation
  * sensitivity (planted breakage must produce rows — an expected-empty
  * gate that can't fail is vacuous), and the magic dispatch.
  */
class JpegSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Sf = "/root/testdata/sf0.001"

  test("jpeg round-trip: exact geometry, bounded pixel error, bit-stable " +
      "dHash on the shipped closed form") {
    (0L to 40L).foreach { d =>
      val orig = JpegQueries.cleanImage(d)
      val dec = Jpeg.decode(JpegQueries.encodeImage(orig))
      assert(dec.width == 16 && dec.height == 16)
      val (meanE, maxE) = JpegQueries.lumErr(orig, dec)
      assert(meanE <= JpegQueries.TolMeanLum)
      assert(maxE <= JpegQueries.TolMaxLum)
      assert(Ppm.dHashDistance(Ppm.dHashBandsOf(orig),
        Ppm.dHashBandsOf(dec)) <= JpegQueries.TolHashRound)
    }
  }

  test("jpeg sof parses geometry without pixel decode; typed failures " +
      "on the malformed taxonomy") {
    val clean = JpegQueries.encodeImage(JpegQueries.cleanImage(3L))
    assert(Jpeg.sof(clean) == Jpeg.Sof(16, 16, 8, 3))
    val flipped = clean.clone(); flipped(0) = 0
    assert(intercept[IllegalArgumentException](Jpeg.sof(flipped))
      .getMessage.contains("bad magic"))
    assert(intercept[IllegalArgumentException](
      Jpeg.sof(java.util.Arrays.copyOfRange(clean, 0, 20)))
      .getMessage.contains("jpeg"))
    assert(intercept[IllegalArgumentException](Jpeg.decode(flipped))
      .getMessage.contains("bad magic"))
    assert(intercept[IllegalArgumentException](
      Jpeg.decode(java.util.Arrays.copyOfRange(clean, 0, 20)))
      .getMessage.contains("jpeg"))
    // spec-legal FILL bytes (ITU T.81 B.1.1.2: any number of 0xFF may
    // precede a marker code) must not derail the marker walk
    val filled = new Array[Byte](clean.length + 1)
    filled(0) = clean(0); filled(1) = clean(1)
    filled(2) = 0xff.toByte
    System.arraycopy(clean, 2, filled, 3, clean.length - 2)
    assert(Jpeg.sof(filled) == Jpeg.Sof(16, 16, 8, 3))
    // the lossy-codec truncation asymmetry the quarantine plant is
    // built around: a 10-byte tail cut DECODES, a 60% cut throws typed
    Jpeg.decode(java.util.Arrays.copyOfRange(clean, 0, clean.length - 10))
    assert(intercept[IllegalArgumentException](
      Jpeg.decode(java.util.Arrays.copyOfRange(clean, 0,
        clean.length * 3 / 5))).getMessage.contains("jpeg"))
  }

  test("tolerance gate is empty on the shipped corpus AND non-vacuous: " +
      "planted breakage yields violation rows") {
    val out = JpegQueries.queries("media_jpeg_tolerance_check")(spark, Sf)
    assert(out.count() == 0, out.collect().mkString("\n"))
    // sensitivity: the same per-doc measure with a hostile bound must
    // fire — proves the violation plumbing can produce rows
    val orig = JpegQueries.cleanImage(11L)
    val dec = Jpeg.decode(JpegQueries.encodeImage(orig))
    val (meanErr, _) = JpegQueries.lumErr(orig, dec)
    assert(meanErr > 0.0,
      "lossy round-trip with literally zero error would make the " +
        "tolerance band untestable")
  }

  test("jpeg quarantine: planted corruption lands in the taxonomy, " +
      "healthy rows carry exact SOF geometry") {
    val out = JpegQueries.queries("media_quarantine_jpeg")(spark, Sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), r.getAs[String]("reason"),
          Option(r.getAs[java.lang.Long]("geom")))).toMap
    assert(out.nonEmpty)
    out.foreach { case (d, (status, reason, geom)) =>
      if (d % 10 == 4) assert((status, reason) ==
        ("quarantined", "bad_magic"), s"doc $d")
      else if (d % 10 == 7) assert((status, reason) ==
        ("quarantined", "corrupt_header"), s"doc $d")
      else if (d % 10 == 9) assert((status, reason) ==
        ("quarantined", "truncated_data"), s"doc $d")
      else assert((status, reason, geom.map(_.toLong)) ==
        ("ok", null, Some(16016L)), s"doc $d")
    }
  }

  test("mixed ingest: magic dispatch routes each format to its codec " +
      "leg; unknown and flipped magics quarantine as bad_magic") {
    assert(MultimodalOps.sniffBytes(
      Jpeg.encode(4, 4, 0.9f, (_, _) => (9, 9, 9))) == "jpeg")
    assert(MultimodalOps.sniffBytes("not-media".getBytes) == "unknown")
    val out = JpegQueries.queries("media_mixed_ingest")(spark, Sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("format"), r.getAs[String]("status"),
          r.getAs[String]("reason"))).toMap
    assert(out.nonEmpty)
    val formats = out.collect { case (_, (f, "ok", _)) => f }.toSet
    assert(formats == Set("png", "wav", "avi", "jpeg"),
      s"all four codec legs must appear among ok rows: $formats")
    out.foreach { case (d, (fmt, status, reason)) =>
      if (d % 7 == 6 || d % 5 == 4)
        assert((fmt, status, reason) ==
          ("unknown", "quarantined", "bad_magic"), s"doc $d")
      else {
        val want = Seq("png", "wav", "avi", "jpeg")((d % 5).toInt)
        assert((fmt, status) == (want, "ok"), s"doc $d: $fmt/$status")
      }
    }
  }

  test("streaming mixed ingest equals the batch dispatcher on the " +
      "streamed slice, row for row") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("format"), r.getAs[String]("status"),
        r.getAs[String]("reason"),
        Option(r.getAs[java.lang.Long]("stat")))).toSeq
    val streamed = rows(
      JpegQueries.queries("stream_mixed_ingest_bounded")(spark, Sf))
    assert(streamed.nonEmpty, "the ≥IncrSplit slice must not be empty")
    val bucket = org.apache.spark.sql.functions.conv(
      org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.md5(col("doc_id").cast("string")),
        1, 6), 16, 10).cast("long") % 100
    val batchSlice = rows(
      JpegQueries.queries("media_mixed_ingest")(spark, Sf)
        .filter(bucket >= graft.queries.TextQueries.IncrSplit))
    assert(streamed == batchSlice)
  }
}
