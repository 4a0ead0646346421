package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.multimodal.Wav
import graft.queries.AudioQueries

class WavSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Sf = "/root/testdata/sf0.001"

  test("wav codec round-trips header and samples exactly") {
    val samples = Array.tabulate(520)(i =>
      AudioQueries.synthSample(42L, i))
    val bytes = Wav.encode(8000, samples)
    val h = Wav.header(bytes)
    assert(h == Wav.Header(8000, 1, 16, 520))
    val (h2, back) = Wav.decode(bytes)
    assert(h2 == h)
    assert(back.sameElements(samples))
    // negative samples survive the 16-bit LE round trip
    assert(samples.exists(_ < 0) && back.exists(_ < 0))
  }

  test("wav header walks past an interposed LIST chunk") {
    val samples = Array.tabulate(16)(i => (i * 100 - 800).toShort)
    val canon = Wav.encode(4000, samples)
    // splice a LIST chunk (odd-sized, so padding is exercised) between
    // fmt and data — the chunk-order freedom real recorders use
    val head = java.util.Arrays.copyOfRange(canon, 0, 36)
    val tail = java.util.Arrays.copyOfRange(canon, 36, canon.length)
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes -> 1 pad byte
    val out = java.nio.ByteBuffer.allocate(
        canon.length + 8 + listBody.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(head).put("LIST".getBytes("US-ASCII"))
      .putInt(listBody.length).put(listBody).put(0.toByte).put(tail)
    val (h, back) = Wav.decode(out.array())
    assert(h.nSamples == 16 && back.sameElements(samples))
  }

  test("wav malformed taxonomy: typed failures, never a crash") {
    val clean = Wav.encode(8000,
      Array.tabulate(520)(i => AudioQueries.synthSample(7L, i)))
    def fails(b: Array[Byte], frag: String): Unit = {
      val e = intercept[IllegalArgumentException](Wav.header(b))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    val badMagic = clean.clone(); badMagic(0) = 0
    fails(badMagic, "not a RIFF/WAVE")
    fails(java.util.Arrays.copyOfRange(clean, 0, 20), "truncated fmt")
    fails(java.util.Arrays.copyOfRange(clean, 0, clean.length - 10),
      "truncated sample data")
    // non-PCM format code
    val nonPcm = clean.clone(); nonPcm(20) = 3
    fails(nonPcm, "only PCM")
    // unsupported bit depth
    val bits8 = clean.clone(); bits8(34) = 8
    fails(bits8, "only 16-bit")
    // stereo
    val stereo = clean.clone(); stereo(22) = 2
    fails(stereo, "only mono")
  }

  test("hostile data-chunk size fails typed — no Int-wrap past the " +
      "truncation check, no untyped allocation") {
    val clean = Wav.encode(8000,
      Array.tabulate(520)(i => AudioQueries.synthSample(7L, i)))
    def le32set(b: Array[Byte], p: Int, v: Long): Unit = {
      b(p) = (v & 0xff).toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
      b(p + 2) = ((v >> 16) & 0xff).toByte
      b(p + 3) = ((v >> 24) & 0xff).toByte
    }
    // data size word at 40: declare ~Int.MaxValue bytes in a 1 KB
    // payload — off + dsize wrapped negative pre-fix and passed the
    // bounds check, sending decode() into a ~2 GB allocation
    val huge = clean.clone(); le32set(huge, 40, 0x7FFFFFF0L)
    val e = intercept[IllegalArgumentException](Wav.header(huge))
    assert(e.getMessage.contains("truncated sample data"), e.getMessage)
    // a size word negative as an Int is rejected as a bad chunk size
    val neg = clean.clone(); le32set(neg, 40, 0xFFFFFFF8L)
    val e2 = intercept[IllegalArgumentException](Wav.header(neg))
    assert(e2.getMessage.contains("bad chunk size"), e2.getMessage)
  }

  test("fingerprint: planted pairs near, unrelated docs ~32/64 apart") {
    def bands(d: Long) = Wav.energyBands(
      Array.tabulate(AudioQueries.FpSamples)(i =>
        AudioQueries.synthNdSample(d, i)))
    def ham(a: Array[Int], b: Array[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    // planted: doc 16 renders doc 13's waveform jittered
    assert(ham(bands(13L), bands(16L)) <= AudioQueries.AudMaxHamming)
    assert(ham(bands(23L), bands(26L)) <= AudioQueries.AudMaxHamming)
    // unrelated pairs sit far apart
    val far = for (a <- 30L to 35L; b <- 40L to 45L)
      yield ham(bands(a), bands(b))
    assert(far.min > AudioQueries.AudMaxHamming)
    // bands are 16-bit clean for the SQL mirror
    assert(bands(99L).forall(b => b >= 0 && b < (1 << Wav.FpBandBits)))
  }

  test("audio_neardup finds every planted pair on sf0.001") {
    val found = AudioQueries.queries("audio_neardup_documents")(
        spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (10L until 500L)
      .filter(d => d % AudioQueries.AudPlantMod == AudioQueries.AudPlantRes)
      .map(d => (d - AudioQueries.AudPlantDelta, d))
    assert(planted.forall(found))
  }

  test("audio_quarantine: planted corruption lands in reasons, healthy rows decode") {
    val rows = AudioQueries.queries("audio_quarantine_documents")(
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

  test("audio_meta geometry varies per doc and downsample halves it") {
    val meta = AudioQueries.queries("audio_meta_documents")(spark, Sf)
      .filter(col("doc_id") < 14).collect()
    meta.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(5) == 520 + 8 * (d % 7))
      assert(r.getLong(6) == (520 + 8 * (d % 7)) / 8)
    }
    val down = AudioQueries.queries("audio_downsample_documents")(
        spark, Sf)
      .filter(col("doc_id") < 14).collect()
    down.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == (520 + 8 * (d % 7)) / 2)
    }
  }
}
