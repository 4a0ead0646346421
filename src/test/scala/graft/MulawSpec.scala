package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Mulaw, Wav}
import graft.queries.{AudioQueries, MulawQueries}

class MulawSpec extends AnyFunSuite {

  test("mu-law companding matches the ITU reference points and the " +
      "closed form is an idempotent quantization") {
    // ITU G.711 landmarks: zero encodes to 0xFF, full positive scale
    // to 0x80, full negative scale to 0x00
    assert((Mulaw.encodeSample(0) & 0xff) == 0xff)
    assert((Mulaw.encodeSample(32767) & 0xff) == 0x80)
    assert((Mulaw.encodeSample(-32768) & 0xff) == 0x00)
    // quantization is idempotent: re-encoding a decoded value is a
    // fixed point (the defining property of a deterministic quantizer)
    (-32768 to 32767 by 7).foreach { v =>
      val q = Mulaw.roundTrip(v.toShort)
      assert(Mulaw.roundTrip(q) == q, s"v=$v q=$q not a fixed point")
      // error bound: half the segment step of the biased magnitude,
      // measured against the CLIPPED value (inputs beyond ±32635 pay
      // the clip loss by design)
      val clipped = math.min(math.abs(v.toInt), 32635)
      val a = clipped + 132
      val exp = (31 - Integer.numberOfLeadingZeros(a)) - 7
      assert(math.abs(clipped - math.abs(q.toInt)) <=
          (1 << (exp + 3)) / 2 + 1,
        s"v=$v q=$q err beyond half-step")
    }
  }

  test("mu-law WAVE container round-trips: format code 7, fact chunk, " +
      "odd-size pad, decode expands to the quantized samples") {
    val samples = Array.tabulate(521)(i => // odd count -> pad byte
      AudioQueries.synthSample(7L, i))
    val bytes = Mulaw.encode(8000, samples)
    val h = Mulaw.header(bytes)
    assert(h == Mulaw.Header(8000, 1, 8, 521))
    val (h2, back) = Mulaw.decode(bytes)
    assert(h2 == h)
    assert(back.length == samples.length)
    samples.indices.foreach { i =>
      assert(back(i) == Mulaw.roundTrip(samples(i)),
        s"sample $i: ${back(i)} != quantized ${samples(i)}")
    }
  }

  test("malformed mu-law payloads fail TYPED: bad magic, truncation, " +
      "declared-beyond-present data, and a PCM payload through the " +
      "mu-law parser") {
    val clean = Mulaw.encode(8000,
      Array.tabulate(40)(i => (i * 50 - 1000).toShort))
    def iae(b: Array[Byte]): String =
      intercept[IllegalArgumentException](Mulaw.decode(b)).getMessage
    val flipped = clean.clone(); flipped(0) = 0
    assert(iae(flipped).contains("not a RIFF/WAVE"))
    assert(iae(java.util.Arrays.copyOfRange(clean, 0, 20))
      .contains("truncated fmt"))
    assert(iae(java.util.Arrays.copyOfRange(clean, 0, clean.length - 5))
      .contains("truncated sample data"))
    assert(iae(Wav.encode(8000, Array[Short](1, 2, 3)))
      .contains("format code 7"))
    // and the PCM parser rejects a mu-law payload symmetrically
    assert(intercept[IllegalArgumentException](Wav.decode(clean))
      .getMessage.contains("only PCM"))
  }

  test("margin-designed fp corpus: consecutive frames never tie and " +
      "frame energies survive companding sign-exactly") {
    (0L until 50L).foreach { d =>
      val lv = Array.tabulate(Wav.FpFrames)(f => MulawQueries.fpLevel(d, f))
      lv.sliding(2).foreach { w =>
        assert(w(0) != w(1), s"doc $d: tied adjacent frames $w")
      }
      val pcm = Array.tabulate(AudioQueries.FpSamples)(i =>
        MulawQueries.fpSample(d, i))
      val dec = Mulaw.decode(Mulaw.encode(8000, pcm))._2
      assert(Wav.energyBands(pcm).sameElements(Wav.energyBands(dec)),
        s"doc $d: fingerprint not companding-stable")
    }
  }

  test("SQL compander mirror agrees with the codec on every 16-bit " +
      "input the corpus can produce") {
    // the oracle's CASE-ladder must BE the codec: spot the full corpus
    // range plus the segment boundaries
    val probes = (-1024 to 1023) ++
      Seq(-32768, -32635, -16384, -255, -124, 123, 255, 256, 32635, 32767)
    // evaluate the SQL expression via Spark SQL (same integer semantics
    // as DuckDB for these ops)
    val spark = SparkTestSession.spark
    import spark.implicits._
    val sql = Mulaw.companderSql("v")
    val out = probes.toDF("v")
      .selectExpr("v", s"$sql AS q").collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    probes.foreach { v =>
      assert(out(v) == Mulaw.roundTrip(v.toShort).toInt,
        s"v=$v sql=${out(v)} codec=${Mulaw.roundTrip(v.toShort)}")
    }
  }
}
