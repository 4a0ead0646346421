package graft.multimodal

/** REAL audio bytes through the multimodal tier: a hand-rolled pure-JVM
  * RIFF/WAVE PCM codec (the Microsoft/IBM WAVE format — `RIFF` chunk
  * wrapping a `WAVE` form with `fmt ` and `data` sub-chunks, 16-bit
  * little-endian PCM samples), completing the image (PPM/PNG) tier with
  * the audio leg the brief names first-class. Everything is
  * deterministic byte-in/value-out, which is what makes the decoded
  * sample statistics and the fingerprint bands oracle-checkable.
  *
  * Mirrors the [[Png]] tier's three pieces (reference analog: the
  * brief's image/audio/video opaque-binary columns):
  *
  *  - [[encode]]/[[decode]]: full round-trip, partition-parallel at the
  *    call sites (the driver never sees a sample).
  *  - [[header]]: chunk-walking metadata parse (sample rate / channels /
  *    bit depth / sample count) WITHOUT touching sample data — the
  *    cheap pre-decode pass a 100 TB scan runs first. Walks the chunk
  *    list properly (skipping e.g. `LIST`/`INFO` metadata chunks a real
  *    recorder inserts) instead of assuming the canonical 44-byte
  *    layout.
  *  - Malformed-payload QUARANTINE posture: [[header]]/[[decode]] throw
  *    typed IllegalArgumentException on anything unreadable (bad magic,
  *    truncated chunk walk, non-PCM format code, unsupported bit depth,
  *    declared data size exceeding the bytes actually present — the
  *    classic truncated-in-flight upload), and the registered
  *    quarantine query routes failures to a status/reason column while
  *    the job completes.
  *
  * Plus the audio twin of the image dHash: [[energyBands]], a
  * Haitsma–Kalker-style acoustic fingerprint (Haitsma & Kalker, "A
  * Highly Robust Audio Fingerprinting System", ISMIR 2002) reduced to
  * its integer-exact core — frame the signal, take per-frame energies,
  * keep only the SIGN of successive energy deltas. Small sample-level
  * jitter (re-encoding noise, +-1 quantization) moves each frame energy
  * by at most the jittered-sample count, so delta signs — and hence the
  * 64-bit fingerprint — survive, exactly the robustness argument of the
  * paper's band-energy-difference bits. Emitted as 4×16-bit bands for
  * the same pigeonhole-banded Hamming join the image tier uses.
  */
object Wav {

  import Riff.{le16, le32, tag}

  /** Parsed `fmt ` + `data` metadata; nSamples is per channel. */
  final case class Header(sampleRate: Int, channels: Int,
                          bitsPerSample: Int, nSamples: Int)

  /** Encode mono 16-bit PCM samples as a canonical 44-byte-header WAVE
    * payload.
    */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0)
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM format code
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { out.putShort(samples(i)); i += 1 }
    out.array()
  }

  /** Chunk-walking header parse; never reads sample data. Throws
    * IllegalArgumentException with a stable message prefix per failure
    * class — the quarantine taxonomy keys on these, never on a JVM
    * internal message.
    */
  def header(bytes: Array[Byte]): Header = parse(bytes)._1

  /** The one chunk walk both [[header]] and [[decode]] share: returns
    * the parsed header AND the data-chunk body offset, so decode never
    * re-walks the chunk list with weaker bounds than the validated pass
    * (r11 advice — the old re-walk was safe only by call order).
    */
  private def parse(bytes: Array[Byte]): (Header, Int) = {
    require(Riff.hasMagic(bytes, "WAVE"), "wav: not a RIFF/WAVE payload")
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (rate, channels, bits)
    var data: Option[(Int, Int)] = None     // (offset, declared size)
    while (data.isEmpty && pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val size = Riff.chunkSize(bytes, pos, "wav")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16 && body + 16 <= bytes.length,
            "wav: truncated fmt chunk")
          val code = le16(bytes, body)
          require(code == 1, "wav: only PCM (format code 1) supported")
          val bits = le16(bytes, body + 14)
          require(bits == 16, "wav: only 16-bit samples supported")
          // fmt layout: code@0, channels@2, rate@4, byteRate@8,
          // blockAlign@12, bits@14
          fmt = Some((le32(bytes, body + 4).toInt, le16(bytes, body + 2),
            bits))
        case "data" =>
          data = Some((body, size))
        case _ => // LIST/INFO/fact/...: skip (word-aligned)
      }
      pos = Riff.nextChunk(pos, size, bytes.length)
    }
    val (rate, channels, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("wav: missing fmt chunk"))
    val (off, dsize) = data.getOrElse(
      throw new IllegalArgumentException("wav: missing data chunk"))
    require(rate > 0 && channels == 1, "wav: only mono supported")
    // the truncated-in-flight case: header DECLARES more than is
    // present (Long arithmetic — a near-Int.MaxValue declared size must
    // fail here, not wrap negative and pass)
    require(off.toLong + dsize <= bytes.length.toLong,
      "wav: truncated sample data")
    require(dsize % 2 == 0, "wav: odd PCM16 data size")
    (Header(rate, channels, bits, dsize / 2), off)
  }

  /** Full decode: header + the PCM16 samples. */
  def decode(bytes: Array[Byte]): (Header, Array[Short]) = {
    val (h, off) = parse(bytes)
    val samples = new Array[Short](h.nSamples)
    var i = 0
    while (i < h.nSamples) {
      samples(i) = le16(bytes, off + 2 * i).toShort
      i += 1
    }
    (h, samples)
  }

  /** Fingerprint geometry: 65 frames × 8 samples → 64 energy-delta sign
    * bits → 4×16-bit bands (shared with the image tier's banded join).
    */
  val FpFrames = 65
  val FpFrameLen = 8
  val FpBands = 4
  val FpBandBits = 16

  /** Haitsma–Kalker-style fingerprint: per-frame absolute energy, one
    * bit per successive-frame energy increase, packed band `i/16` bit
    * `i%16` (identical packing to [[Ppm.dHashBandsOf]], so the SQL
    * oracle mirrors are shaped alike). Requires exactly
    * `FpFrames * FpFrameLen` samples — fingerprint corpora are
    * fixed-length by construction.
    */
  def energyBands(samples: Array[Short]): Array[Int] = {
    require(samples.length == FpFrames * FpFrameLen,
      s"wav: fingerprint needs ${FpFrames * FpFrameLen} samples")
    val e = new Array[Long](FpFrames)
    var f = 0
    while (f < FpFrames) {
      var s = 0L
      var j = 0
      while (j < FpFrameLen) {
        s += math.abs(samples(f * FpFrameLen + j).toLong)
        j += 1
      }
      e(f) = s
      f += 1
    }
    val bands = new Array[Int](FpBands)
    var i = 0
    while (i < FpFrames - 1) {
      if (e(i + 1) > e(i)) bands(i / FpBandBits) |= 1 << (i % FpBandBits)
      i += 1
    }
    bands
  }
}
