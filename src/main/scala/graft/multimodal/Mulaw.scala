package graft.multimodal

/** G.711 μ-law COMPANDED audio — the lossy tier of the audio leg (r12
  * verdict #3), completing the lossy posture the JPEG tier opened for
  * images without needing native codecs: everything here is the ITU-T
  * G.711 μ-law PCM companding algorithm (8-bit logarithmic code per
  * 16-bit sample) in pure JVM, wrapped in the standard RIFF/WAVE
  * container with format code 7 (WAVE_FORMAT_MULAW — the registered
  * wave-format tag for μ-law, per the Microsoft WAVE format registry).
  *
  * The oracle posture is BETWEEN the lossless tiers and JPEG: μ-law is
  * lossy (8 bits cannot carry 16), but unlike DCT quantization the loss
  * is a DETERMINISTIC per-sample quantization with a closed form — so
  * the companded round trip ITSELF mirrors into oracle SQL
  * (segment/mantissa arithmetic over integer bit ops), and the feature
  * and quarantine legs keep FULL hash oracles while only the
  * fingerprint-stability legs need the JPEG-style calibrated tolerance
  * bands ([[graft.tools.MulawProbe]] measures; the query scaladocs
  * record the calibration).
  *
  * Algorithm (G.711 μ-law, the classic bias-and-segment form): clip to
  * 32635, add bias 132, the EXPONENT is the segment of the top set bit
  * (132..255 → 0, 256..511 → 1, … 16384..32767 → 7), the MANTISSA the
  * next 4 bits, and the code byte is the complemented
  * sign|exponent|mantissa. Decode rebuilds `((mant<<3)+132)<<exp − 132`
  * with the sign reapplied. Max quantization error for our ±1024
  * synthetic corpus (exponent ≤ 3) is 32; the tolerance legs measure it
  * rather than trust it.
  */
object Mulaw {

  private val Bias = 132
  private val Clip = 32635

  /** 16-bit PCM sample → μ-law code byte (G.711). */
  def encodeSample(s: Short): Byte = {
    val sign = if (s < 0) 0x80 else 0x00
    val abs0 = if (s < 0) -s.toInt else s.toInt // -32768 clipped below
    val a = math.min(abs0, Clip) + Bias
    var exp = 7
    while (exp > 0 && a < (1 << (exp + 7))) exp -= 1
    val mant = (a >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant) & 0xff).toByte
  }

  /** μ-law code byte → 16-bit PCM sample (G.711 expand). */
  def decodeSample(c: Byte): Short = {
    val u = ~c & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0x0f
    val mag = (((mant << 3) + Bias) << exp) - Bias
    (if ((u & 0x80) != 0) -mag else mag).toShort
  }

  /** decode(encode(s)) — the closed-form quantization the oracle SQL
    * mirrors ([[companderSql]]); defined once so the codec, the spec,
    * and the probe share it.
    */
  def roundTrip(s: Short): Short = decodeSample(encodeSample(s))

  /** The companding round trip as a DuckDB SQL expression over a 16-bit
    * sample expression `v` — integer bit ops only (no float log), so
    * the mirror is exact: clip+bias, CASE-ladder segment, mantissa,
    * rebuild, re-sign.
    */
  def companderSql(v: String): String = {
    val a = s"(least(abs($v), $Clip) + $Bias)"
    val exp = s"(CASE WHEN $a >= 16384 THEN 7 WHEN $a >= 8192 THEN 6" +
      s" WHEN $a >= 4096 THEN 5 WHEN $a >= 2048 THEN 4" +
      s" WHEN $a >= 1024 THEN 3 WHEN $a >= 512 THEN 2" +
      s" WHEN $a >= 256 THEN 1 ELSE 0 END)"
    val mant = s"(($a >> ($exp + 3)) & 15)"
    val mag = s"(((($mant << 3) + $Bias) << $exp) - $Bias)"
    s"(CASE WHEN $v < 0 THEN -$mag ELSE $mag END)"
  }

  import Riff.{le16, le32, tag}

  /** Encode mono 16-bit PCM as a μ-law WAVE payload: format code 7,
    * 8 bits per (companded) sample, one byte per sample, with the
    * `fact` chunk the non-PCM WAVE spec requires (sample count) and a
    * pad byte when the data size is odd (RIFF word alignment).
    */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0)
    val dataSize = samples.length
    val pad = dataSize & 1
    val out = java.nio.ByteBuffer.allocate(58 + dataSize + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(50 + dataSize + pad)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(7)                        // WAVE_FORMAT_MULAW
      .putShort(1)                        // mono
      .putInt(sampleRate)
      .putInt(sampleRate)                 // byte rate: 1 byte/sample
      .putShort(1)                        // block align
      .putShort(8)                        // bits per (companded) sample
      .putShort(0)                        // cbSize (non-PCM fmt ext)
    out.put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { out.put(encodeSample(samples(i))); i += 1 }
    if (pad == 1) out.put(0.toByte)
    out.array()
  }

  /** Parsed μ-law WAVE metadata; nSamples from the data chunk. */
  final case class Header(sampleRate: Int, channels: Int,
                          bitsPerSample: Int, nSamples: Int)

  /** Chunk-walking header parse (shared walk with [[decode]], the
    * [[Wav]] posture): typed IllegalArgumentException per failure class
    * — bad magic, truncated chunks, a format code that is not μ-law,
    * and the header-declares-more-than-present truncated upload.
    */
  def header(bytes: Array[Byte]): Header = parse(bytes)._1

  private def parse(bytes: Array[Byte]): (Header, Int) = {
    require(Riff.hasMagic(bytes, "WAVE"), "mulaw: not a RIFF/WAVE payload")
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (data.isEmpty && pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val size = Riff.chunkSize(bytes, pos, "mulaw")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16 && body + 16 <= bytes.length,
            "mulaw: truncated fmt chunk")
          val code = le16(bytes, body)
          require(code == 7, "mulaw: not a mu-law (format code 7) payload")
          val bits = le16(bytes, body + 14)
          require(bits == 8, "mulaw: mu-law samples are 8-bit")
          fmt = Some((le32(bytes, body + 4).toInt, le16(bytes, body + 2),
            bits))
        case "data" =>
          data = Some((body, size))
        case _ => // fact/LIST/...: skip (word-aligned)
      }
      pos = Riff.nextChunk(pos, size, bytes.length)
    }
    val (rate, channels, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("mulaw: missing fmt chunk"))
    val (off, dsize) = data.getOrElse(
      throw new IllegalArgumentException("mulaw: missing data chunk"))
    require(rate > 0 && channels == 1, "mulaw: only mono supported")
    require(off.toLong + dsize <= bytes.length.toLong,
      "mulaw: truncated sample data")
    (Header(rate, channels, bits, dsize), off)
  }

  /** Full decode: header + the EXPANDED 16-bit samples. */
  def decode(bytes: Array[Byte]): (Header, Array[Short]) = {
    val (h, off) = parse(bytes)
    val samples = new Array[Short](h.nSamples)
    var i = 0
    while (i < h.nSamples) {
      samples(i) = decodeSample(bytes(off + i))
      i += 1
    }
    (h, samples)
  }
}
