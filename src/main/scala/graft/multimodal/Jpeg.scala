package graft.multimodal

/** LOSSY media through the multimodal tier (r11 verdict #1): a pure-JVM
  * JPEG codec path via `javax.imageio` — the format a real 100 TB image
  * corpus is overwhelmingly made of, unlike the lossless PNG/PPM legs.
  * Lossy changes the ORACLE POSTURE, not the plumbing: the decoded
  * pixels are NOT bit-equal to what was encoded (DCT quantization,
  * chroma subsampling), so the registered gates are tolerance-banded
  * expected-empty checks (the `recall_check_planted` pattern) plus
  * exact-metadata quarantine oracles (container geometry survives the
  * codec exactly even though samples don't).
  *
  * Same three pieces as [[Png]] (reference analog: the brief's
  * image/audio/video opaque-binary columns):
  *
  *  - [[encode]]/[[decode]]: full round-trip through the JVM's baseline
  *    JPEG writer at an explicit quality factor, partition-parallel at
  *    the call sites.
  *  - [[sof]]: byte-level marker-segment walk to the SOF0/SOF2 frame
  *    header (width / height / precision / components) WITHOUT pixel
  *    decode — the cheap metadata pass.
  *  - Malformed-payload QUARANTINE posture: typed
  *    IllegalArgumentException on bad magic, truncated marker walks,
  *    and corrupt entropy-coded data, routed per-row by the registered
  *    quarantine query.
  */
object Jpeg {

  javax.imageio.ImageIO.setUseCache(false)

  /** The SOI marker every JPEG stream opens with (FF D8), plus the FF
    * lead-in of the next marker — 3 sniffable bytes.
    */
  def hasSignature(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff

  /** Encode a pixel function as a baseline JPEG at the given quality
    * (0..1, ImageIO's JPEGImageWriteParam scale). Deterministic within a
    * JVM; the BYTES are implementation-specific and the decode is lossy,
    * which is exactly why the gates over this codec are tolerance-banded
    * rather than hash oracles.
    */
  def encode(width: Int, height: Int, quality: Float,
             pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    require(quality > 0f && quality <= 1f, "jpeg: quality in (0, 1]")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(
      javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null),
        param)
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  /** Decode a JPEG payload into the shared [[Ppm.Image]] pixel model.
    * Typed IllegalArgumentException on anything malformed — the
    * quarantine callers catch per row; a decode failure must never kill
    * the scan.
    */
  def decode(bytes: Array[Byte]): Ppm.Image = {
    require(hasSignature(bytes), "jpeg: bad magic")
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException(
            s"jpeg: unreadable stream (${e.getClass.getSimpleName})")
        case e: RuntimeException =>
          throw new IllegalArgumentException(
            s"jpeg: corrupt stream (${e.getClass.getSimpleName})")
      }
    require(img != null, "jpeg: no decodable image in payload")
    val w = img.getWidth
    val h = img.getHeight
    val rgb = new Array[Int](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val i = (y * w + x) * 3
        rgb(i) = (p >> 16) & 0xff
        rgb(i + 1) = (p >> 8) & 0xff
        rgb(i + 2) = p & 0xff
        x += 1
      }
      y += 1
    }
    Ppm.Image(w, h, rgb)
  }

  /** SOF frame-header fields parsed straight off the marker stream —
    * metadata WITHOUT entropy decode. JPEG layout (ITU T.81 §B): SOI,
    * then marker segments `FF <code> <len16be> <payload>`; the frame
    * header (SOF0 baseline / SOF1 extended / SOF2 progressive, codes
    * C0/C1/C2) carries precision(1) · height(2) · width(2) ·
    * nComponents(1). Entropy-coded scan data after SOS is never walked.
    * Throws on malformed/truncated marker streams.
    */
  final case class Sof(width: Int, height: Int, precision: Int,
                       nComponents: Int)

  def sof(bytes: Array[Byte]): Sof = {
    require(hasSignature(bytes), "jpeg: bad magic")
    def be16(off: Int): Int =
      ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    var pos = 2
    while (pos + 4 <= bytes.length) {
      require((bytes(pos) & 0xff) == 0xff, "jpeg: broken marker stream")
      // ITU T.81 §B.1.1.2: any number of 0xFF FILL bytes may precede a
      // marker code — a spec-legal `FF FF DB` must not be read as a
      // marker whose code is 0xFF with a garbage length
      while (pos + 4 <= bytes.length && (bytes(pos + 1) & 0xff) == 0xff)
        pos += 1
      require(pos + 4 <= bytes.length, "jpeg: truncated marker stream")
      val code = bytes(pos + 1) & 0xff
      require(code != 0xd9 && code != 0xda,
        "jpeg: no frame header before SOS/EOI")
      // ITU T.81 §B.1.1.3: TEM (0x01) and RSTm (0xD0-0xD7) are
      // STANDALONE markers with no length field — reading a 16-bit
      // length off the bytes that follow them would misparse real-world
      // streams and spuriously quarantine them (r12 advice; they never
      // appear between SOI and SOF in the closed ImageIO corpus, but the
      // mixed-format front door positions this walk for arbitrary bytes)
      if (code == 0x01 || (code >= 0xd0 && code <= 0xd7)) {
        pos += 2
      } else {
      val len = be16(pos + 2)
      require(len >= 2 && pos + 2 + len <= bytes.length,
        "jpeg: truncated marker segment")
      if (code == 0xc0 || code == 0xc1 || code == 0xc2) {
        require(len >= 8, "jpeg: truncated frame header")
        val p = pos + 4
        return Sof(be16(p + 3), be16(p + 1), bytes(p) & 0xff,
          bytes(p + 5) & 0xff)
      }
      pos += 2 + len
      }
    }
    throw new IllegalArgumentException("jpeg: truncated marker stream")
  }
}
