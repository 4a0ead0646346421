package graft.multimodal

/** REAL image bytes through the multimodal tier (r10 verdict #1): a
  * pure-JVM PNG codec path via `javax.imageio` — the ubiquitous lossless
  * container an actual ingestion pipeline receives — replacing the
  * synthetic-PPM-only realism ceiling. Everything stays deterministic
  * and oracle-checkable because PNG is LOSSLESS: the encoder's exact
  * byte stream is JVM-implementation-specific (deflate settings), but
  * the DECODED pixels are bit-identical to what was encoded, so every
  * pixel-level oracle (closed-form statistics, dHash bands, banded
  * near-dup pairs) carries over unchanged from the PPM tier.
  *
  * Three first-class pieces, mirroring what a production multimodal
  * pipeline needs (reference analog: the brief's image/audio/video
  * opaque-binary columns; the decode itself was the declared stub,
  * `MultimodalOps` scaladoc):
  *
  *  - [[encode]]/[[decode]]: full round-trip through the real codec,
  *    partition-parallel at the call sites (the driver never sees a
  *    pixel).
  *  - [[ihdr]]: byte-level IHDR metadata parse (width/height/bit
  *    depth/color type) WITHOUT decoding pixel data — the cheap
  *    metadata pass a 100 TB scan runs before deciding what to decode.
  *  - Malformed-payload QUARANTINE posture: [[decode]] throws typed
  *    IllegalArgumentException on anything unreadable (bad magic,
  *    truncated stream), and the registered quarantine query routes
  *    failures to a status/reason column while the job completes —
  *    the contract `Ppm.decode`'s scaladoc promised (Ppm.scala:53-55)
  *    now gated end-to-end.
  */
object Png {

  // ImageIO's default disk cache writes temp files per decode — pure
  // memory streams are both faster and hermetic on executors
  javax.imageio.ImageIO.setUseCache(false)

  /** The 8-byte PNG signature. */
  val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def hasSignature(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(bytes, 0, 8), Signature)

  /** Encode a pixel function as a real PNG via the JVM's ImageIO writer
    * (TYPE_INT_RGB — 8-bit truecolor, the layout [[ihdr]] expects back).
    */
  def encode(width: Int, height: Int,
             pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
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
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "png", out)
    require(ok, "png: no ImageIO PNG writer available")
    out.toByteArray
  }

  /** Decode a PNG payload into the shared [[Ppm.Image]] pixel model.
    * Throws IllegalArgumentException on anything malformed — wrong
    * magic, truncated/corrupt stream, no decodable image — which the
    * quarantine callers catch per row; a decode failure must never kill
    * the scan.
    */
  def decode(bytes: Array[Byte]): Ppm.Image = {
    require(hasSignature(bytes), "png: bad magic")
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch {
        case e: java.io.IOException =>
          throw new IllegalArgumentException(
            s"png: unreadable stream (${e.getClass.getSimpleName})")
        case e: RuntimeException =>
          // ImageIO's PNG reader surfaces some corruptions as runtime
          // errors (e.g. negative array sizes from a garbled IHDR)
          throw new IllegalArgumentException(
            s"png: corrupt stream (${e.getClass.getSimpleName})")
      }
    require(img != null, "png: no decodable image in payload")
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

  /** IHDR fields parsed straight off the bytes — metadata WITHOUT pixel
    * decode. Layout (PNG spec, RFC 2083): signature(8) · chunk length(4)
    * · "IHDR"(4) · width(4, big-endian) · height(4) · bit depth(1) ·
    * color type(1). Throws on malformed/truncated headers.
    */
  final case class Ihdr(width: Int, height: Int, bitDepth: Int,
                        colorType: Int)

  def ihdr(bytes: Array[Byte]): Ihdr = {
    require(hasSignature(bytes), "png: bad magic")
    require(bytes.length >= 26, "png: truncated before IHDR")
    require(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
      bytes(15) == 'R', "png: first chunk is not IHDR")
    def be32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    val w = be32(16)
    val h = be32(20)
    require(w > 0 && h > 0, "png: bad IHDR dimensions")
    Ihdr(w, h, bytes(24) & 0xff, bytes(25) & 0xff)
  }

  /** Feature extraction behind the pluggable [[MultimodalOps
    * .MediaDecoder]] contract over REAL PNG bytes — same statistics
    * vector as [[Ppm.FeatureDecoder]], so the two codecs are
    * interchangeable behind one oracle.
    */
  class FeatureDecoder extends MultimodalOps.MediaDecoder {
    private val inner = new Ppm.FeatureDecoder
    val dim = inner.dim
    def decode(bytes: Array[Byte]): Array[Float] =
      inner.statsOf(Png.decode(bytes))
  }
}
