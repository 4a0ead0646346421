package graft.multimodal

/** Hand-rolled binary PPM (P6) codec — a REAL pure-JVM image decode path
  * (no native codecs needed), so the multimodal pipeline can compute
  * actual pixel statistics instead of hash-derived stand-ins. P6 layout:
  * `P6 <width> <height> <maxval>` as whitespace-separated ASCII tokens
  * (with `#` comments allowed between them), one whitespace byte, then
  * `width*height*3` raw RGB samples (maxval ≤ 255 ⇒ one byte per
  * sample). Everything here is deterministic byte-in/value-out, which is
  * what makes the decoded statistics oracle-checkable.
  */
object Ppm {

  /** Decoded image: dimensions + row-major interleaved RGB samples,
    * each 0‥255.
    */
  final case class Image(width: Int, height: Int, rgb: Array[Int]) {
    def nPixels: Int = width * height
    /** Sample at (x, y): channel 0=R 1=G 2=B. */
    def apply(x: Int, y: Int, c: Int): Int = rgb((y * width + x) * 3 + c)
  }

  /** Encode a 255-maxval P6 image from a pixel function
    * `(x, y) => (r, g, b)`.
    */
  def encode(width: Int, height: Int,
             pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  def encode(img: Image): Array[Byte] =
    encode(img.width, img.height, (x, y) =>
      (img(x, y, 0), img(x, y, 1), img(x, y, 2)))

  /** Parse a P6 payload. Throws IllegalArgumentException on anything
    * malformed (wrong magic, maxval > 255, truncated pixel data) — a
    * scale pipeline wraps this in a try and routes failures to a
    * quarantine column rather than killing the job.
    */
  def decode(bytes: Array[Byte]): Image = {
    var pos = 0
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\r' || b == '\t'
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else go = false
      }
    }
    def token(): String = {
      skipWsAndComments()
      val start = pos
      while (pos < bytes.length && !isWs(bytes(pos))) pos += 1
      require(pos > start, "ppm: truncated header")
      new String(bytes, start, pos - start, "US-ASCII")
    }
    require(token() == "P6", "ppm: not a P6 payload")
    val width = token().toInt
    val height = token().toInt
    val maxval = token().toInt
    require(width > 0 && height > 0, "ppm: bad dimensions")
    require(maxval > 0 && maxval <= 255, "ppm: only 1-byte samples")
    pos += 1 // exactly ONE whitespace byte separates header from data
    // size math in Long: a hostile header like "65536 65536" must fail
    // the truncation check, not wrap Int and pass it
    val nL = width.toLong * height * 3
    require(nL <= bytes.length.toLong - pos, "ppm: truncated pixel data")
    val n = nL.toInt
    val rgb = new Array[Int](n)
    var i = 0
    while (i < n) { rgb(i) = bytes(pos + i) & 0xff; i += 1 }
    Image(width, height, rgb)
  }

  /** Real feature extraction behind the pluggable [[MultimodalOps
    * .MediaDecoder]] contract: decode the PPM and emit integer-exact
    * pixel statistics `[width, height, sumR, sumG, sumB, minLum,
    * maxLum, nPixels]` (lum = 299·r + 587·g + 114·b, the Rec.601 mix
    * kept ×1000 so it stays integral). Every value is ≤ 2²⁴ for images
    * up to 256 px/channel sums and so float-exact.
    */
  class FeatureDecoder extends MultimodalOps.MediaDecoder {
    val dim = 8
    def decode(bytes: Array[Byte]): Array[Float] =
      statsOf(Ppm.decode(bytes))
    /** The statistics vector from an already-decoded image — shared with
      * the PNG byte path ([[Png.FeatureDecoder]]): same pixels in, same
      * features out, whatever the container was.
      */
    def statsOf(img: Image): Array[Float] = {
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
      Array(img.width.toFloat, img.height.toFloat, sr.toFloat, sg.toFloat,
        sb.toFloat, minL.toFloat, maxL.toFloat, img.nPixels.toFloat)
    }
  }

  /** dHash (difference hash) — the standard perceptual near-dup
    * fingerprint for images (Krawetz's dHash: downsample to a
    * (w+1)×h luminance grid, emit one bit per horizontal gradient
    * sign). Robust to small pixel jitter and re-encoding because only
    * the SIGN of neighboring-luminance differences survives into the
    * hash. Emitted as `nBands` 16-bit band integers rather than one
    * 64-bit word: the bands are exactly what the Hamming-banded
    * candidate join keys on (pigeonhole: a pair within Hamming
    * distance < nBands agrees on at least one band), and 16-bit ints
    * sidestep 64-bit sign issues in the DuckDB oracle mirror.
    *
    * Geometry is fixed at 9×8 (64 bits, 4 bands): bit `i = y*8 + x`
    * is `lum(x+1, y) > lum(x, y)` on the nearest-neighbor downsample
    * (source pixel of grid (x, y) is (x*W/9, y*H/8)), luminance is
    * the Rec.601 integer mix 299r + 587g + 114b — every step a closed
    * form the SQL oracle reproduces bit-for-bit.
    */
  val DHashW = 9
  val DHashH = 8
  val DHashBands = 4
  val DHashBandBits = 16

  def dHashBands(bytes: Array[Byte]): Array[Int] =
    dHashBandsOf(decode(bytes))

  /** dHash over an already-decoded image — shared by the PPM and PNG
    * ([[Png]]) byte paths: the hash is a pure function of pixels, so a
    * lossless codec swap must not change a single band.
    */
  def dHashBandsOf(img: Image): Array[Int] = {
    val lum = new Array[Long](DHashW * DHashH)
    var y = 0
    while (y < DHashH) {
      var x = 0
      while (x < DHashW) {
        val sx = x * img.width / DHashW
        val sy = y * img.height / DHashH
        lum(y * DHashW + x) = 299L * img(sx, sy, 0) +
          587L * img(sx, sy, 1) + 114L * img(sx, sy, 2)
        x += 1
      }
      y += 1
    }
    val bands = new Array[Int](DHashBands)
    var i = 0
    while (i < (DHashW - 1) * DHashH) {
      val x = i % (DHashW - 1)
      val y2 = i / (DHashW - 1)
      if (lum(y2 * DHashW + x + 1) > lum(y2 * DHashW + x))
        bands(i / DHashBandBits) |= 1 << (i % DHashBandBits)
      i += 1
    }
    bands
  }

  /** Exact Hamming distance between two band-decomposed dHashes. */
  def dHashDistance(a: Array[Int], b: Array[Int]): Int = {
    var d = 0; var j = 0
    while (j < a.length) {
      d += java.lang.Integer.bitCount(a(j) ^ b(j)); j += 1
    }
    d
  }

  /** Real resize behind the pluggable [[MultimodalOps.MediaTransform]]
    * contract: nearest-neighbor to `targetW` × `targetH`, re-encoded as
    * P6. Deterministic: output pixel (x, y) samples source pixel
    * (⌊x·sw/tw⌋, ⌊y·sh/th⌋).
    */
  class Resize(targetW: Int, targetH: Int)
      extends MultimodalOps.MediaTransform {
    require(targetW > 0 && targetH > 0)
    def transform(bytes: Array[Byte]): Array[Byte] = {
      val src = Ppm.decode(bytes)
      encode(targetW, targetH, (x, y) => {
        val sx = (x.toLong * src.width / targetW).toInt
        val sy = (y.toLong * src.height / targetH).toInt
        (src(sx, sy, 0), src(sx, sy, 1), src(sx, sy, 2))
      })
    }
  }
}
