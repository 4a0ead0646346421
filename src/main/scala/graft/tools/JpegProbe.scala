package graft.tools

import graft.multimodal.{Jpeg, Ppm}
import graft.queries.JpegQueries

/** Calibration probe for the lossy JPEG tier (r11 verdict #1): measures
  * the SHIPPED closed-form corpus's ([[JpegQueries.gray]]) round-trip
  * error distribution, dHash stability, planted-pair separation, and
  * ImageIO's behavior on the quarantine plants — the numbers the
  * tolerance bands in [[JpegQueries]] are set from. Findings (this
  * JVM, 2 000-doc sweep, q = 0.9):
  *
  *  - worst mean luminance error 3.14, worst max 18 → bounds 8 / 48
  *  - round-trip and planted-pair dHash Hamming both 0; minimum
  *    UNRELATED-pair distance 17 → bound 6 sits mid-gap
  *  - ImageIO DECODES a JPEG missing its last 10 bytes, but throws
  *    (typed) from 75% truncation down → the ≡9 quarantine plant cuts
  *    to 60%, never 10 bytes
  *
  * Run: `sbt "runMain graft.tools.JpegProbe"`.
  */
object JpegProbe {
  val W = JpegQueries.ImgW
  val H = JpegQueries.ImgH
  val Q = JpegQueries.Quality

  def pix(d: Long)(x: Int, y: Int): (Int, Int, Int) = {
    val v = JpegQueries.gray(d, x, y)
    (v, v, v)
  }

  def jitterPix(src: Long, d: Long)(x: Int, y: Int)
      : (Int, Int, Int) = {
    val v = JpegQueries.gray(src, x, y)
    val vj = if ((7 * x + 11 * y + d) % 41 == 0)
      math.min(255, v + 2) else v
    (vj, vj, vj)
  }

  def img(f: (Int, Int) => (Int, Int, Int)): Ppm.Image =
    Ppm.Image(W, H, Array.tabulate(W * H * 3) { i =>
      val p = i / 3; val (r, g, b) = f(p % W, p / W)
      Seq(r, g, b)(i % 3)
    })

  def lum(im: Ppm.Image, x: Int, y: Int): Long =
    299L * im(x, y, 0) + 587L * im(x, y, 1) + 114L * im(x, y, 2)

  def main(args: Array[String]): Unit = {
    val n = 2000
    var worstMean = 0.0; var worstMax = 0
    var worstHash = 0
    var worstPair = 0; var minUnrel = Int.MaxValue
    (0 until n).foreach { di =>
      val d = di.toLong
      val orig = img(pix(d))
      val rt = Jpeg.decode(Jpeg.encode(W, H, Q, pix(d)))
      var sum = 0L; var mx = 0
      for (y <- 0 until H; x <- 0 until W) {
        val e = math.abs(lum(orig, x, y) - lum(rt, x, y)).toInt / 1000
        sum += e; if (e > mx) mx = e
      }
      val mean = sum.toDouble / (W * H)
      if (mean > worstMean) worstMean = mean
      if (mx > worstMax) worstMax = mx
      val hd = Ppm.dHashDistance(Ppm.dHashBandsOf(orig),
        Ppm.dHashBandsOf(rt))
      if (hd > worstHash) worstHash = hd
      // planted pair: src = d, jittered render, both through jpeg
      val a = Ppm.dHashBandsOf(rt)
      val b = Ppm.dHashBandsOf(Jpeg.decode(Jpeg.encode(W, H, Q,
        jitterPix(d, d + 3))))
      val pd = Ppm.dHashDistance(a, b)
      if (pd > worstPair) worstPair = pd
      // unrelated: d vs d+1
      val c = Ppm.dHashBandsOf(Jpeg.decode(Jpeg.encode(W, H, Q,
        pix(d + 1))))
      val ud = Ppm.dHashDistance(a, c)
      if (ud < minUnrel) minUnrel = ud
    }
    println(s"worst mean lum err: $worstMean" +
      s" (bound ${JpegQueries.TolMeanLum})")
    println(s"worst max  lum err: $worstMax" +
      s" (bound ${JpegQueries.TolMaxLum})")
    println(s"worst roundtrip dHash hamming: $worstHash" +
      s" (bound ${JpegQueries.TolHashRound})")
    println(s"worst planted-pair hamming: $worstPair" +
      s" (bound ${JpegQueries.TolHashPair})")
    println(s"min unrelated-pair hamming: $minUnrel")
    // quarantine plants
    val clean = Jpeg.encode(W, H, Q, pix(5L))
    println(s"clean bytes: ${clean.length}")
    def tryDecode(tag: String, b: Array[Byte]): Unit =
      try { Jpeg.decode(b); println(s"$tag: DECODED (no throw)") }
      catch {
        case e: IllegalArgumentException =>
          println(s"$tag: IAE ${e.getMessage}")
        case e: Throwable =>
          println(s"$tag: UNTYPED ${e.getClass.getName}: ${e.getMessage}")
      }
    val flipped = clean.clone(); flipped(0) = 0
    tryDecode("magic-flip", flipped)
    tryDecode("trunc@20", java.util.Arrays.copyOfRange(clean, 0, 20))
    tryDecode("tail-10", java.util.Arrays.copyOfRange(clean, 0,
      clean.length - 10))
    Seq(90, 75, 60, 50, 40, 30).foreach { pct =>
      val cut = clean.length * pct / 100
      tryDecode(s"trunc@$pct%($cut)",
        java.util.Arrays.copyOfRange(clean, 0, cut))
    }
    def trySof(tag: String, b: Array[Byte]): Unit =
      try { val s = Jpeg.sof(b); println(s"$tag: SOF $s") }
      catch {
        case e: IllegalArgumentException =>
          println(s"$tag: IAE ${e.getMessage}")
        case e: Throwable =>
          println(s"$tag: UNTYPED ${e.getClass.getName}: ${e.getMessage}")
      }
    trySof("sof-clean", clean)
    trySof("sof-flip", flipped)
    trySof("sof-trunc20", java.util.Arrays.copyOfRange(clean, 0, 20))
    trySof("sof-tail10", java.util.Arrays.copyOfRange(clean, 0,
      clean.length - 10))
  }
}
