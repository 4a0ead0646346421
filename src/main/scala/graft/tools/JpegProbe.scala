package graft.tools

import graft.multimodal.{Jpeg, Ppm}
import graft.queries.JpegQueries

/** Calibration probe for the lossy JPEG tier (r11 verdict #1): measures
  * the SHIPPED closed-form corpus's round-trip error distribution,
  * dHash stability, planted-pair separation, and ImageIO's behavior on
  * the quarantine plants — the numbers the tolerance bands in
  * [[JpegQueries]] are set from. Every render, encode, and error
  * measure is the REGISTERED query's own code (renderImage /
  * cleanImage / encodeImage / lumErr), so the calibration cannot drift
  * onto a different implementation than the gate it calibrates.
  * Findings (this JVM, 2 000-doc sweep, q = 0.9):
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

  private def roundTrip(img: Ppm.Image): Ppm.Image =
    Jpeg.decode(JpegQueries.encodeImage(img))

  def main(args: Array[String]): Unit = {
    val n = 2000
    var worstMean = 0.0; var worstMax = 0L
    var worstHash = 0
    var worstPair = 0; var minUnrel = Int.MaxValue
    (0 until n).foreach { di =>
      val d = di.toLong
      val orig = JpegQueries.cleanImage(d)
      val rt = roundTrip(orig)
      val (mean, mx) = JpegQueries.lumErr(orig, rt)
      if (mean > worstMean) worstMean = mean
      if (mx > worstMax) worstMax = mx
      val hd = Ppm.dHashDistance(Ppm.dHashBandsOf(orig),
        Ppm.dHashBandsOf(rt))
      if (hd > worstHash) worstHash = hd
      // planted pair, the SHIPPED plant grammar: doc d ≡ 3 (mod 10)
      // renders (d − 3) jittered; both sides through the codec
      if (d % JpegQueries.JpegPlantMod == JpegQueries.JpegPlantRes &&
          d >= JpegQueries.JpegPlantMod) {
        val a = roundTrip(JpegQueries.renderImage(d))
        val b = roundTrip(
          JpegQueries.cleanImage(d - JpegQueries.JpegPlantDelta))
        val pd = Ppm.dHashDistance(Ppm.dHashBandsOf(a),
          Ppm.dHashBandsOf(b))
        if (pd > worstPair) worstPair = pd
      }
      // unrelated: d vs d+1
      val c = roundTrip(JpegQueries.cleanImage(d + 1))
      val ud = Ppm.dHashDistance(Ppm.dHashBandsOf(rt),
        Ppm.dHashBandsOf(c))
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
    val clean = JpegQueries.encodeImage(JpegQueries.cleanImage(5L))
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
