package graft.tools

import graft.multimodal.{Mulaw, Ppm, Wav}
import graft.queries.{AudioQueries, MulawQueries}

/** Calibration probe for the lossy μ-law tier (r12 verdict #3) — the
  * [[JpegProbe]] discipline: measure the SHIPPED corpus's companding
  * round-trip error, fingerprint stability, and planted-pair separation
  * with the registered queries' own closed forms, so the tolerance
  * bands in [[graft.queries.MulawQueries]] are set from measured
  * behavior, not guessed. Findings (this JVM, 2 000-doc sweep):
  *
  *  - worst per-sample companding error 32 (theory: ±1024 inputs stay
  *    in segment ≤ 3, step 64, half-step 32) → band 48
  *  - the RAW audio closed form is NOT fingerprint-stable under μ-law
  *    noise: worst round-trip Hamming 24 of 64, PAST the 17-bit
  *    unrelated floor — unseparable, which is why the fp legs run on
  *    the margin-designed corpus (MulawQueries.fpSample)
  *  - on the margin corpus: worst round-trip fp Hamming 0, worst
  *    planted-pair Hamming 0, minimum unrelated-pair distance 14 →
  *    bands 6 / 6 sit mid-gap
  *  - codec-vs-closed-form mismatches 0 (decode∘encode IS roundTrip)
  *  - every quarantine plant fails TYPED (magic-flip / trunc@20 /
  *    tail-10 / PCM-code-1-through-μ-law all IAE, printed per plant)
  *
  * Run: `sbt "runMain graft.tools.MulawProbe"`.
  */
object MulawProbe {

  def main(args: Array[String]): Unit = {
    val n = 2000
    var worstErr = 0L
    var exactMiss = 0L
    var worstFpRound = 0
    var worstPair = 0
    var minUnrel = Int.MaxValue
    val fpLen = AudioQueries.FpSamples
    def rt(pcm: Array[Short]): Array[Short] =
      Mulaw.decode(Mulaw.encode(AudioQueries.SampleRate, pcm))._2
    (0 until n).foreach { di =>
      val d = di.toLong
      val orig = Array.tabulate(AudioQueries.nSamplesOf(d))(i =>
        AudioQueries.synthSample(d, i))
      val dec = rt(orig)
      var i = 0
      while (i < orig.length) {
        if (dec(i) != Mulaw.roundTrip(orig(i))) exactMiss += 1
        val e = math.abs(orig(i) - dec(i)).toLong
        if (e > worstErr) worstErr = e
        i += 1
      }
      // fingerprint legs run on the MARGIN-designed lossy fp corpus
      // (MulawQueries.fpSample — the raw closed form measured unstable:
      // worst round-trip Hamming 24 > unrelated floor 17, unseparable)
      val fpPcm = Array.tabulate(fpLen)(i => MulawQueries.fpSample(d, i))
      val fpO = Wav.energyBands(fpPcm)
      val fpD = Wav.energyBands(rt(fpPcm))
      val hd = Ppm.dHashDistance(fpO, fpD)
      if (hd > worstFpRound) worstFpRound = hd
      def companded(src: Long, nd: Boolean): Array[Int] = {
        val pcm = Array.tabulate(fpLen)(i =>
          if (nd) MulawQueries.fpNdSample(src, i)
          else MulawQueries.fpSample(src, i))
        Wav.energyBands(rt(pcm))
      }
      if (AudioQueries.audPlanted(d)) {
        val pd = Ppm.dHashDistance(companded(d, nd = true),
          companded(d - AudioQueries.AudPlantDelta, nd = false))
        if (pd > worstPair) worstPair = pd
      }
      val ud = Ppm.dHashDistance(fpD, companded(d + 1, nd = false))
      if (ud < minUnrel) minUnrel = ud
    }
    println(s"worst per-sample companding err: $worstErr" +
      s" (band ${graft.queries.MulawQueries.TolSampleErr})")
    println(s"codec-vs-closed-form mismatches: $exactMiss (must be 0)")
    println(s"worst roundtrip fp hamming: $worstFpRound" +
      s" (band ${graft.queries.MulawQueries.TolFpRound})")
    println(s"worst planted-pair fp hamming: $worstPair" +
      s" (band ${graft.queries.MulawQueries.TolFpPair})")
    println(s"min unrelated-pair fp hamming: $minUnrel")
    // quarantine plants, typed-IAE audit
    val clean = Mulaw.encode(AudioQueries.SampleRate,
      Array.tabulate(AudioQueries.nSamplesOf(5L))(i =>
        AudioQueries.synthSample(5L, i)))
    println(s"clean bytes: ${clean.length} (header extent 58)")
    def tryDecode(tag: String, b: Array[Byte]): Unit =
      try { Mulaw.decode(b); println(s"$tag: DECODED (no throw)") }
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
    // a PCM (code 1) payload through the mu-law parser must be typed
    tryDecode("pcm-through-mulaw", Wav.encode(8000, Array[Short](1, 2, 3)))
  }
}
