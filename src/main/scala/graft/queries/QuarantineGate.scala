package graft.queries

/** Shared malformed-media quarantine scaffolding for the audio
  * ([[AudioQueries]]) and video ([[VideoQueries]]) legs: the planted
  * corruption rule (doc_id ≡ 4 mod 10 → magic byte flipped; ≡ 7 →
  * truncated mid-header; ≡ 9 → tail bytes dropped with headers intact,
  * the interrupted-upload shape), the typed-failure catch, and the
  * deterministic sniff taxonomy (bad_magic / corrupt_header /
  * truncated_data). ONE implementation, parameterized by the codec's
  * magic check, header extent, and decode-to-statistic function — so a
  * taxonomy or robustness fix cannot drift between the legs.
  */
private[queries] object QuarantineGate {

  /** One (doc_id, status, reason, stat) row. `truncAt` is the mid-header
    * truncation point for the ≡7 plant; `headerBytes` the byte extent of
    * the codec's complete header region (shorter-but-magic-bearing ⇒
    * corrupt_header, longer ⇒ truncated_data); `stat` the full decode
    * reduced to one integer — it must throw IllegalArgumentException,
    * and only that, on malformed input.
    */
  def row(d: Long, clean: Array[Byte], truncAt: Int,
      magicOk: Array[Byte] => Boolean, headerBytes: Int,
      stat: Array[Byte] => Long,
      tailKeep: Int => Int = _ - 10)
      : (Long, String, Option[String], Option[Long]) = {
    val bytes =
      if (d % 10 == 4) { val b = clean.clone(); b(0) = 0; b }
      else if (d % 10 == 7) java.util.Arrays.copyOfRange(clean, 0, truncAt)
      else if (d % 10 == 9)
        // tail cut: `len - 10` for the lossless codecs (any missing
        // sample fails their declared-size checks); a lossy codec's
        // decoder tolerates a trimmed tail (ImageIO decodes a JPEG
        // missing its last 10 bytes), so its leg cuts deeper — into the
        // entropy-coded scan — via its own tailKeep
        java.util.Arrays.copyOfRange(clean, 0, tailKeep(clean.length))
      else clean
    // per-row quarantine: decode failures become data, not job death;
    // reasons are OUR deterministic sniff taxonomy, never a JVM
    // exception message
    try (d, "ok", Option.empty[String], Some(stat(bytes)))
    catch {
      case _: IllegalArgumentException =>
        val reason =
          if (!magicOk(bytes)) "bad_magic"
          else if (bytes.length < headerBytes) "corrupt_header"
          else "truncated_data"
        (d, "quarantined", Some(reason), Option.empty[Long])
    }
  }
}
