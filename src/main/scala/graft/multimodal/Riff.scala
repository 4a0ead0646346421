package graft.multimodal

/** Shared RIFF container primitives for the [[Wav]] and [[Avi]] codecs:
  * little-endian readers, fourcc tags, and — the part that must not be
  * re-derived per codec — OVERFLOW-SAFE chunk-walk arithmetic. A chunk
  * size word is attacker-controlled 32-bit data: read as a Java Int it
  * can be negative (a walk that adds it advances backwards and spins
  * forever) and added to an offset it can wrap (a bounds `require`
  * that should fail instead passes). Every arithmetic step here is done
  * in Long and clamped, so a hostile size word always surfaces as a
  * typed IllegalArgumentException from the caller's own bounds checks —
  * the quarantine contract both codecs promise.
  */
private[graft] object Riff {

  def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  def tag(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** `RIFF....<form>` preamble check (form = "WAVE", "AVI ", ...). */
  def hasMagic(b: Array[Byte], form: String): Boolean =
    b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == form

  /** Validate a chunk's size word (any 32-bit value is representable;
    * only sizes a payload could actually hold are sane) and return it
    * as a non-negative Int.
    */
  def chunkSize(b: Array[Byte], chunkPos: Int, what: String): Int = {
    val size = le32(b, chunkPos + 4)
    require(size <= Int.MaxValue - 8, s"$what: bad chunk size")
    size.toInt
  }

  /** Position after the chunk at `chunkPos` (header + body + pad byte),
    * computed in Long and clamped to `limit`: a size that overruns the
    * payload lands the walk exactly at the limit, where the caller's
    * next `pos + 8 <= limit` / missing-chunk check fails TYPED instead
    * of an Int wrap walking backwards or out of bounds.
    */
  def nextChunk(chunkPos: Int, size: Int, limit: Int): Int = {
    val next = chunkPos.toLong + 8L + size + (size & 1)
    if (next > limit) limit else next.toInt
  }
}
