package graft.multimodal

/** REAL video bytes through the multimodal tier: a hand-rolled pure-JVM
  * codec for uncompressed AVI (the RIFF `AVI ` form — Microsoft's Video
  * for Windows container: a `hdrl` LIST carrying `avih` main header +
  * `strl`(`strh`/`strf`) stream headers, then a `movi` LIST of `00db`
  * device-independent-bitmap frames, BI_RGB 24-bit, bottom-up BGR rows
  * padded to 4 bytes). Completes the brief's image/audio/video triad:
  * the frames a real sampler extracts are actual container-decoded
  * pixels, not byte slices. Uncompressed DIB frames keep every pixel
  * closed-form oracle-checkable, exactly like the PPM/PNG/WAV legs.
  *
  * The same three pieces as [[Wav]]:
  *
  *  - [[encode]]/[[decodeFrame]]: full round-trip, partition-parallel
  *    at the call sites.
  *  - [[header]]: chunk-walking metadata parse (width / height / frame
  *    count / frame duration) that never touches `movi` sample data —
  *    the cheap pre-decode pass.
  *  - Malformed-payload QUARANTINE posture: typed
  *    IllegalArgumentException on bad magic, truncated chunk walks,
  *    non-BI_RGB compression, or a `movi` LIST whose declared frame
  *    sizes overrun the payload.
  */
object Avi {

  import Riff.{le16, le32, tag}

  final case class Info(width: Int, height: Int, nFrames: Int,
                        microSecPerFrame: Int)

  private def rowBytes(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode an uncompressed 24-bit AVI from a per-frame pixel function
    * `(frameNo, x, y) => (r, g, b)`.
    */
  def encode(width: Int, height: Int, nFrames: Int,
             microSecPerFrame: Int,
             pixel: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 &&
      microSecPerFrame > 0)
    val frameSize = rowBytes(width) * height
    val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40))
    val moviSize = 4 + nFrames * (8 + frameSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = out.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); out.putInt(riffSize); fourcc("AVI ")
    // ---- LIST hdrl -----------------------------------------------------
    fourcc("LIST"); out.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); out.putInt(56)
    out.putInt(microSecPerFrame)
      .putInt(0)          // dwMaxBytesPerSec
      .putInt(0)          // dwPaddingGranularity
      .putInt(0)          // dwFlags
      .putInt(nFrames)    // dwTotalFrames
      .putInt(0)          // dwInitialFrames
      .putInt(1)          // dwStreams
      .putInt(frameSize)  // dwSuggestedBufferSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    fourcc("LIST"); out.putInt(4 + 64 + 48); fourcc("strl")
    fourcc("strh"); out.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    out.putInt(0)                   // dwFlags
      .putShort(0).putShort(0)      // wPriority, wLanguage
      .putInt(0)                    // dwInitialFrames
      .putInt(microSecPerFrame)     // dwScale
      .putInt(1000000)              // dwRate (fps = rate/scale)
      .putInt(0)                    // dwStart
      .putInt(nFrames)              // dwLength
      .putInt(frameSize)            // dwSuggestedBufferSize
      .putInt(0)                    // dwQuality (default)
      .putInt(0)                    // dwSampleSize
      .putShort(0).putShort(0)      // rcFrame left, top
      .putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); out.putInt(40)
    out.putInt(40)                  // biSize
      .putInt(width).putInt(height) // positive height: bottom-up rows
      .putShort(1)                  // biPlanes
      .putShort(24)                 // biBitCount
      .putInt(0)                    // biCompression = BI_RGB
      .putInt(frameSize)            // biSizeImage
      .putInt(0).putInt(0)          // pels per meter
      .putInt(0).putInt(0)          // clr used / important
    // ---- LIST movi -----------------------------------------------------
    fourcc("LIST"); out.putInt(moviSize); fourcc("movi")
    val pad = rowBytes(width) - width * 3
    var f = 0
    while (f < nFrames) {
      fourcc("00db"); out.putInt(frameSize)
      var y = height - 1 // bottom-up
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val (r, g, b) = pixel(f, x, y)
          out.put(b.toByte).put(g.toByte).put(r.toByte) // BGR
          x += 1
        }
        var p = 0
        while (p < pad) { out.put(0.toByte); p += 1 }
        y -= 1
      }
      f += 1
    }
    out.array()
  }

  /** Walk to a LIST of the given form type; returns (bodyPos, size) of
    * the list body AFTER the form tag.
    */
  private def findList(bytes: Array[Byte], form: String)
      : (Int, Int) = {
    var pos = 12
    while (pos + 12 <= bytes.length) {
      val id = tag(bytes, pos)
      val size = Riff.chunkSize(bytes, pos, "avi")
      if (id == "LIST" && tag(bytes, pos + 8) == form)
        return (pos + 12, size - 4)
      pos = Riff.nextChunk(pos, size, bytes.length)
    }
    throw new IllegalArgumentException(s"avi: missing $form list")
  }

  /** Chunk-walking header parse; never reads frame data. */
  def header(bytes: Array[Byte]): Info = {
    require(Riff.hasMagic(bytes, "AVI "),
      "avi: not a RIFF/AVI payload")
    val (hdrl, hdrlSize) = findList(bytes, "hdrl")
    // the hdrl list's own declared extent bounds everything below: a
    // spec-conforming file may carry extra chunks after strl (odml,
    // vedt, ...) and the scan must not walk past the list into movi
    val hdrlEnd = math.min(hdrl.toLong + hdrlSize,
      bytes.length.toLong).toInt
    require(hdrl + 64 <= bytes.length, "avi: truncated hdrl list")
    require(tag(bytes, hdrl) == "avih" &&
      hdrlSize >= 64, "avi: truncated avih header")
    val avihSize = Riff.chunkSize(bytes, hdrl, "avi")
    require(avihSize >= 56 && hdrl + 8 + avihSize <= bytes.length,
      "avi: truncated avih header")
    val usPerFrame = le32(bytes, hdrl + 8).toInt
    val nFrames = le32(bytes, hdrl + 24).toInt
    val width = le32(bytes, hdrl + 40).toInt
    val height = le32(bytes, hdrl + 44).toInt
    require(width > 0 && height > 0 && nFrames > 0 && usPerFrame > 0,
      "avi: bad avih geometry")
    // find strf inside strl to validate the pixel format contract;
    // advance past avih by its DECLARED size (r11 advice — an extended
    // avih is spec-legal), and bound the scan by the hdrl extent
    var pos = Riff.nextChunk(hdrl, avihSize, hdrlEnd)
    var sawStrf = false
    while (!sawStrf && pos + 8 <= hdrlEnd) {
      val id = tag(bytes, pos)
      val size = Riff.chunkSize(bytes, pos, "avi")
      if (id == "LIST") pos += 12 // descend into strl
      else if (id == "strf") {
        require(pos + 8 + 40 <= hdrlEnd, "avi: truncated strf")
        require(le16(bytes, pos + 8 + 14) == 24,
          "avi: only 24-bit frames supported")
        require(le32(bytes, pos + 8 + 16) == 0,
          "avi: only BI_RGB (uncompressed) supported")
        sawStrf = true
      } else pos = Riff.nextChunk(pos, size, hdrlEnd)
    }
    require(sawStrf, "avi: missing strf format header")
    Info(width, height, nFrames, usPerFrame)
  }

  /** Byte offsets of each `00db`/`00dc` frame chunk body in the movi
    * list; validates every declared size against the payload (the
    * truncated-in-flight upload fails HERE, typed).
    */
  private def frameOffsets(bytes: Array[Byte], info: Info)
      : Array[Int] = {
    val (movi, moviSize) = findList(bytes, "movi")
    val end = movi + moviSize
    require(end <= bytes.length, "avi: truncated movi list")
    val frameSize = rowBytes(info.width) * info.height
    val offs = new Array[Int](info.nFrames)
    var pos = movi
    var f = 0
    while (f < info.nFrames) {
      require(pos + 8 <= end, "avi: truncated movi list")
      val id = tag(bytes, pos)
      val size = Riff.chunkSize(bytes, pos, "avi")
      if (id == "00db" || id == "00dc") {
        require(size == frameSize, "avi: frame size mismatch")
        require(pos + 8 + size <= end, "avi: truncated frame data")
        offs(f) = pos + 8
        f += 1
      }
      pos = Riff.nextChunk(pos, size, end)
    }
    offs
  }

  /** Decode one frame (0-based) to the shared [[Ppm.Image]] pixel model
    * — the image-tier feature/hash functions apply unchanged.
    */
  def decodeFrame(bytes: Array[Byte], frameNo: Int): Ppm.Image = {
    val info = header(bytes)
    require(frameNo >= 0 && frameNo < info.nFrames, "avi: no such frame")
    decodeAt(bytes, info, frameOffsets(bytes, info)(frameNo))
  }

  /** Decode every frame in one pass (one chunk walk, shared by the
    * per-frame feature and scene-cut queries).
    */
  def decodeFrames(bytes: Array[Byte]): Array[Ppm.Image] = {
    val info = header(bytes)
    frameOffsets(bytes, info).map(off => decodeAt(bytes, info, off))
  }

  private def decodeAt(bytes: Array[Byte], info: Info,
                       off: Int): Ppm.Image = {
    val rb = rowBytes(info.width)
    val rgb = new Array[Int](info.width * info.height * 3)
    var y = 0
    while (y < info.height) {
      val src = off + (info.height - 1 - y) * rb // bottom-up
      var x = 0
      while (x < info.width) {
        val i = (y * info.width + x) * 3
        rgb(i) = bytes(src + x * 3 + 2) & 0xff     // R
        rgb(i + 1) = bytes(src + x * 3 + 1) & 0xff // G
        rgb(i + 2) = bytes(src + x * 3) & 0xff     // B
        x += 1
      }
      y += 1
    }
    Ppm.Image(info.width, info.height, rgb)
  }
}
