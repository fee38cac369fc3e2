package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM AVI (RIFF) video codec — a REAL demuxer for a real
  * container format: RIFF/LIST walking, MainAVIHeader / AVIStreamHeader
  * / BITMAPINFOHEADER parsing, frame chunks, and an idx1 index. Two
  * stream flavors, both genuinely decoded:
  *  - UNCOMPRESSED 24-bit DIB ('00db', bottom-up 4-byte-padded BGR
  *    rows): round-trips bit-exactly (no quantization, no entropy
  *    coding) — asserted in ExtSpec, content-pinned in GoldenSpec.
  *  - MJPEG ('MJPG' / '00dc', r12): each frame an independent baseline
  *    JPEG decoded by javax.imageio — a real COMPRESSED codec inside
  *    the pure-JVM line (lossy: error-bounded in ExtSpec, never
  *    golden-pinned).
  *
  * The honest boundary that REMAINS: inter-frame codecs (h264/vp9)
  * have no pure-JVM decoder; their payloads would hand off to a native
  * decoder after this same container walk.
  * Reference anchor: none (extension tier, SURVEY.md §2.4 multimodal).
  */
object VideoCodec {
  import ImageCodec.DecodedImage

  private def cc(s: String): Int = {
    require(s.length == 4)
    (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) | ((s(2) & 0xFF) << 16) |
      ((s(3) & 0xFF) << 24)
  }
  private val RIFF = cc("RIFF"); private val AVI = cc("AVI ")
  private val LIST = cc("LIST"); private val HDRL = cc("hdrl")
  private val STRL = cc("strl"); private val MOVI = cc("movi")
  private val AVIH = cc("avih"); private val STRH = cc("strh")
  private val STRF = cc("strf"); private val VIDS = cc("vids")
  private val DIB = cc("DIB "); private val DB00 = cc("00db")
  private val MJPG = cc("MJPG"); private val DC00 = cc("00dc")
  private val IDX1 = cc("idx1")

  private def rowStride(w: Int): Int = ((w * 3) + 3) / 4 * 4

  /** Mux uncompressed 24-bit frames (all same dimensions) into a
    * genuine AVI byte stream. */
  def encodeAvi(frames: Seq[DecodedImage], fps: Int = 10): Array[Byte] =
    encodeAviCore(frames, fps, DIB, compression = 0, DB00, dibOfFrame)

  /** Mux frames as MJPEG — each frame an independent JPEG payload in a
    * '00dc' chunk, fccHandler/biCompression = 'MJPG'. The one compressed
    * video codec a pure JVM can genuinely round (javax.imageio decodes
    * baseline JPEG), so the compressed-bitstream boundary narrows to
    * inter-frame codecs (h264/vp9). */
  def encodeAviMjpeg(frames: Seq[DecodedImage], fps: Int = 10,
      quality: Float = 0.9f): Array[Byte] =
    encodeAviCore(frames, fps, MJPG, compression = MJPG, DC00,
      f => ImageCodec.encodeJpeg(f, quality))

  private def dibOfFrame(f: DecodedImage): Array[Byte] = {
    val w = f.width
    val h = f.height
    val stride = rowStride(w)
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y // bottom-up
      var x = 0
      while (x < w) {
        val p = f.argb(srcRow * w + x)
        val o = y * stride + x * 3
        out(o) = (p & 0xFF).toByte // B
        out(o + 1) = ((p >> 8) & 0xFF).toByte // G
        out(o + 2) = ((p >> 16) & 0xFF).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  private def encodeAviCore(frames: Seq[DecodedImage], fps: Int,
      handler: Int, compression: Int, chunkId: Int,
      encodeFrame: DecodedImage => Array[Byte]): Array[Byte] = {
    require(frames.nonEmpty, "encodeAvi: no frames")
    val w = frames.head.width
    val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "encodeAvi: all frames must share dimensions")
    val bodies = frames.map(encodeFrame)
    // uncompressed bodies are all stride*h; compressed vary — the
    // header's buffer size and biSizeImage carry the max
    val frameBytes = bodies.map(_.length).max

    def chunk(id: Int, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(id).putInt(body.length).put(body)
      b.array()
    }
    def list(listType: Int, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(LIST).putInt(4 + body.length).putInt(listType).put(body)
      b.array()
    }

    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1000000 / fps) // dwMicroSecPerFrame
      b.putInt(frameBytes * fps) // dwMaxBytesPerSec
      b.putInt(0) // dwPaddingGranularity
      b.putInt(0x10) // dwFlags: AVIF_HASINDEX
      b.putInt(frames.size) // dwTotalFrames
      b.putInt(0) // dwInitialFrames
      b.putInt(1) // dwStreams
      b.putInt(frameBytes) // dwSuggestedBufferSize
      b.putInt(w).putInt(h)
      b.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(VIDS).putInt(handler)
      b.putInt(0) // dwFlags
      b.putShort(0).putShort(0) // wPriority, wLanguage
      b.putInt(0) // dwInitialFrames
      b.putInt(1).putInt(fps) // dwScale / dwRate
      b.putInt(0).putInt(frames.size) // dwStart, dwLength
      b.putInt(frameBytes) // dwSuggestedBufferSize
      b.putInt(-1) // dwQuality (default)
      b.putInt(0) // dwSampleSize
      b.putShort(0).putShort(0) // rcFrame left/top
      b.putShort(w.toShort).putShort(h.toShort) // rcFrame right/bottom
      b.array()
    }
    val strf = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(w).putInt(h) // biSize, biWidth, biHeight (+:bottom-up)
      b.putShort(1).putShort(24) // biPlanes, biBitCount
      b.putInt(compression) // biCompression: BI_RGB or 'MJPG'
      b.putInt(frameBytes) // biSizeImage (max body for compressed)
      b.putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }

    val hdrl = list(HDRL,
      chunk(AVIH, avih) ++ list(STRL, chunk(STRH, strh) ++ chunk(STRF, strf)))
    val frameChunks = bodies.map(body => chunk(chunkId, body))
    val movi = list(MOVI, frameChunks.reduce(_ ++ _))
    // idx1: one entry per frame, offsets relative to the 'movi' fourcc
    val idx1Body = {
      val b = ByteBuffer.allocate(16 * frames.size)
        .order(ByteOrder.LITTLE_ENDIAN)
      var off = 4 // first chunk starts right after the 'movi' type word
      frameChunks.zip(bodies).foreach { case (fc, body) =>
        b.putInt(chunkId).putInt(0x10).putInt(off).putInt(body.length)
        off += fc.length
      }
      b.array()
    }
    val body = hdrl ++ movi ++ chunk(IDX1, idx1Body)
    val out = ByteBuffer.allocate(12 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(RIFF).putInt(4 + body.length).putInt(AVI).put(body)
    out.array()
  }

  /** Demux an AVI into its frames — BI_RGB 24-bit '00db' DIBs decoded
    * by the raster walk, 'MJPG' '00dc' JPEG payloads decoded by
    * javax.imageio. Fails loudly on anything else — a corrupt payload
    * must never produce silent empty output (GuardSpec). */
  def decodeAviFrames(bytes: Array[Byte]): Seq[DecodedImage] = {
    require(bytes.length >= 12, s"not an AVI: ${bytes.length} bytes")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.getInt(0) == RIFF && b.getInt(8) == AVI,
      "not an AVI: missing RIFF/AVI signature")
    var w = -1
    var h = -1
    var comp = 0
    val dibs = Seq.newBuilder[Array[Byte]]
    val jpegs = Seq.newBuilder[Array[Byte]]

    // walk chunks in [from, to); LIST bodies recurse
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = b.getInt(pos)
        val size = b.getInt(pos + 4)
        // bound check in Long: a hostile size near Int.MaxValue would
        // overflow Int arithmetic to negative, slip past the guard, and
        // die later in an allocation instead of failing loudly here
        require(size >= 0 && pos + 8 + size.toLong <= to,
          s"corrupt AVI chunk at $pos: size $size exceeds container")
        if (id == LIST) {
          // a LIST body starts with its 4-byte type word; a smaller
          // size would invert the child range [pos+12, pos+8+size) and
          // silently walk nothing
          require(size >= 4, s"corrupt AVI LIST at $pos: size $size < 4")
          walk(pos + 12, pos + 8 + size) // skip the list-type word
        } else if (id == STRF) {
          require(size >= 40, s"BITMAPINFOHEADER too short: $size")
          w = b.getInt(pos + 8 + 4)
          h = b.getInt(pos + 8 + 8)
          val bpp = b.getShort(pos + 8 + 14).toInt
          comp = b.getInt(pos + 8 + 16)
          require(bpp == 24 && (comp == 0 || comp == MJPG),
            s"unsupported AVI stream: bpp=$bpp compression=$comp " +
              "(only uncompressed 24-bit DIB or MJPG is pure-JVM decodable)")
        } else if (id == DB00 || id == DC00) {
          val body = new Array[Byte](size)
          System.arraycopy(bytes, pos + 8, body, 0, size)
          (if (id == DB00) dibs else jpegs) += body
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, bytes.length)
    require(w > 0 && h > 0, "AVI carries no vids/strf header")
    if (comp == MJPG) {
      // compressed path: each '00dc' body is an independent JPEG; the
      // decoded dimensions must agree with the stream header — a lying
      // header is rejected, not misread
      require(dibs.result().isEmpty,
        "corrupt MJPG AVI: uncompressed '00db' chunk in an MJPG stream")
      jpegs.result().map { jpg =>
        val d = ImageCodec.decode(jpg)
        require(d.width == w && d.height == h,
          s"MJPG frame ${d.width}x${d.height} disagrees with strf ${w}x$h")
        d
      }
    } else {
      require(jpegs.result().isEmpty,
        "corrupt AVI: compressed '00dc' chunk in a BI_RGB stream")
      val stride = rowStride(w)
      dibs.result().map { dib =>
        require(dib.length >= stride * h,
          s"frame chunk too short: ${dib.length} < ${stride * h}")
        val argb = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          val srcRow = h - 1 - y
          var x = 0
          while (x < w) {
            val o = srcRow * stride + x * 3
            argb(y * w + x) = 0xFF000000 |
              ((dib(o + 2) & 0xFF) << 16) | ((dib(o + 1) & 0xFF) << 8) |
              (dib(o) & 0xFF)
            x += 1
          }
          y += 1
        }
        DecodedImage(w, h, 3, argb)
      }
    }
  }

  /** Deterministic multi-frame rasters for a document — same splitmix
    * stream as the GIF renderer but FULL 24-bit (uncompressed DIB needs
    * no palette quantization). */
  def renderAviFrames(id: Long, content: Array[Byte]): Seq[DecodedImage] = {
    val w = 16 + Math.floorMod(id, 11L).toInt
    val h = 16 + Math.floorMod(id / 11, 5L).toInt
    val nFrames = 2 + Math.floorMod(id, 3L).toInt
    var seed = id * 0x9E3779B97F4A7C15L
    content.foreach(b => seed = (seed ^ b) * 0xFF51AFD7ED558CCDL)
    (0 until nFrames).map { _ =>
      val argb = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        seed += 0x9E3779B97F4A7C15L
        var z = seed
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        argb(i) = 0xFF000000 | (((z ^ (z >>> 31)) & 0xFFFFFF).toInt)
        i += 1
      }
      DecodedImage(w, h, 3, argb)
    }
  }

  def renderAvi(id: Long, content: Array[Byte]): Array[Byte] =
    encodeAvi(renderAviFrames(id, content))

  /** MJPEG payloads need LOW-FREQUENCY content: the splitmix noise the
    * DIB path uses is the worst case for a DCT codec (every 8x8 block
    * all high frequencies), so an error-bound test on it would be
    * meaningless. Smooth deterministic gradients + a block accent are
    * the realistic "thumbnail" content class MJPEG actually carries. */
  def renderMjpegFrames(id: Long, content: Array[Byte]): Seq[DecodedImage] = {
    val w = 32 + Math.floorMod(id, 9L).toInt
    val h = 24 + Math.floorMod(id / 9, 7L).toInt
    val nFrames = 2 + Math.floorMod(id, 3L).toInt
    var seed = id * 0x9E3779B97F4A7C15L
    content.foreach(b => seed = (seed ^ b) * 0xFF51AFD7ED558CCDL)
    (0 until nFrames).map { f =>
      seed += 0x9E3779B97F4A7C15L
      var z = seed
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      val base = (z & 0x7F).toInt
      val argb = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = (base + (x * 120) / w + f * 17) & 0xFF
          val g = (base + (y * 120) / h + f * 31) & 0xFF
          val bl = (base + ((x + y) * 60) / (w + h)) & 0xFF
          argb(y * w + x) = 0xFF000000 | (r << 16) | (g << 8) | bl
          x += 1
        }
        y += 1
      }
      DecodedImage(w, h, 3, argb)
    }
  }

  def renderAviMjpeg(id: Long, content: Array[Byte]): Array[Byte] =
    encodeAviMjpeg(renderMjpegFrames(id, content))
}
