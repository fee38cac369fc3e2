package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM AVI (RIFF) video codec for UNCOMPRESSED 24-bit DIB frames —
  * a REAL demuxer for a real container format: RIFF/LIST walking,
  * MainAVIHeader / AVIStreamHeader / BITMAPINFOHEADER parsing, '00db'
  * frame chunks with bottom-up 4-byte-padded BGR rows, and an idx1
  * index. Raw-frame video round-trips bit-exactly (no quantization, no
  * entropy coding), so demuxed rasters equal the rendered ones pixel
  * for pixel — asserted in ExtSpec, content-pinned in GoldenSpec.
  *
  * The honest boundary that REMAINS: compressed codecs (h264/vp9) have
  * no pure-JVM decoder — but "video demux" itself is no longer a
  * stand-in; this is the same container walk a crawl pipeline runs on
  * an .avi before handing compressed payloads to a native decoder.
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
  private val IDX1 = cc("idx1")

  private def rowStride(w: Int): Int = ((w * 3) + 3) / 4 * 4

  /** Mux uncompressed 24-bit frames (all same dimensions) into a
    * genuine AVI byte stream. */
  def encodeAvi(frames: Seq[DecodedImage], fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "encodeAvi: no frames")
    val w = frames.head.width
    val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "encodeAvi: all frames must share dimensions")
    val stride = rowStride(w)
    val frameBytes = stride * h

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
      b.putInt(VIDS).putInt(DIB)
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
      b.putInt(0) // biCompression = BI_RGB
      b.putInt(frameBytes) // biSizeImage
      b.putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    def dibOf(f: DecodedImage): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
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

    val hdrl = list(HDRL,
      chunk(AVIH, avih) ++ list(STRL, chunk(STRH, strh) ++ chunk(STRF, strf)))
    val frameChunks = frames.map(f => chunk(DB00, dibOf(f)))
    val movi = list(MOVI, frameChunks.reduce(_ ++ _))
    // idx1: one entry per frame, offsets relative to the 'movi' fourcc
    val idx1Body = {
      val b = ByteBuffer.allocate(16 * frames.size)
        .order(ByteOrder.LITTLE_ENDIAN)
      var off = 4 // first chunk starts right after the 'movi' type word
      frameChunks.foreach { fc =>
        b.putInt(DB00).putInt(0x10).putInt(off).putInt(frameBytes)
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

  /** Demux an uncompressed-DIB AVI into its frames. Fails loudly on
    * anything that is not an AVI or not BI_RGB 24-bit — a corrupt
    * payload must never produce silent empty output (GuardSpec). */
  def decodeAviFrames(bytes: Array[Byte]): Seq[DecodedImage] = {
    require(bytes.length >= 12, s"not an AVI: ${bytes.length} bytes")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.getInt(0) == RIFF && b.getInt(8) == AVI,
      "not an AVI: missing RIFF/AVI signature")
    var w = -1
    var h = -1
    val frames = Seq.newBuilder[Array[Byte]]

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
          val compression = b.getInt(pos + 8 + 16)
          require(bpp == 24 && compression == 0,
            s"unsupported AVI stream: bpp=$bpp compression=$compression " +
              "(only uncompressed 24-bit DIB is pure-JVM decodable)")
        } else if (id == DB00) {
          val body = new Array[Byte](size)
          System.arraycopy(bytes, pos + 8, body, 0, size)
          frames += body
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, bytes.length)
    require(w > 0 && h > 0, "AVI carries no vids/strf header")
    val stride = rowStride(w)
    frames.result().map { dib =>
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
}
