package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Pure-JVM image codec on javax.imageio — the real decode step behind
  * the multimodal operators (no native image libraries required). PNG
  * is the canonical interchange format here: lossless, so
  * decode(encode(x)) is bit-exact and goldens can pin pixel digests.
  * JPEG decodes through the same entry point (dimension/channel
  * invariants asserted in ExtSpec; pixels are lossy by nature and never
  * pinned). Resize is an explicit nearest-neighbor kernel over the ARGB
  * grid — unlike Graphics2D scaling, its output is deterministic across
  * JVMs, which a content-addressed 100 TB pipeline needs (same input
  * must dedup to the same thumbnail digest on every executor).
  */
object ImageCodec {

  // ImageIO defaults to DISK-backed stream caching: every decode/encode
  // of an in-memory byte payload writes a temp file under java.io.tmpdir
  // (FileCacheImageInputStream). At 32 concurrent decode tasks that is
  // thousands of temp-file create/write/delete cycles per query — erratic
  // multi-second latency under any disk contention (measured: the three
  // image bench keys swinging 0.4 -> 3.5 s run-to-run), and exactly the
  // per-record executor-local disk IO a 100 TB scan must not do. The
  // payloads are already in memory; cache in memory.
  ImageIO.setUseCache(false)

  /** Decoded raster: ARGB ints row-major, plus the color-model channel
    * count (3 for RGB PNG/JPEG, 4 with alpha). */
  final case class DecodedImage(
      width: Int, height: Int, channels: Int, argb: Array[Int])

  def decode(bytes: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    DecodedImage(w, h, img.getColorModel.getNumComponents,
      img.getRGB(0, 0, w, h, null, 0, w))
  }

  def encodePng(d: DecodedImage): Array[Byte] = {
    val img = new BufferedImage(d.width, d.height, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, d.width, d.height, d.argb, 0, d.width)
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", out), "no PNG writer available")
    out.toByteArray
  }

  /** JPEG encode at an explicit quality — the compressed-frame payload
    * for the MJPEG AVI path ([[VideoCodec.encodeAviMjpeg]]). Lossy by
    * nature: decode(encodeJpeg(x)) approximates x (error bound asserted
    * in ExtSpec), so JPEG pixels are never golden-pinned; the decoded
    * rasters are still deterministic for fixed bytes + JDK. */
  def encodeJpeg(d: DecodedImage, quality: Float = 0.9f): Array[Byte] = {
    val img = new BufferedImage(d.width, d.height, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, d.width, d.height, d.argb, 0, d.width)
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Insert a PNG tEXt chunk (keyword\0text) right after IHDR — the
    * planted-metadata half of the strip-metadata witness. Real chunk
    * surgery: big-endian length, type, data, CRC32 over type+data. */
  def insertTextChunk(png: Array[Byte], keyword: String,
      text: String): Array[Byte] = {
    require(png.length > 8 + 25, "not a PNG")
    val data = keyword.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
      text.getBytes("ISO-8859-1")
    val chunk = java.nio.ByteBuffer.allocate(12 + data.length)
    chunk.putInt(data.length)
    chunk.put("tEXt".getBytes("ISO-8859-1"))
    chunk.put(data)
    val crc = new java.util.zip.CRC32
    crc.update("tEXt".getBytes("ISO-8859-1"))
    crc.update(data)
    chunk.putInt(crc.getValue.toInt)
    // IHDR is always the first chunk: 8-byte signature + 25-byte IHDR
    val cut = 8 + 25
    png.take(cut) ++ chunk.array() ++ png.drop(cut)
  }

  /** Strip ancillary text metadata chunks (tEXt/zTXt/iTXt) from a PNG
    * — the privacy pass (EXIF-strip analog) a crawl pipeline runs
    * before republishing media. Walks the real chunk stream; critical
    * and non-text ancillary chunks pass through byte-identical, so the
    * decoded pixels are untouched. Returns (cleaned, chunksRemoved).
    * Fails loudly on a non-PNG or a truncated chunk stream. */
  def stripTextChunks(png: Array[Byte]): (Array[Byte], Int) = {
    require(png.length >= 8 &&
      (png(0) & 0xFF) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte, "not a PNG")
    val out = new ByteArrayOutputStream()
    out.write(png, 0, 8)
    var pos = 8
    var removed = 0
    val drop = Set("tEXt", "zTXt", "iTXt")
    while (pos < png.length) {
      require(pos + 8 <= png.length, s"truncated PNG chunk header at $pos")
      val len = java.nio.ByteBuffer.wrap(png, pos, 4).getInt
      require(len >= 0 && pos + 12L + len <= png.length,
        s"corrupt PNG chunk at $pos: len $len exceeds container")
      val ctype = new String(png, pos + 4, 4, "ISO-8859-1")
      if (drop.contains(ctype)) removed += 1
      else out.write(png, pos, 12 + len)
      pos += 12 + len
    }
    (out.toByteArray, removed)
  }

  /** SHA-256 over the big-endian ARGB pixel stream — the pinned content
    * identity of a decoded image (independent of the encoded container
    * bytes, which codecs may legally vary). */
  def pixelSha(d: DecodedImage): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val bb = java.nio.ByteBuffer.allocate(d.argb.length * 4)
    d.argb.foreach(bb.putInt)
    md.digest(bb.array()).map("%02x".format(_)).mkString
  }

  /** Deterministic nearest-neighbor resize (floor sampling). */
  def resizeNearest(d: DecodedImage, tw: Int, th: Int): DecodedImage = {
    require(tw > 0 && th > 0, "target dimensions must be positive")
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val sy = y * d.height / th
      var x = 0
      while (x < tw) {
        out(y * tw + x) = d.argb(sy * d.width + x * d.width / tw)
        x += 1
      }
      y += 1
    }
    DecodedImage(tw, th, d.channels, out)
  }

  /** Grid-mean features: per cell of a `grid`×`grid` partition, mean
    * R, G, B and luma in [0,1], L2-normalized — dim = grid²·4. Integer
    * accumulation then one double division per cell keeps the result
    * independent of pixel iteration order. */
  def featurize(d: DecodedImage, grid: Int = 2): Array[Float] = {
    val sums = Array.ofDim[Long](grid * grid, 3)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < d.height) {
      val cy = math.min(y * grid / d.height, grid - 1)
      var x = 0
      while (x < d.width) {
        val cell = cy * grid + math.min(x * grid / d.width, grid - 1)
        val p = d.argb(y * d.width + x)
        sums(cell)(0) += (p >> 16) & 0xFF
        sums(cell)(1) += (p >> 8) & 0xFF
        sums(cell)(2) += p & 0xFF
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val raw = new Array[Float](grid * grid * 4)
    var c = 0
    while (c < grid * grid) {
      val n = math.max(counts(c), 1L) * 255.0
      val r = sums(c)(0) / n
      val g = sums(c)(1) / n
      val b = sums(c)(2) / n
      raw(c * 4) = r.toFloat
      raw(c * 4 + 1) = g.toFloat
      raw(c * 4 + 2) = b.toFloat
      raw(c * 4 + 3) = (0.299 * r + 0.587 * g + 0.114 * b).toFloat
      c += 1
    }
    val norm = math.sqrt(raw.map(v => v.toDouble * v).sum)
    if (norm == 0.0) { raw(0) = 1.0f; raw }
    else raw.map(v => (v / norm).toFloat)
  }

  // --- multi-frame ("video") face: animated GIF ----------------------

  /** Demux a multi-frame container (animated GIF through javax.imageio)
    * into per-frame rasters — a REAL demuxer: the frame count comes
    * from the stream, each frame is decoded by the actual codec. */
  def decodeFrames(bytes: Array[Byte]): Seq[DecodedImage] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    val readers = ImageIO.getImageReaders(iis)
    require(readers.hasNext, s"no codec for payload (${bytes.length} bytes)")
    val r = readers.next()
    r.setInput(iis)
    try (0 until r.getNumImages(true)).map { i =>
      val img = r.read(i)
      DecodedImage(img.getWidth, img.getHeight,
        img.getColorModel.getNumComponents,
        img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth))
    } finally r.dispose()
  }

  /** Encode frames as an animated GIF. Frames should be
    * palette-representable (see [[renderGifFrames]]) so the indexed
    * encoding round-trips pixels losslessly. */
  def encodeGif(frames: Seq[DecodedImage]): Array[Byte] = {
    require(frames.nonEmpty, "cannot encode an empty frame sequence")
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { f =>
      val img = new BufferedImage(f.width, f.height,
        BufferedImage.TYPE_BYTE_INDEXED)
      img.setRGB(0, 0, f.width, f.height, f.argb, 0, f.width)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Deterministic multi-frame rasters for a document: frame count and
    * dimensions from the doc id, pixels from the seeded stream,
    * PRE-QUANTIZED to the standard 256-color indexed palette (by
    * rendering into a TYPE_BYTE_INDEXED image) so encodeGif →
    * decodeFrames round-trips every pixel bit-exactly. */
  def renderGifFrames(id: Long, content: Array[Byte]): Seq[DecodedImage] = {
    val w = 16 + Math.floorMod(id, 9L).toInt
    val h = 16 + Math.floorMod(id / 9, 7L).toInt
    val nFrames = 2 + Math.floorMod(id, 4L).toInt
    var seed = id * 0x9E3779B97F4A7C15L
    content.foreach(b => seed = (seed ^ b) * 0xFF51AFD7ED558CCDL)
    (0 until nFrames).map { _ =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
      var i = 0
      while (i < w * h) {
        seed += 0x9E3779B97F4A7C15L
        var z = seed
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        img.setRGB(i % w, i / w, ((z ^ (z >>> 31)) & 0xFFFFFF).toInt)
        i += 1
      }
      // read back through the indexed color model: these are the
      // palette-exact pixels the GIF round-trip preserves
      DecodedImage(w, h, 3, img.getRGB(0, 0, w, h, null, 0, w))
    }
  }

  def renderGif(id: Long, content: Array[Byte]): Array[Byte] =
    encodeGif(renderGifFrames(id, content))

  /** Deterministic synthetic image for a document: dimensions from the
    * doc id, pixels from a splitmix-style stream seeded by the id and
    * the content bytes — the repeatable stand-in for a crawl's real
    * media files (the container ships no image corpus), encoded as REAL
    * PNG bytes so the decode path exercises the actual codec. */
  def renderPng(id: Long, content: Array[Byte]): Array[Byte] = {
    val w = 16 + (Math.floorMod(id, 17L)).toInt
    val h = 16 + (Math.floorMod(id / 17, 13L)).toInt
    var seed = id * 0x9E3779B97F4A7C15L
    content.foreach(b => seed = (seed ^ b) * 0xFF51AFD7ED558CCDL)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      seed += 0x9E3779B97F4A7C15L
      var z = seed
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      px(i) = ((z ^ (z >>> 31)) & 0xFFFFFF).toInt
      i += 1
    }
    encodePng(DecodedImage(w, h, 3, px))
  }
}
