package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Pure-JVM audio codec on javax.sound.sampled — the real decode step
  * behind the audio face of the multimodal operators. WAV/PCM16 is the
  * canonical interchange format: the container wraps raw samples, so
  * encode→decode round-trips every sample bit-exactly and goldens can
  * pin waveform digests. The rendered payloads are deterministic
  * synthetic signals (the container ships no audio corpus) but the
  * BYTES are a genuine RIFF/WAVE stream and the decode is the actual
  * platform codec.
  */
object AudioCodec {

  final case class DecodedAudio(
      sampleRate: Int, channels: Int, sampleBits: Int,
      samples: Array[Short]) {
    def nFrames: Long = samples.length.toLong / channels
    def durationMs: Long = nFrames * 1000L / sampleRate
  }

  private val Rate = 8000f

  /** Decode a WAV stream to PCM16 samples (little-endian interleaved). */
  def decodeWav(bytes: Array[Byte]): DecodedAudio = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val f = in.getFormat
      require(f.getSampleSizeInBits == 16,
        s"expected PCM16, got ${f.getSampleSizeInBits}-bit")
      val raw = in.readAllBytes()
      val n = raw.length / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) {
        val lo = raw(2 * i) & 0xFF
        val hi = raw(2 * i + 1).toInt
        out(i) = (if (f.isBigEndian) ((lo << 8) | (hi & 0xFF))
                  else ((hi << 8) | lo)).toShort
        i += 1
      }
      DecodedAudio(f.getSampleRate.toInt, f.getChannels,
        f.getSampleSizeInBits, out)
    } finally in.close()
  }

  /** Encode PCM16 mono samples as a WAV stream. */
  def encodeWav(samples: Array[Short], sampleRate: Float = Rate): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xFF).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val out = new ByteArrayOutputStream()
    val ais = new AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out): Unit
    out.toByteArray
  }

  /** Integer waveform statistics over decoded samples — peak, exact
    * sum-of-squares-derived RMS (floored), and zero crossings; integer
    * arithmetic end-to-end so digests are engine- and order-stable. */
  def stats(d: DecodedAudio): (Int, Long, Long) = {
    var peak = 0
    var sumSq = 0L
    var zc = 0L
    var i = 0
    while (i < d.samples.length) {
      val v = d.samples(i).toInt
      if (math.abs(v) > peak) peak = math.abs(v)
      sumSq += v.toLong * v
      if (i > 0 && ((d.samples(i - 1) < 0) != (v < 0))) zc += 1
      i += 1
    }
    val rms =
      if (d.samples.isEmpty) 0L
      else math.sqrt(sumSq.toDouble / d.samples.length).toLong
    (peak, rms, zc)
  }

  /** Deterministic synthetic signal for a document: length from the
    * doc id, a sine carrier plus splitmix noise seeded by the id and
    * content bytes, quantized to PCM16. */
  def renderWav(id: Long, content: Array[Byte]): Array[Byte] = {
    val n = 400 + Math.floorMod(id, 400L).toInt
    var seed = id * 0x9E3779B97F4A7C15L
    content.foreach(b => seed = (seed ^ b) * 0xFF51AFD7ED558CCDL)
    val freq = 100 + Math.floorMod(seed, 900L).toInt
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) {
      seed += 0x9E3779B97F4A7C15L
      var z = seed
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      val noise = ((z ^ (z >>> 31)) % 4096L).toInt
      // StrictMath: Math.sin is only within-1-ulp and varies across
      // architectures; a 1-ulp flip on a .toInt boundary would change
      // a sample and break the pinned golden digest on another JVM
      val tone = (StrictMath.sin(2 * math.Pi * freq * i / Rate) * 12000).toInt
      samples(i) = math.max(Short.MinValue.toInt,
        math.min(Short.MaxValue.toInt, tone + noise)).toShort
      i += 1
    }
    encodeWav(samples)
  }
}
