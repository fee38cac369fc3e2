package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.4): media carried as opaque BINARY
  * columns with typed metadata alongside. Image decode, resize, and
  * featurize run the REAL pure-JVM codec ([[ImageCodec]], javax.imageio
  * PNG/JPEG) over real encoded PNG payloads rendered deterministically
  * from the testdata (the container ships no media corpus, so payloads
  * are synthesized — but the bytes ARE genuine PNG and the decode is a
  * genuine codec). Only the VIDEO frame sampler keeps a stub "decoder"
  * (fixed-byte windows standing in for demuxed frames — no pure-JVM
  * video demuxer exists).
  *
  * Scale: decode runs inside mapPartitions (the JVM analog of
  * mapInPandas batches), so media bytes never leave the executor that
  * scanned them, and per-partition decoder/digest init is amortized
  * across the partition's rows.
  */
object Multimodal {

  /** Binary payload per document (text bytes standing in for media). */
  private def payloads(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))

  /** (doc_id, text) rows repartitioned to the session's parallelism —
    * the shared prelude of every codec stage: the testdata documents
    * scan is a single input split, and per-row codec work on one core
    * is the classic small-input/heavy-CPU trap (measured 4× on the
    * decode bench median). At crawl scale the scan has thousands of
    * splits and this shuffle stays trivially small. */
  private def docRows(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.Dataset[(Long, String)] = {
    val sp = s
    import sp.implicits._
    Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[(Long, String)]
  }

  /** Rendered media payloads, materialized ONCE per (session, sf dir,
    * kind) to a work-dir parquet: synthesizing the payload bytes is
    * DATA GENERATION (in production the media arrives on disk like the
    * testdata parquet does), so the codec query keys measure scan +
    * decode, not synthesis — before this, every cold bench run re-paid
    * the PNG/GIF/WAV ENCODE of the whole corpus before decoding it.
    * The renders are deterministic, so the payload files (and the
    * golden content hashes downstream) are identical however many
    * times a session rebuilds them. 32 render partitions → 32 parquet
    * files, so the downstream decode scan has executor-count splits
    * (the single-split codec trap stays fixed). */
  private val mediaCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, String),
    org.apache.spark.sql.DataFrame]

  private def mediaTable(s: org.apache.spark.sql.SparkSession, dir: String,
      kind: String)(render: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    mediaCache.computeIfAbsent((s, dir, kind),
      _ => graft.Work.materialize(s"media_$kind", render))

  /** Real PNG payload per document, rendered deterministically from the
    * doc id + content ([[ImageCodec.renderPng]]); materialized once per
    * session via [[mediaTable]]. */
  def imagePayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    mediaTable(s, dir, "png") {
      val sp = s
      import sp.implicits._
      docRows(s, dir)
        .mapPartitions(_.map { case (id, text) =>
          (id, ImageCodec.renderPng(id,
            Option(text).getOrElse("").getBytes("UTF-8")))
        })
        .toDF("doc_id", "payload")
    }

  /** Declarative metadata over the binary column — stays in codegen. */
  val meta = QueryDef(
    "multimodal_meta",
    (s, dir) => payloads(s, dir).select(
      col("doc_id"),
      octet_length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("sha")),
    Some("""
      SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             sha256(text) AS sha
      FROM documents"""))

  /** Real image decode via per-partition batches: PNG payload →
    * javax.imageio raster → (dims, channels, pixel digest). The pixel
    * digest, not the container bytes, is the content identity — codecs
    * may legally vary the encoded stream. */
  val decode = QueryDef(
    "multimodal_decode",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      imagePayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val d = ImageCodec.decode(bytes)
          (id, bytes.length, d.width, d.height, d.channels,
            ImageCodec.pixelSha(d))
        })
        .toDF("doc_id", "n_bytes", "width", "height", "channels", "pixel_sha")
    },
    None) // codec output not SQL-expressible → golden-pinned + ExtSpec

  /** Frame sampling for "video" payloads: fixed 64-byte windows, every
    * 2nd window sampled, one output row per frame (the stub "demuxer" —
    * video decode has no pure-JVM codec; the windowing, per-frame
    * digest, and one-row-per-frame explosion are the real shape).
    */
  val frames = QueryDef(
    "multimodal_frames",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      payloads(s, dir).as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          val md = java.security.MessageDigest.getInstance("SHA-256")
          bytes.grouped(64).zipWithIndex
            .filter(_._2 % 2 == 0)
            .map { case (win, idx) =>
              (id, idx, md.digest(win).map("%02x".format(_)).mkString)
            }
        }
        .toDF("doc_id", "frame_idx", "frame_sha")
    },
    // byte-window "frames" ARE SQL-expressible: the testdata text is
    // pure ASCII (asserted by the meta oracle's sha agreement), so
    // DuckDB's VARCHAR substring slices the same 64-byte windows
    Some("""
      WITH w AS (
        SELECT doc_id, text AS b, (length(text) + 63) // 64 AS nw
        FROM documents)
      SELECT doc_id, CAST(i AS INT) AS frame_idx,
             sha256(substring(b, CAST(i * 64 + 1 AS INT), 64)) AS frame_sha
      FROM (SELECT doc_id, b, unnest(range(0, nw, 2)) AS i FROM w)"""))

  /** REAL multi-frame demux: animated-GIF payloads (rendered
    * deterministically per doc, genuine container bytes) demuxed by
    * the actual javax.imageio codec — frame count from the stream, one
    * output row per frame with dimensions and the pixel digest. This
    * is the "video" face the byte-window sampler ([[frames]]) stubs;
    * both ship because the window sampler is SQL-oracle-able while the
    * codec output is golden-pinned. */
  val videoFrames = QueryDef(
    "multimodal_video_frames",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      val gifs = mediaTable(s, dir, "gif") {
        docRows(s, dir)
          .mapPartitions(_.map { case (id, text) =>
            (id, ImageCodec.renderGif(id,
              Option(text).getOrElse("").getBytes("UTF-8")))
          })
          .toDF("doc_id", "payload")
      }
      gifs.as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, gif) =>
          ImageCodec.decodeFrames(gif).zipWithIndex.map { case (f, i) =>
            (id, i, f.width, f.height, ImageCodec.pixelSha(f))
          }
        })
        .toDF("doc_id", "frame_idx", "width", "height", "frame_sha")
    },
    None) // codec output not SQL-expressible → golden-pinned + ExtSpec

  /** REAL video container demux: uncompressed-DIB AVI payloads walked
    * chunk-by-chunk by [[VideoCodec]] (RIFF/LIST, BITMAPINFOHEADER,
    * '00db' frames, idx1) — raw-frame video round-trips bit-exactly,
    * so unlike the GIF path there is not even palette quantization
    * between render and demux. Compressed codecs (h264) remain the
    * honest pure-JVM boundary; the CONTAINER walk no longer is. */
  val aviFrames = QueryDef(
    "multimodal_avi_frames",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      val avis = mediaTable(s, dir, "avi") {
        docRows(s, dir)
          .mapPartitions(_.map { case (id, text) =>
            (id, VideoCodec.renderAvi(id,
              Option(text).getOrElse("").getBytes("UTF-8")))
          })
          .toDF("doc_id", "payload")
      }
      avis.as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, avi) =>
          VideoCodec.decodeAviFrames(avi).zipWithIndex.map { case (f, i) =>
            (id, i, f.width, f.height, ImageCodec.pixelSha(f))
          }
        })
        .toDF("doc_id", "frame_idx", "width", "height", "frame_sha")
    },
    None) // codec output not SQL-expressible → golden-pinned + ExtSpec

  /** REAL audio decode: WAV payloads (genuine RIFF/WAVE bytes rendered
    * deterministically per doc) decoded by javax.sound.sampled — format
    * fields from the container, integer waveform statistics from the
    * PCM samples. Rounds out the media tier: image (PNG/JPEG), video
    * (multi-frame GIF), audio (WAV). */
  val audio = QueryDef(
    "multimodal_audio",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      val wavs = mediaTable(s, dir, "wav") {
        docRows(s, dir)
          .mapPartitions(_.map { case (id, text) =>
            (id, AudioCodec.renderWav(id,
              Option(text).getOrElse("").getBytes("UTF-8")))
          })
          .toDF("doc_id", "payload")
      }
      wavs.as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, wav) =>
          val d = AudioCodec.decodeWav(wav)
          val (peak, rms, zc) = AudioCodec.stats(d)
          (id, d.sampleRate, d.channels, d.nFrames, d.durationMs,
            peak, rms, zc)
        })
        .toDF("doc_id", "sample_rate", "channels", "n_frames",
          "duration_ms", "peak", "rms", "zero_crossings")
    },
    None) // codec output not SQL-expressible → golden-pinned + ExtSpec

  /** The library face: (doc_id, feature array<float>) — real grid-mean
    * image features from the decoded raster, unit-norm, feeding the
    * Similarity/Dedup operators downstream (tested in ExtSpec). */
  def featurizeFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val sp = s
    import sp.implicits._
    imagePayloads(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, ImageCodec.featurize(ImageCodec.decode(bytes), grid = 2))
      })
      .toDF("doc_id", "feature")
  }

  /** The query witness projects the vector to scalar columns (its
    * width and a digest of the exact IEEE bits): the driver's compare
    * harness sorts result columns pandas-side, where a raw array column
    * is unhashable — the round-2 multimodal_featurize row failed in the
    * harness, not the engine. Values stay fully pinned via the bit
    * digest.
    */
  val featurize = QueryDef(
    "multimodal_featurize",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      featurizeFrame(s, dir).as[(Long, Array[Float])]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("SHA-256")
          it.map { case (id, vec) =>
            val bb = java.nio.ByteBuffer.allocate(vec.length * 4)
            vec.foreach(bb.putFloat)
            val sha = md.digest(bb.array()).map("%02x".format(_)).mkString
            (id, vec.length, sha)
          }
        }
        .toDF("doc_id", "dim", "vec_sha")
    },
    None) // real features, but not SQL-expressible → golden-pinned

  /** Resize: decode the real PNG, deterministic nearest-neighbor
    * thumbnail, digest the resized raster — a genuine thumbnailer. */
  val resize = QueryDef(
    "multimodal_resize",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      val (tw, th) = (8, 8)
      imagePayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val d = ImageCodec.decode(bytes)
          val thumb = ImageCodec.resizeNearest(d, tw, th)
          (id, d.width, d.height, tw, th, ImageCodec.pixelSha(thumb))
        })
        .toDF("doc_id", "src_w", "src_h", "dst_w", "dst_h", "thumb_sha")
    },
    None) // codec output not SQL-expressible → golden-pinned + ExtSpec

  val all: Seq[QueryDef] =
    Seq(meta, decode, frames, videoFrames, aviFrames, audio, featurize,
      resize)
}
