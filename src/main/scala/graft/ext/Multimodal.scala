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
      : org.apache.spark.sql.DataFrame = {
    graft.SessionCaches.evictStopped(mediaCache)(_._1)
    mediaCache.computeIfAbsent((s, dir, kind),
      _ => graft.Work.materialize(s"media_$kind", render))
  }

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

  // --- decoded-raster tables for the DuckDB oracle --------------------
  //
  // The decode step itself is intrinsically un-oracle-able (DuckDB
  // cannot run a PNG/AVI/WAV codec), but everything AFTER decode is
  // plain integer arithmetic. Each codec key therefore materializes its
  // decoder's output ONCE per (session, sf dir) to a parquet at a FIXED
  // path both engines read: the Spark query re-decodes fresh every run
  // (the bench keys keep measuring the codec, not a parquet scan) and
  // emits arithmetic over the decoded values, while the oracle SQL
  // replays the identical arithmetic from the materialized rasters.
  // Decode correctness stays pinned by the GoldenSpec digests + the
  // ExtSpec round-trip tests; the oracle proves the post-decode math.
  // Pixels are stored masked to their 24 RGB bits (the alpha byte would
  // read as a negative INT32 in SQL, and the RGB bits are the content
  // identity the round-trip tests already use).

  /** Fixed per-sf-dir path under the work dir — deterministic so the
    * oracle SQL string can embed it. Contents are deterministic too
    * (decode of deterministic renders), so a session-level rebuild
    * overwrites with identical bytes. */
  private def rasterPath(dir: String, kind: String): String =
    s"${graft.Work.dir}/raster_${kind}_${graft.Work.publishTag(dir)}"

  /** The same path as a static oracle-SQL fragment: the sf-dir basename
    * is unknown until Verify runs, so the SQL carries the `@SF@` token,
    * which Verify substitutes when dumping oracle_sql.json. */
  private def rasterSqlPath(kind: String): String =
    s"${graft.Work.dir}/raster_${kind}_@SF@"

  private val rasterDone = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, String), String]

  private def ensureRaster(s: org.apache.spark.sql.SparkSession,
      dir: String, kind: String)(
      build: => org.apache.spark.sql.DataFrame): String = {
    graft.SessionCaches.evictStopped(rasterDone)(_._1)
    rasterDone.computeIfAbsent((s, dir, kind), { _ =>
      // The path is FIXED (the oracle SQL embeds it), so two JVMs
      // sharing the work dir (test suite beside Verify — the scenario
      // behind Work.jvmTag) must not write it concurrently or rewrite
      // it while the other JVM / the driver's DuckDB is mid-read.
      // Contents are deterministic (decode of deterministic renders),
      // so a completed raster (_SUCCESS present) is always valid —
      // skip the rebuild. Otherwise build into a jvm-tagged temp dir
      // and rename into place: the losing racer finds _SUCCESS and
      // drops its temp instead of colliding on _temporary/ (round-7
      // advice, medium). Contract: "existing raster is valid" holds
      // only while decode semantics are frozen — a decoder change must
      // bump the `kind` token (new path) or the skip serves stale
      // rasters to the oracle.
      // Work.publish carries the shared _SUCCESS-gated staging/rename
      // (and, since r17, the Hadoop-FS portability): this site
      // predated it with a hand-rolled clone — one discipline, one
      // place to port/audit (r16 verdict #1).
      graft.Work.publish(rasterPath(dir, kind)) { tmp =>
        build.write.mode("overwrite").parquet(tmp)
      }
    })
  }

  // channel extraction masks to 8 bits, so raw ARGB ints (alpha set)
  // and 24-bit-masked pixels sum identically — the query paths pass
  // argb directly (no per-frame masked copy); only the raster WRITES
  // mask, because the parquet the oracle reads must be non-negative
  // for the SQL div/mod channel extraction
  private def rgbSum(p: Int): Long =
    (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)).toLong

  /** Decoded PNG rasters: (doc_id, width, height, channels, px) with
    * px the row-major 24-bit RGB pixels. */
  private def pngRaster(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ensureRaster(s, dir, "png") {
      val sp = s
      import sp.implicits._
      imagePayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val d = ImageCodec.decode(bytes)
          (id, d.width, d.height, d.channels, d.argb.map(_ & 0xFFFFFF))
        })
        .toDF("doc_id", "width", "height", "channels", "px")
    }

  // the arithmetic both engines compute over a raster: plain and
  // position-weighted RGB sums — the weighted sum pins pixel ORDER
  // (a permuted raster matches the plain sum but not this one)
  private def pxSums(px: Array[Int]): (Long, Long) = {
    var s0 = 0L; var s1 = 0L; var i = 0
    while (i < px.length) {
      val v = rgbSum(px(i))
      s0 += v; s1 += (i + 1) * v
      i += 1
    }
    (s0, s1)
  }

  // DuckDB replay of pxSums over a LIST(INTEGER) column: channel
  // extraction via integer div/mod (shift semantics on signed values
  // differ across engines; div/mod on the masked non-negative pixels
  // do not), totals cast to BIGINT (DuckDB sums to HUGEINT, which the
  // driver's pandas hash sees as float64)
  private def sqlPxSum(px: String): String =
    s"CAST(list_sum(list_transform($px, p -> (p // 65536) + ((p // 256) % 256) + (p % 256))) AS BIGINT)"
  private def sqlPxWsum(px: String): String =
    s"CAST(list_sum(list_transform(range(1, len($px) + 1), i -> i * (($px[i] // 65536) + (($px[i] // 256) % 256) + ($px[i] % 256)))) AS BIGINT)"

  /** Payloads for the blank-image filter: the normal noise render for
    * most docs plus CONSTANT-color renders planted at doc_id % 17 == 0
    * — the corpus renders are all noise, so the filter's true branch
    * needs its own payload kind ("pngb"); the shared media_png stays
    * untouched for the other codec keys and the GoldenSpec digests. */
  private def blankPayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    mediaTable(s, dir, "pngb") {
      val sp = s
      import sp.implicits._
      docRows(s, dir)
        .mapPartitions(_.map { case (id, text) =>
          val bytes =
            if (id % 17 == 0) {
              val w = 16 + Math.floorMod(id, 17L).toInt
              val h = 16 + Math.floorMod(id / 17, 13L).toInt
              val c = Math.floorMod(id * 37L, 256L).toInt
              val px = Array.fill(w * h)(0xFF000000 | (c << 16) | (c << 8) | c)
              ImageCodec.encodePng(ImageCodec.DecodedImage(w, h, 3, px))
            } else ImageCodec.renderPng(id,
              Option(text).getOrElse("").getBytes("UTF-8"))
          (id, bytes)
        })
        .toDF("doc_id", "payload")
    }

  private def blankRaster(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ensureRaster(s, dir, "pngb") {
      val sp = s
      import sp.implicits._
      blankPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val d = ImageCodec.decode(bytes)
          (id, d.width, d.height, d.argb.map(_ & 0xFFFFFF))
        })
        .toDF("doc_id", "width", "height", "px")
    }

  /** Payloads for the silence filter: normal WAV renders plus SILENT
    * clips (all-zero PCM) planted at doc_id % 19 == 0 — own payload
    * kind ("wavs"), shared media_wav untouched. */
  private def silencePayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    mediaTable(s, dir, "wavs") {
      val sp = s
      import sp.implicits._
      docRows(s, dir)
        .mapPartitions(_.map { case (id, text) =>
          val bytes =
            if (id % 19 == 0)
              AudioCodec.encodeWav(
                new Array[Short](64 + Math.floorMod(id, 97L).toInt))
            else AudioCodec.renderWav(id,
              Option(text).getOrElse("").getBytes("UTF-8"))
          (id, bytes)
        })
        .toDF("doc_id", "payload")
    }

  /** Decoded PCM (widened to INT32) for the silence-filter oracle. */
  private def silenceRaster(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ensureRaster(s, dir, "wavs") {
      val sp = s
      import sp.implicits._
      silencePayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, wav) =>
          val d = AudioCodec.decodeWav(wav)
          (id, d.nFrames, d.samples.map(_.toInt))
        })
        .toDF("doc_id", "n_frames", "pcm")
    }

  val SilencePeakMax = 96L

  /** Audio silence filter (r12) — the audio face of
    * [[blankFilter]]: drop silent or near-silent clips (dead uploads,
    * DRM-stripped tracks) before transcription/embedding spend. Flag =
    * peak |sample| ≤ [[SilencePeakMax]] (~0.3% of int16 full scale —
    * noise-floor tolerance; exact zero is the planted case).
    * All-integer; oracle replays the peak fold from materialized PCM.
    * Scale: map-only decode + per-row fold, no shuffle. */
  val silenceFilter = QueryDef(
    "multimodal_silence_filter",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      silenceRaster(s, dir): Unit
      silencePayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, wav) =>
          val d = AudioCodec.decodeWav(wav)
          var peak = 0L
          var i = 0
          while (i < d.samples.length) {
            val a = math.abs(d.samples(i).toLong)
            if (a > peak) peak = a
            i += 1
          }
          (id, d.nFrames, peak, peak <= SilencePeakMax)
        })
        .toDF("doc_id", "n_frames", "peak_abs", "is_silent")
    },
    Some(s"""
      WITH p AS (
        SELECT doc_id, n_frames,
               CAST(coalesce(list_max(list_transform(pcm, v -> abs(v))), 0)
                 AS BIGINT) AS peak_abs
        FROM read_parquet('${rasterSqlPath("wavs")}/*.parquet'))
      SELECT doc_id, n_frames, peak_abs,
             (peak_abs <= $SilencePeakMax) AS is_silent
      FROM p"""))

  /** Payloads with PLANTED metadata: the normal PNG render plus a tEXt
    * chunk (`comment\0src=<doc_id>`) spliced after IHDR — real chunk
    * surgery with a real CRC, own payload kind ("pngm"). */
  private def metaPayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    mediaTable(s, dir, "pngm") {
      val sp = s
      import sp.implicits._
      docRows(s, dir)
        .mapPartitions(_.map { case (id, text) =>
          (id, ImageCodec.insertTextChunk(
            ImageCodec.renderPng(id,
              Option(text).getOrElse("").getBytes("UTF-8")),
            "comment", s"src=$id"))
        })
        .toDF("doc_id", "payload")
    }

  /** Metadata stripping (r12) — the privacy pass (EXIF-strip analog)
    * before republishing crawled media: drop ancillary text chunks
    * (tEXt/zTXt/iTXt) from the PNG container, keep every byte of the
    * image data. The oracle is fully SQL-computable: the planted chunk
    * is 12 + len('comment') + 1 + len('src=<id>') bytes, so
    * bytes_removed = 24 + len(CAST(doc_id AS VARCHAR)) exactly, and
    * the decoded pixel sums of the CLEANED bytes must equal the
    * pristine render's rasters (raster_png — stripping metadata cannot
    * touch pixels). Scale: map-only byte-level chunk walk, no decode
    * needed for the strip itself, no shuffle.
    */
  val stripMetadata = QueryDef(
    "multimodal_strip_metadata",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      pngRaster(s, dir): Unit
      metaPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, dirty) =>
          val (clean, removed) = ImageCodec.stripTextChunks(dirty)
          val d = ImageCodec.decode(clean)
          val (ps, pw) = pxSums(d.argb)
          (id, removed, (dirty.length - clean.length).toLong, ps, pw)
        })
        .toDF("doc_id", "n_stripped", "bytes_removed",
          "px_sum", "px_wsum")
    },
    Some(s"""
      SELECT doc_id, 1 AS n_stripped,
             CAST(24 + length(CAST(doc_id AS VARCHAR)) AS BIGINT)
               AS bytes_removed,
             ${sqlPxSum("px")} AS px_sum, ${sqlPxWsum("px")} AS px_wsum
      FROM read_parquet('${rasterSqlPath("png")}/*.parquet')"""))

  val BlankSpreadMax = 24L

  /** Blank/solid-image filter (r12) — the LAION/DataComp curation gate
    * that drops placeholder, tracking-pixel, and solid-color images
    * before any embedding or dedup spend: decode, take per-channel
    * min/max over the raster, flag when the summed RGB spread is at or
    * under [[BlankSpreadMax]] (0 = perfectly solid; a small tolerance
    * keeps lightly-dithered blanks out too). All-integer — the oracle
    * replays min/max/spread from the materialized rasters. Planted
    * constant-color images at doc_id % 17 == 0 witness the true
    * branch; every noise render sits far above the threshold.
    * Scale: map-only decode + per-row fold, no shuffle. */
  val blankFilter = QueryDef(
    "multimodal_blank_filter",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      blankRaster(s, dir): Unit
      blankPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val d = ImageCodec.decode(bytes)
          var minR = 255; var maxR = 0; var minG = 255; var maxG = 0
          var minB = 255; var maxB = 0
          var i = 0
          while (i < d.argb.length) {
            val p = d.argb(i)
            val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF
            val b = p & 0xFF
            if (r < minR) minR = r; if (r > maxR) maxR = r
            if (g < minG) minG = g; if (g > maxG) maxG = g
            if (b < minB) minB = b; if (b > maxB) maxB = b
            i += 1
          }
          val spread = (maxR - minR) + (maxG - minG) + (maxB - minB)
          (id, d.width, d.height, spread.toLong,
            spread.toLong <= BlankSpreadMax)
        })
        .toDF("doc_id", "width", "height", "rgb_spread", "is_blank")
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id, width, height,
               CAST((list_max(list_transform(px, p -> p // 65536))
                   - list_min(list_transform(px, p -> p // 65536)))
                 + (list_max(list_transform(px, p -> (p // 256) % 256))
                   - list_min(list_transform(px, p -> (p // 256) % 256)))
                 + (list_max(list_transform(px, p -> p % 256))
                   - list_min(list_transform(px, p -> p % 256)))
                 AS BIGINT) AS rgb_spread
        FROM read_parquet('${rasterSqlPath("pngb")}/*.parquet'))
      SELECT doc_id, width, height, rgb_spread,
             (rgb_spread <= $BlankSpreadMax) AS is_blank
      FROM b"""))

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

  /** The pinned digest face of decode: PNG payload → javax.imageio
    * raster → (dims, channels, pixel digest). The pixel digest, not the
    * container bytes, is the content identity — codecs may legally vary
    * the encoded stream. GoldenSpec pins this frame's full content
    * hash; the query key ([[decode]]) emits the DuckDB-replayable
    * arithmetic face instead. */
  def decodeDigest(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val sp = s
    import sp.implicits._
    imagePayloads(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val d = ImageCodec.decode(bytes)
        (id, bytes.length, d.width, d.height, d.channels,
          ImageCodec.pixelSha(d))
      })
      .toDF("doc_id", "n_bytes", "width", "height", "channels", "pixel_sha")
  }

  /** Real image decode via per-partition batches, witnessed by integer
    * raster arithmetic the oracle replays from the materialized decoded
    * rasters ([[pngRaster]]): plain + position-weighted RGB sums pin
    * every pixel value AND its position. The decode runs fresh in the
    * query (the key benches the codec); only the oracle's copy of the
    * rasters is read from parquet. */
  val decode = QueryDef(
    "multimodal_decode",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      pngRaster(s, dir): Unit
      imagePayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val d = ImageCodec.decode(bytes)
          val (ps, pw) = pxSums(d.argb)
          (id, d.width, d.height, d.channels, ps, pw)
        })
        .toDF("doc_id", "width", "height", "channels", "px_sum", "px_wsum")
    },
    Some(s"""
      SELECT doc_id, width, height, channels,
             ${sqlPxSum("px")} AS px_sum, ${sqlPxWsum("px")} AS px_wsum
      FROM read_parquet('${rasterSqlPath("png")}/*.parquet')"""))

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

  /** GIF payloads per doc, materialized once per session. */
  private def gifPayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    mediaTable(s, dir, "gif") {
      val sp = s
      import sp.implicits._
      docRows(s, dir)
        .mapPartitions(_.map { case (id, text) =>
          (id, ImageCodec.renderGif(id,
            Option(text).getOrElse("").getBytes("UTF-8")))
        })
        .toDF("doc_id", "payload")
    }

  /** Pinned digest face of the GIF demux (GoldenSpec). */
  def videoFramesDigest(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val sp = s
    import sp.implicits._
    gifPayloads(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, gif) =>
        ImageCodec.decodeFrames(gif).zipWithIndex.map { case (f, i) =>
          (id, i, f.width, f.height, ImageCodec.pixelSha(f))
        }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "frame_sha")
  }

  /** Per-frame rasters of the GIF demux, for the oracle. */
  private def gifRaster(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ensureRaster(s, dir, "gif") {
      val sp = s
      import sp.implicits._
      gifPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, gif) =>
          ImageCodec.decodeFrames(gif).zipWithIndex.map { case (f, i) =>
            (id, i, f.width, f.height, f.argb.map(_ & 0xFFFFFF))
          }
        })
        .toDF("doc_id", "frame_idx", "width", "height", "px")
    }

  /** REAL multi-frame demux: animated-GIF payloads (rendered
    * deterministically per doc, genuine container bytes) demuxed by
    * the actual javax.imageio codec — frame count from the stream, one
    * output row per frame with dimensions and position-weighted pixel
    * sums the oracle replays from the materialized per-frame rasters.
    * This is the "video" face the byte-window sampler ([[frames]])
    * stubs; pixel digests stay pinned via [[videoFramesDigest]]. */
  val videoFrames = QueryDef(
    "multimodal_video_frames",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      gifRaster(s, dir): Unit
      gifPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, gif) =>
          ImageCodec.decodeFrames(gif).zipWithIndex.map { case (f, i) =>
            val (ps, pw) = pxSums(f.argb)
            (id, i, f.width, f.height, ps, pw)
          }
        })
        .toDF("doc_id", "frame_idx", "width", "height", "px_sum", "px_wsum")
    },
    Some(s"""
      SELECT doc_id, frame_idx, width, height,
             ${sqlPxSum("px")} AS px_sum, ${sqlPxWsum("px")} AS px_wsum
      FROM read_parquet('${rasterSqlPath("gif")}/*.parquet')"""))

  /** AVI payloads per doc, materialized once per session. */
  private def aviPayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    mediaTable(s, dir, "avi") {
      val sp = s
      import sp.implicits._
      docRows(s, dir)
        .mapPartitions(_.map { case (id, text) =>
          (id, VideoCodec.renderAvi(id,
            Option(text).getOrElse("").getBytes("UTF-8")))
        })
        .toDF("doc_id", "payload")
    }

  /** Pinned digest face of the AVI demux (GoldenSpec). */
  def aviFramesDigest(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val sp = s
    import sp.implicits._
    aviPayloads(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, avi) =>
        VideoCodec.decodeAviFrames(avi).zipWithIndex.map { case (f, i) =>
          (id, i, f.width, f.height, ImageCodec.pixelSha(f))
        }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "frame_sha")
  }

  /** Per-frame rasters of the AVI demux, for the oracle. */
  private def aviRaster(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ensureRaster(s, dir, "avi") {
      val sp = s
      import sp.implicits._
      aviPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, avi) =>
          VideoCodec.decodeAviFrames(avi).zipWithIndex.map { case (f, i) =>
            (id, i, f.width, f.height, f.argb.map(_ & 0xFFFFFF))
          }
        })
        .toDF("doc_id", "frame_idx", "width", "height", "px")
    }

  /** REAL video container demux: uncompressed-DIB AVI payloads walked
    * chunk-by-chunk by [[VideoCodec]] (RIFF/LIST, BITMAPINFOHEADER,
    * '00db' frames, idx1) — raw-frame video round-trips bit-exactly,
    * so unlike the GIF path there is not even palette quantization
    * between render and demux. Compressed codecs (h264) remain the
    * honest pure-JVM boundary; the CONTAINER walk no longer is.
    * Witnessed by per-frame pixel arithmetic the oracle replays from
    * the materialized rasters; digests pinned via [[aviFramesDigest]]. */
  val aviFrames = QueryDef(
    "multimodal_avi_frames",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      aviRaster(s, dir): Unit
      aviPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, avi) =>
          VideoCodec.decodeAviFrames(avi).zipWithIndex.map { case (f, i) =>
            val (ps, pw) = pxSums(f.argb)
            (id, i, f.width, f.height, ps, pw)
          }
        })
        .toDF("doc_id", "frame_idx", "width", "height", "px_sum", "px_wsum")
    },
    Some(s"""
      SELECT doc_id, frame_idx, width, height,
             ${sqlPxSum("px")} AS px_sum, ${sqlPxWsum("px")} AS px_wsum
      FROM read_parquet('${rasterSqlPath("avi")}/*.parquet')"""))

  /** MJPEG-AVI payloads per doc, materialized once per session. */
  private def mjpegPayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    mediaTable(s, dir, "mjpeg") {
      val sp = s
      import sp.implicits._
      docRows(s, dir)
        .mapPartitions(_.map { case (id, text) =>
          (id, VideoCodec.renderAviMjpeg(id,
            Option(text).getOrElse("").getBytes("UTF-8")))
        })
        .toDF("doc_id", "payload")
    }

  /** Per-frame rasters of the MJPEG demux+decode, for the oracle. */
  private def mjpegRaster(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ensureRaster(s, dir, "mjpeg") {
      val sp = s
      import sp.implicits._
      mjpegPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, avi) =>
          VideoCodec.decodeAviFrames(avi).zipWithIndex.map { case (f, i) =>
            (id, i, f.width, f.height, f.argb.map(_ & 0xFFFFFF))
          }
        })
        .toDF("doc_id", "frame_idx", "width", "height", "px")
    }

  /** COMPRESSED video decode: MJPEG-in-AVI payloads — each '00dc' chunk
    * an independent baseline JPEG the JVM's own codec decodes — demuxed
    * by the same RIFF walk as [[aviFrames]] and entropy-decoded per
    * frame. This moves a real compressed codec inside the pure-JVM
    * line: what remains out is inter-frame codecs (h264/vp9), which
    * have no JVM decoder. JPEG is lossy, so unlike the DIB path the
    * decoded rasters are never golden-pinned; the ExtSpec round-trip
    * asserts a per-channel error bound on smooth content instead, and
    * the oracle replays pixel arithmetic from the once-materialized
    * decoded rasters (the post-decode contract, like every codec key).
    */
  val mjpegFrames = QueryDef(
    "multimodal_mjpeg_frames",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      mjpegRaster(s, dir): Unit
      mjpegPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, avi) =>
          VideoCodec.decodeAviFrames(avi).zipWithIndex.map { case (f, i) =>
            val (ps, pw) = pxSums(f.argb)
            (id, i, f.width, f.height, ps, pw)
          }
        })
        .toDF("doc_id", "frame_idx", "width", "height", "px_sum", "px_wsum")
    },
    Some(s"""
      SELECT doc_id, frame_idx, width, height,
             ${sqlPxSum("px")} AS px_sum, ${sqlPxWsum("px")} AS px_wsum
      FROM read_parquet('${rasterSqlPath("mjpeg")}/*.parquet')"""))

  /** REAL audio decode: WAV payloads (genuine RIFF/WAVE bytes rendered
    * deterministically per doc) decoded by javax.sound.sampled — format
    * fields from the container, integer waveform statistics from the
    * PCM samples. Rounds out the media tier: image (PNG/JPEG), video
    * (multi-frame GIF), audio (WAV). */
  /** WAV payloads per doc, materialized once per session. */
  private def wavPayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    mediaTable(s, dir, "wav") {
      val sp = s
      import sp.implicits._
      docRows(s, dir)
        .mapPartitions(_.map { case (id, text) =>
          (id, AudioCodec.renderWav(id,
            Option(text).getOrElse("").getBytes("UTF-8")))
        })
        .toDF("doc_id", "payload")
    }

  /** Decoded PCM streams for the oracle: (doc_id, sample_rate,
    * channels, samples) — samples widened to INT32 (parquet has no
    * INT16 list DuckDB and Spark agree on more simply). */
  private def pcmRaster(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ensureRaster(s, dir, "wav") {
      val sp = s
      import sp.implicits._
      wavPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, wav) =>
          val d = AudioCodec.decodeWav(wav)
          (id, d.sampleRate, d.channels, d.samples.map(_.toInt))
        })
        .toDF("doc_id", "sample_rate", "channels", "samples")
    }

  val audio = QueryDef(
    "multimodal_audio",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      pcmRaster(s, dir): Unit
      wavPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, wav) =>
          val d = AudioCodec.decodeWav(wav)
          val (peak, rms, zc) = AudioCodec.stats(d)
          (id, d.sampleRate, d.channels, d.nFrames, d.durationMs,
            peak, rms, zc)
        })
        .toDF("doc_id", "sample_rate", "channels", "n_frames",
          "duration_ms", "peak", "rms", "zero_crossings")
    },
    // format fields and waveform statistics replayed over the decoded
    // PCM parquet: integer peak/zero-crossings exactly; RMS via
    // int64→double division and sqrt, both exactly rounded in IEEE 754,
    // then floored — bit-identical to AudioCodec.stats. Mono PCM16:
    // n_frames = len(samples) / channels (channels is 1 in the data,
    // division kept for the general shape).
    Some(s"""
      SELECT doc_id, sample_rate, channels,
             CAST(len(samples) // channels AS BIGINT) AS n_frames,
             CAST(len(samples) // channels * 1000 // sample_rate AS BIGINT)
               AS duration_ms,
             CAST(COALESCE(
               list_max(list_transform(samples, v -> abs(v))), 0) AS INT)
               AS peak,
             CAST(COALESCE(floor(sqrt(
               CAST(list_sum(list_transform(samples, v -> CAST(v AS BIGINT) * v)) AS DOUBLE)
               / len(samples))), 0) AS BIGINT) AS rms,
             CAST(COALESCE(list_sum(list_transform(range(2, len(samples) + 1),
               i -> CASE WHEN (samples[i-1] < 0) != (samples[i] < 0)
                         THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings
      FROM read_parquet('${rasterSqlPath("wav")}/*.parquet')"""))

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

  /** Pinned digest face of featurize (GoldenSpec): vector width plus a
    * digest of the exact IEEE bits — the float pipeline's regression
    * net (the driver's pandas harness can't hash a raw array column;
    * round-2 finding). */
  def featurizeDigest(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
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
  }

  /** The query witness emits the feature extractor's integer core — per
    * grid cell: channel sums and pixel count, exactly the accumulators
    * [[ImageCodec.featurize]] folds before its one division per cell —
    * which the oracle replays from the materialized rasters (the float
    * normalization after the division is pinned by [[featurizeDigest]]'s
    * bit digest; a float column itself would hash fragilely across
    * engines). One exploded row per (doc, cell): grid=2 → 4 rows/doc. */
  val featurize = QueryDef(
    "multimodal_featurize",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      pngRaster(s, dir): Unit
      imagePayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, bytes) =>
          val d = ImageCodec.decode(bytes)
          val grid = 2
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
          (0 until grid * grid).map(c =>
            (id, c, sums(c)(0), sums(c)(1), sums(c)(2), counts(c)))
        })
        .toDF("doc_id", "cell", "r_sum", "g_sum", "b_sum", "n_px")
    },
    // replay: pixel i at (y = i // w, x = i % w) lands in cell
    // min(y*2 // h, 1) * 2 + min(x*2 // w, 1); channel extraction by
    // div/mod over the masked 24-bit pixels
    Some(s"""
      WITH e AS (
        SELECT doc_id, width AS w, height AS h, px,
               unnest(range(0, width * height)) AS i
        FROM read_parquet('${rasterSqlPath("png")}/*.parquet'))
      SELECT doc_id,
             CAST(least((i // w) * 2 // h, 1) * 2
                  + least((i % w) * 2 // w, 1) AS INT) AS cell,
             CAST(sum(px[CAST(i + 1 AS INT)] // 65536) AS BIGINT) AS r_sum,
             CAST(sum((px[CAST(i + 1 AS INT)] // 256) % 256) AS BIGINT) AS g_sum,
             CAST(sum(px[CAST(i + 1 AS INT)] % 256) AS BIGINT) AS b_sum,
             CAST(count(*) AS BIGINT) AS n_px
      FROM e
      GROUP BY 1, 2"""))

  /** Pinned digest face of resize (GoldenSpec). */
  def resizeDigest(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
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
  }

  /** Resize: decode the real PNG, deterministic nearest-neighbor
    * thumbnail — witnessed by the thumbnail's plain + position-weighted
    * RGB sums, which the oracle replays from the materialized source
    * rasters by re-deriving each thumb pixel's source index (floor
    * sampling: thumb (y,x) reads source (y*h//8, x*w//8)). The thumb
    * digest stays pinned via [[resizeDigest]]. */
  val resize = QueryDef(
    "multimodal_resize",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      val (tw, th) = (8, 8)
      pngRaster(s, dir): Unit
      imagePayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val d = ImageCodec.decode(bytes)
          val thumb = ImageCodec.resizeNearest(d, tw, th)
          val (ts, tw2) = pxSums(thumb.argb)
          (id, d.width, d.height, tw, th, ts, tw2)
        })
        .toDF("doc_id", "src_w", "src_h", "dst_w", "dst_h",
          "thumb_sum", "thumb_wsum")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, width AS w, height AS h, px,
               unnest(range(0, 64)) AS i
        FROM read_parquet('${rasterSqlPath("png")}/*.parquet')),
      p AS (
        SELECT doc_id, w, h, i,
               px[CAST((i // 8) * h // 8 * w + (i % 8) * w // 8 + 1 AS INT)]
                 AS v
        FROM t)
      SELECT doc_id, w AS src_w, h AS src_h,
             CAST(8 AS INT) AS dst_w, CAST(8 AS INT) AS dst_h,
             CAST(sum((v // 65536) + ((v // 256) % 256) + (v % 256))
               AS BIGINT) AS thumb_sum,
             CAST(sum((i + 1) * ((v // 65536) + ((v // 256) % 256) + (v % 256)))
               AS BIGINT) AS thumb_wsum
      FROM p
      GROUP BY doc_id, w, h"""))

  // --- perceptual-hash image dedup ------------------------------------

  private val PhashTwinOffset = 1000000000L
  private val PhashHamMax = 3

  /** Base PNG corpus plus deterministic NEAR-DUPLICATE twins — the
    * planted structure an image-dedup operator must recover (the
    * LAION/DataComp pipeline step; text dedup's plantedCorpus pattern,
    * in pixels). Every `doc_id % 37 == 0` image is re-encoded with 4
    * pixels recolored at positions the 8×8 thumbnail's floor sampling
    * never reads, so each twin is a DIFFERENT payload (different
    * bytes, different full-raster digest) whose perceptual hash is
    * identical by construction — recall is decidable, not
    * probabilistic. Twin ids offset by +1e9. Materialized once per
    * session like every media table.
    */
  def phashPayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    {
      // resolve the base table BEFORE entering the cache: a nested
      // computeIfAbsent on the same map throws "Recursive update"
      // (surfaced by the isolated-key bench, where no earlier key had
      // populated the png entry)
      val baseDf = imagePayloads(s, dir)
      mediaTable(s, dir, "phash") {
      val sp = s
      import sp.implicits._
      val base = baseDf.as[(Long, Array[Byte])]
      val twins = base.filter(_._1 % 37 == 0).mapPartitions(_.map {
        case (id, bytes) =>
          val d = ImageCodec.decode(bytes)
          val px = d.argb.clone()
          val sampled = (for (y <- 0 until 8; x <- 0 until 8)
            yield (y * d.height / 8) * d.width + x * d.width / 8).toSet
          var changed = 0
          var i = 0
          while (changed < 4 && i < px.length) {
            if (!sampled(i)) { px(i) = 0xFFFF00FF; changed += 1 }
            i += 1
          }
          (id + PhashTwinOffset, ImageCodec.encodePng(
            ImageCodec.DecodedImage(d.width, d.height, 3, px)))
      })
      base.union(twins).toDF("doc_id", "payload")
      }
    }

  /** 8×8 thumbnail rasters of the phash corpus (base + twins),
    * materialized for the oracle — 64 masked pixels per doc. Decode +
    * resize correctness is pinned upstream (GoldenSpec digests, the
    * resize oracle's source-index replay); this table lets the oracle
    * prove all the post-resize hash arithmetic. */
  private def phashThumbRaster(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ensureRaster(s, dir, "phash") {
      val sp = s
      import sp.implicits._
      phashPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val t = ImageCodec.resizeNearest(ImageCodec.decode(bytes), 8, 8)
          (id, t.width, t.height, t.argb.map(_ & 0xFFFFFF))
        })
        .toDF("doc_id", "width", "height", "px")
    }

  /** 64-bit average-hash (aHash) per image, as 4×16-bit band columns:
    * decode → nearest-neighbor 8×8 → per-cell gray (R+G+B, 0..765) →
    * bit c set iff 64·gray_c ≥ Σgray (all-integer mean compare — no
    * float enters the hash, so the oracle replays it exactly). Band
    * columns instead of one packed i64 keep every value a small
    * non-negative int — xor/bit_count then agree across engines
    * without the signed-overflow replay dance the 64-bit SimHash
    * needs. */
  /** aHash band arithmetic over an 8×8 thumb — shared by the image and
    * video hashes (and mirrored for audio over frame energies). */
  private def aHashBands(t: ImageCodec.DecodedImage): IndexedSeq[Int] = {
    val gray = t.argb.map(p =>
      ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF))
    val tot = gray.foldLeft(0L)(_ + _)
    val bits = gray.map(g => if (64L * g >= tot) 1 else 0)
    (0 until 4).map(k => (0 until 16).map(j => bits(16 * k + j) << j).sum)
  }

  def phashBandsOf(payloads: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sp = payloads.sparkSession
    import sp.implicits._
    payloads.as[(Long, Array[Byte])].mapPartitions(_.map {
      case (id, bytes) =>
        val b = aHashBands(
          ImageCodec.resizeNearest(ImageCodec.decode(bytes), 8, 8))
        (id, b(0), b(1), b(2), b(3))
    }).toDF("doc_id", "b0", "b1", "b2", "b3")
  }

  /** Near-dup image pairs by pigeonhole banding over the aHash — the
    * identical candidate discipline as the text SimHash join: two
    * hashes within hamming ≤ 3 agree exactly on ≥1 of the 4 bands, so
    * the (band, value) equi-join has recall 1.0 by construction and is
    * NEVER all-pairs; the exact-hamming verify gives precision 1.0.
    * On these pseudorandom renders chance band collisions are
    * n²·4/2¹⁶ — bounded, and the 128-bit two-word escalation path
    * documented at dedup_simhash128_pairs applies unchanged if a real
    * corpus needs it. One shuffle on the band key.
    */
  def phashPairs(sigs: org.apache.spark.sql.DataFrame,
      maxHamming: Int = PhashHamMax): org.apache.spark.sql.DataFrame = {
    require(maxHamming < 4, "pigeonhole over 4 bands covers hamming <= 3")
    val banded = sigs.select(col("doc_id"), col("b0"), col("b1"),
      col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .toDF("doc_id", "b0", "b1", "b2", "b3", "band", "bval")
    val hamming = (0 until 4).map(k =>
      bit_count(col(s"x.b$k").bitwiseXOR(col(s"y.b$k")))).reduce(_ + _)
    banded.alias("x").join(banded.alias("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        hamming.cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Image near-dup dedup over real PNG payloads. The oracle replays
    * hash + pairs from the materialized thumbs with an O(n²) exact
    * join — at oracle scale that is trivial, and its equality with the
    * banded plan PROVES the pigeonhole candidate generation lossless
    * (the same exact-oracle discipline as dedup_simhash_pairs). */
  val phashDedup = QueryDef(
    "multimodal_phash_dedup",
    (s, dir) => {
      phashThumbRaster(s, dir): Unit
      phashPairs(graft.Work.materialize("phash_sigs",
        phashBandsOf(phashPayloads(s, dir))))
    },
    Some(s"""
      WITH e AS (
        SELECT doc_id, unnest(range(0, 64)) AS i, px
        FROM read_parquet('${rasterSqlPath("phash")}/*.parquet')),
      p AS (
        SELECT doc_id, CAST(i AS INT) AS i,
               px[CAST(i + 1 AS INT)] // 65536
                 + (px[CAST(i + 1 AS INT)] // 256) % 256
                 + px[CAST(i + 1 AS INT)] % 256 AS g
        FROM e),
      t AS (SELECT doc_id, CAST(sum(g) AS BIGINT) AS tot FROM p GROUP BY 1),
      bits AS (
        SELECT p.doc_id, p.i,
               CASE WHEN 64 * p.g >= t.tot THEN 1 ELSE 0 END AS bit
        FROM p JOIN t USING (doc_id)),
      bands AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN i // 16 = 0 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b0,
               CAST(sum(CASE WHEN i // 16 = 1 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b1,
               CAST(sum(CASE WHEN i // 16 = 2 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b2,
               CAST(sum(CASE WHEN i // 16 = 3 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b3
        FROM bits GROUP BY 1)
      SELECT x.doc_id AS a, y.doc_id AS b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
               AS BIGINT) AS hamming
      FROM bands x JOIN bands y ON x.doc_id < y.doc_id
      WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
          <= $PhashHamMax"""))

  // --- audio envelope-hash dedup --------------------------------------

  /** 64-frame energy envelope of a decoded PCM stream: frame f sums
    * |sample| over samples [f·n/64, (f+1)·n/64) — all-integer, the
    * audio analog of the 8×8 gray thumbnail. The frame index is
    * computed in Long: i*64 in Int overflows past ~33.5M samples
    * (≈12 min at 48 kHz — well inside real podcast/audiobook inputs),
    * which would scatter energies across frames and corrupt the hash. */
  def awhashEnergies(d: AudioCodec.DecodedAudio): Array[Long] = {
    val n = d.samples.length
    val e = new Array[Long](64)
    var i = 0
    while (i < n) {
      e((i.toLong * 64 / n).toInt) += math.abs(d.samples(i).toInt)
      i += 1
    }
    e
  }

  /** Base WAV corpus plus deterministic near-duplicate twins: every
    * `doc_id % 41 == 0` stream re-encoded with one +1/−1 tweak applied
    * to an adjacent same-sign, same-frame sample pair — the frame's
    * |·|-energy sum is EXACTLY unchanged, so the twin has different
    * payload bytes but an identical envelope hash (the phash twin
    * trick, in samples). Twin ids offset by +1e9. */
  def awhashPayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    {
      // same pre-resolution as phashPayloads: no nested computeIfAbsent
      val baseDf = wavPayloads(s, dir)
      mediaTable(s, dir, "awhash") {
      val sp = s
      import sp.implicits._
      val base = baseDf.as[(Long, Array[Byte])]
      val twins = base.filter(_._1 % 41 == 0).mapPartitions(_.map {
        case (id, wav) =>
          val d = AudioCodec.decodeWav(wav)
          val px = d.samples.clone()
          val n = px.length
          var j = 0
          var done = false
          while (!done && j + 1 < n) {
            // Long index arithmetic, matching awhashEnergies exactly
            val sameFrame = j.toLong * 64 / n == (j + 1).toLong * 64 / n
            val a = px(j).toInt
            val b = px(j + 1).toInt
            if (sameFrame &&
                ((a > 0 && b > 0 && a < Short.MaxValue && b > 1) ||
                 (a < 0 && b < 0 && a > Short.MinValue + 1 && b < -1))) {
              // same sign, no clip risk: |a±1| + |b∓1| == |a| + |b|
              if (a > 0) { px(j) = (a + 1).toShort; px(j + 1) = (b - 1).toShort }
              else { px(j) = (a - 1).toShort; px(j + 1) = (b + 1).toShort }
              done = true
            }
            j += 1
          }
          (id + PhashTwinOffset, AudioCodec.encodeWav(px))
      })
      base.union(twins).toDF("doc_id", "payload")
      }
    }

  /** Envelope tables for the oracle — 64 frame energies per doc. */
  private def awhashEnergyRaster(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ensureRaster(s, dir, "awhash") {
      val sp = s
      import sp.implicits._
      awhashPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, wav) =>
          (id, awhashEnergies(AudioCodec.decodeWav(wav)))
        })
        .toDF("doc_id", "e")
    }

  /** 64-bit envelope hash per audio stream as 4×16-bit bands — bit f
    * set iff 64·energy_f ≥ Σenergy, the same all-integer mean compare
    * as the image aHash, so the DuckDB replay is exact. */
  def awhashBandsOf(payloads: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sp = payloads.sparkSession
    import sp.implicits._
    payloads.as[(Long, Array[Byte])].mapPartitions(_.map {
      case (id, wav) =>
        val e = awhashEnergies(AudioCodec.decodeWav(wav))
        val tot = e.sum
        val bits = e.map(v => if (64L * v >= tot) 1 else 0)
        val bands = (0 until 4).map(k =>
          (0 until 16).map(j => bits(16 * k + j) << j).sum)
        (id, bands(0), bands(1), bands(2), bands(3))
    }).toDF("doc_id", "b0", "b1", "b2", "b3")
  }

  /** Audio near-dup dedup over real WAV payloads — the audio face of
    * [[phashDedup]], sharing its banded pair join verbatim (the band
    * schema is the contract, not the modality). Same exact-O(n²)
    * oracle discipline proving the pigeonhole candidates lossless. */
  val awhashDedup = QueryDef(
    "multimodal_awhash_dedup",
    (s, dir) => {
      awhashEnergyRaster(s, dir): Unit
      phashPairs(graft.Work.materialize("awhash_sigs",
        awhashBandsOf(awhashPayloads(s, dir))))
    },
    Some(s"""
      WITH x AS (
        SELECT doc_id, unnest(range(0, 64)) AS i, e
        FROM read_parquet('${rasterSqlPath("awhash")}/*.parquet')),
      p AS (
        SELECT doc_id, CAST(i AS INT) AS i,
               e[CAST(i + 1 AS INT)] AS g
        FROM x),
      t AS (SELECT doc_id, CAST(sum(g) AS BIGINT) AS tot FROM p GROUP BY 1),
      bits AS (
        SELECT p.doc_id, p.i,
               CASE WHEN 64 * p.g >= t.tot THEN 1 ELSE 0 END AS bit
        FROM p JOIN t USING (doc_id)),
      bands AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN i // 16 = 0 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b0,
               CAST(sum(CASE WHEN i // 16 = 1 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b1,
               CAST(sum(CASE WHEN i // 16 = 2 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b2,
               CAST(sum(CASE WHEN i // 16 = 3 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b3
        FROM bits GROUP BY 1)
      SELECT x.doc_id AS a, y.doc_id AS b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
               AS BIGINT) AS hamming
      FROM bands x JOIN bands y ON x.doc_id < y.doc_id
      WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
          <= $PhashHamMax"""))

  // --- video keyframe-hash dedup --------------------------------------

  /** Base AVI corpus plus deterministic near-duplicate twins
    * (`doc_id % 43 == 0`, ids +1e9): the MIDDLE frame gets the phash
    * pixel tweak (4 recolors at positions the 8×8 floor sampling never
    * reads) and every OTHER frame gets 4 arbitrary recolors — the twin
    * differs across multiple frames yet its keyframe hash is identical
    * by construction. */
  def vhashPayloads(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val baseDf = aviPayloads(s, dir) // resolve before the cache (no
                                     // nested computeIfAbsent)
    mediaTable(s, dir, "vhash") {
      val sp = s
      import sp.implicits._
      val base = baseDf.as[(Long, Array[Byte])]
      val twins = base.filter(_._1 % 43 == 0).mapPartitions(_.map {
        case (id, avi) =>
          val fs = VideoCodec.decodeAviFrames(avi)
          val mid = (fs.length - 1) / 2
          val out = fs.zipWithIndex.map { case (f, i) =>
            val px = f.argb.clone()
            if (i == mid) {
              val sampled = (for (y <- 0 until 8; x <- 0 until 8)
                yield (y * f.height / 8) * f.width + x * f.width / 8).toSet
              var changed = 0
              var j = 0
              while (changed < 4 && j < px.length) {
                if (!sampled(j)) { px(j) = 0xFFFF00FF; changed += 1 }
                j += 1
              }
            } else {
              var j = 0
              while (j < 4 && j < px.length) { px(j) = 0xFF00FF00; j += 1 }
            }
            ImageCodec.DecodedImage(f.width, f.height, 3, px)
          }
          (id + PhashTwinOffset, VideoCodec.encodeAvi(out))
      })
      base.union(twins).toDF("doc_id", "payload")
    }
  }

  /** Middle-frame 8×8 thumbs for the oracle. */
  private def vhashThumbRaster(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    ensureRaster(s, dir, "vhash") {
      val sp = s
      import sp.implicits._
      vhashPayloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, avi) =>
          val fs = VideoCodec.decodeAviFrames(avi)
          val t = ImageCodec.resizeNearest(fs((fs.length - 1) / 2), 8, 8)
          (id, t.width, t.height, t.argb.map(_ & 0xFFFFFF))
        })
        .toDF("doc_id", "width", "height", "px")
    }

  /** Keyframe aHash per video — demux the REAL AVI container, hash the
    * middle frame through the shared [[aHashBands]] arithmetic. The
    * standard thumbnail-dedup first pass; a full temporal variant
    * (per-frame hashes, any-frame band match, aligned-frame verify)
    * composes from the same pieces when a corpus needs it. */
  def vhashBandsOf(payloads: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val sp = payloads.sparkSession
    import sp.implicits._
    payloads.as[(Long, Array[Byte])].mapPartitions(_.map {
      case (id, avi) =>
        val fs = VideoCodec.decodeAviFrames(avi)
        val b = aHashBands(
          ImageCodec.resizeNearest(fs((fs.length - 1) / 2), 8, 8))
        (id, b(0), b(1), b(2), b(3))
    }).toDF("doc_id", "b0", "b1", "b2", "b3")
  }

  /** Video near-dup dedup — the third face of the perceptual-dedup
    * triad (image [[phashDedup]], audio [[awhashDedup]]), same banded
    * pair join, same exact-O(n²) oracle discipline. */
  val vhashDedup = QueryDef(
    "multimodal_vhash_dedup",
    (s, dir) => {
      vhashThumbRaster(s, dir): Unit
      phashPairs(graft.Work.materialize("vhash_sigs",
        vhashBandsOf(vhashPayloads(s, dir))))
    },
    Some(s"""
      WITH e AS (
        SELECT doc_id, unnest(range(0, 64)) AS i, px
        FROM read_parquet('${rasterSqlPath("vhash")}/*.parquet')),
      p AS (
        SELECT doc_id, CAST(i AS INT) AS i,
               px[CAST(i + 1 AS INT)] // 65536
                 + (px[CAST(i + 1 AS INT)] // 256) % 256
                 + px[CAST(i + 1 AS INT)] % 256 AS g
        FROM e),
      t AS (SELECT doc_id, CAST(sum(g) AS BIGINT) AS tot FROM p GROUP BY 1),
      bits AS (
        SELECT p.doc_id, p.i,
               CASE WHEN 64 * p.g >= t.tot THEN 1 ELSE 0 END AS bit
        FROM p JOIN t USING (doc_id)),
      bands AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN i // 16 = 0 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b0,
               CAST(sum(CASE WHEN i // 16 = 1 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b1,
               CAST(sum(CASE WHEN i // 16 = 2 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b2,
               CAST(sum(CASE WHEN i // 16 = 3 THEN bit * (1 << (i % 16)) ELSE 0 END) AS INT) AS b3
        FROM bits GROUP BY 1)
      SELECT x.doc_id AS a, y.doc_id AS b,
             CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
               AS BIGINT) AS hamming
      FROM bands x JOIN bands y ON x.doc_id < y.doc_id
      WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
          + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
          <= $PhashHamMax"""))

  val all: Seq[QueryDef] =
    Seq(meta, decode, frames, videoFrames, aviFrames, mjpegFrames, audio,
      featurize, resize, blankFilter, silenceFilter, stripMetadata,
      phashDedup, awhashDedup, vhashDedup)
}
