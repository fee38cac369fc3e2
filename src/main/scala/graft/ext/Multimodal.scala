package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (SURVEY.md §2.4): media carried as opaque BINARY
  * columns with typed metadata alongside. The decode step is STUBBED
  * with a deterministic fake (no image/audio codecs in this container —
  * a real deployment plugs a codec into [[MediaDecoder]]); everything
  * Spark-side — binary schema, per-partition batch iteration, frame
  * explosion, partitioning — is real and tested.
  *
  * Scale: decode runs inside mapPartitions (the JVM analog of
  * mapInPandas batches), so media bytes never leave the executor that
  * scanned them, and per-partition decoder init is amortized across the
  * partition's rows.
  */
object Multimodal {

  final case class MediaMeta(n_bytes: Int, sha: String, width: Int, height: Int)

  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** STUB: deterministic fake decoder — "dimensions" derived from the
    * content hash so tests are reproducible. */
  object FakeDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val digest = md.digest(bytes)
      val sha = digest.map("%02x".format(_)).mkString
      val h = java.util.Arrays.hashCode(digest)
      MediaMeta(bytes.length, sha, 16 + math.abs(h % 64), 16 + math.abs((h / 64) % 64))
    }
  }

  /** Binary payload per document (text bytes standing in for media). */
  private def payloads(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))

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

  /** Stubbed decode via per-partition batches: schema and iteration are
    * the real production shape; only FakeDecoder.decode is a stand-in.
    */
  val decode = QueryDef(
    "multimodal_decode",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      payloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val dec: MediaDecoder = FakeDecoder // per-partition init
          it.map { case (id, bytes) =>
            val m = dec.decode(bytes)
            (id, m.n_bytes, m.width, m.height, m.sha)
          }
        }
        .toDF("doc_id", "n_bytes", "width", "height", "sha")
    },
    None) // decode is stubbed → rows-only; plumbing asserted in tests

  /** Frame sampling for "video" payloads: fixed 64-byte windows, every
    * 2nd window sampled, one output row per frame (posexplode).
    */
  val frames = QueryDef(
    "multimodal_frames",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      payloads(s, dir).as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          bytes.grouped(64).zipWithIndex
            .filter(_._2 % 2 == 0)
            .map { case (win, idx) => (id, idx, FakeDecoder.decode(win).sha) }
        }
        .toDF("doc_id", "frame_idx", "frame_sha")
    },
    None)

  /** Feature extraction: payload → fixed-width Float embedding. The
    * featurizer is the deterministic stub (real deployments plug a
    * vision/audio model into the same mapPartitions shape); the output
    * schema (array<float>, the `embeddings.embedding` column type) and
    * per-partition batch iteration are the production plumbing — the
    * extracted vectors feed directly into Similarity/Dedup operators.
    */
  /** The library face: (doc_id, feature array<float>) — the frame
    * downstream Similarity/Dedup operators consume (tested in ExtSpec).
    */
  def featurizeFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val sp = s
    import sp.implicits._
    val dim = 16
    payloads(s, dir).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          // STUB featurizer: 16 floats derived from the content
          // digest, L2-normalized — deterministic, unit-length
          val d = md.digest(bytes)
          val raw = Array.tabulate(dim)(i =>
            ((d(2 * i) & 0xFF) * 256 + (d(2 * i + 1) & 0xFF)).toFloat
              / 65535.0f - 0.5f)
          val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
          (id, raw.map(_ / norm))
        }
      }
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
    None) // stub featurizer → golden-pinned

  /** Resize: re-dimension the decoded media (the stub scales the fake
    * decoder's dimensions and re-samples the payload to the target
    * byte budget — shape and schema of a real thumbnailer). */
  val resize = QueryDef(
    "multimodal_resize",
    (s, dir) => {
      val sp = s
      import sp.implicits._
      val (tw, th) = (8, 8)
      payloads(s, dir).as[(Long, Array[Byte])]
        .mapPartitions { it =>
          val dec: MediaDecoder = FakeDecoder
          it.map { case (id, bytes) =>
            val m = dec.decode(bytes)
            val budget = tw * th
            val step = math.max(1, bytes.length / budget)
            val sampled = bytes.indices.by(step).take(budget)
              .map(bytes(_)).toArray
            (id, m.width, m.height, tw, th, dec.decode(sampled).sha)
          }
        }
        .toDF("doc_id", "src_w", "src_h", "dst_w", "dst_h", "thumb_sha")
    },
    None) // stub resampler → golden-pinned

  val all: Seq[QueryDef] = Seq(meta, decode, frames, featurize, resize)
}
