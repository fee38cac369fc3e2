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

  val all: Seq[QueryDef] = Seq(meta, decode, frames)
}
