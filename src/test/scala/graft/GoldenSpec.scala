package graft

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Pinned content hashes for the query keys whose semantics SQL cannot
  * express (hash functions, LSH bucketing, stubbed decode) — the
  * regression net the DuckDB oracle can't provide (round-1 verdict
  * "Next round" 10). The hash is over column-name-sorted, row-sorted,
  * canonically formatted values, so it is insensitive to partitioning
  * and row order but pins every value bit.
  *
  * If an intentional algorithm change breaks one of these, re-pin the
  * hash in the same commit and say why in the commit message.
  */
class GoldenSpec extends SparkSpec {

  private def fmt(v: Any): String = v match {
    case null => "∅"
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case s: Seq[_] => s.map(fmt).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row => r.toSeq.map(fmt).mkString("(", ",", ")")
    case d: Double => java.lang.Double.toString(d)
    case f: Float => java.lang.Float.toString(f)
    case x => x.toString
  }

  private def canonicalHash(df: DataFrame): String = {
    val cols = df.columns.sorted.map(col(_))
    val lines = df.select(cols.toSeq: _*).collect()
      .map(_.toSeq.map(fmt).mkString(""))
      .sorted
    val md = MessageDigest.getInstance("SHA-256")
    lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  // q15_approx_distinct moved to the DuckDB oracle (exact counts +
  // estimate-bound booleans), so it no longer needs a golden.
  // Round 6: the three simhash keys (rebuilt on the portable token
  // hash), topk_cosine_lsh (plane literals + sign replay) and
  // topk_cosine_ivf (deterministic quantizer + L2-argmin replay)
  // all moved to full DuckDB oracles — goldens retired like
  // doc_fingerprint and lang_id before them.
  // Round 7: the codec QUERY keys emit oracle-replayable raster/PCM
  // arithmetic, so the codec digests moved to these dedicated digest
  // frames (ext/Multimodal decodeDigest & co. — byte-identical output
  // to the round-6 query keys, hashes unchanged). multimodal_frames
  // and multimodal_audio kept their output shape and stay pinned via
  // the query key itself.
  import org.apache.spark.sql.SparkSession
  private val golden: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    // re-pinned when the stub decoder was replaced by the real
    // javax.imageio codec over rendered PNG payloads
    "multimodal_decode" ->
      ((graft.ext.Multimodal.decodeDigest _, "0732eb1a085d97b4")),
    "multimodal_featurize" ->
      ((graft.ext.Multimodal.featurizeDigest _, "a15358b8453b75b9")),
    "multimodal_resize" ->
      ((graft.ext.Multimodal.resizeDigest _, "fa487e369932845a")),
    "multimodal_video_frames" ->
      ((graft.ext.Multimodal.videoFramesDigest _, "95ae9c8785c61c0f")),
    "multimodal_audio" ->
      ((SparkEntry.queries("multimodal_audio"), "bc225d3899ddfd03")),
    "multimodal_frames" ->
      ((SparkEntry.queries("multimodal_frames"), "bc086fa244396efd")),
    // round 6: real uncompressed-DIB AVI container demux
    "multimodal_avi_frames" ->
      ((graft.ext.Multimodal.aviFramesDigest _, "c772dc896d36ddcb")))

  golden.toSeq.sortBy(_._1).foreach { case (name, (frame, want)) =>
    test(s"golden: $name content hash is pinned") {
      val got = canonicalHash(frame(spark, sf))
      assert(got == want, s"$name canonical hash changed: got $got")
    }
  }
}
