package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-column preprocessing (SURVEY.md §2.4 multimodal/vector
  * tier): L2 normalization (so cosine reduces to a dot product) and
  * int8 quantization (the 8× vector-storage/IO lever at 100 TB — FAISS
  *-style scalar quantization). Both are per-row projections: shuffle-
  * free, whole-stage-codegen'd, embarrassingly parallel at any scale.
  *
  * Determinism discipline for the oracle hash: the norm is a
  * SEQUENTIAL left fold on both sides (Spark `aggregate` / DuckDB
  * `list_reduce` are both defined sequential), so the doubles are
  * bit-identical before the identical round-and-scale step; outputs are
  * integers and comma-joined integer strings (never raw float columns,
  * and never array columns — the driver compare sorts scalars).
  */
object Embeddings {

  private def asVec(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("e"))

  /** Unit-normalized vector, pinned at 1e-6 resolution as a joined
    * integer string. */
  val normalize = QueryDef(
    "embedding_normalize",
    (s, dir) =>
      asVec(s, dir)
        .withColumn("norm",
          sqrt(aggregate(transform(col("e"), x => x * x), lit(0.0), _ + _)))
        .filter(col("norm") > 0)
        .select(col("vec_id"),
          array_join(transform(col("e"),
            x => round(x / col("norm") * 1e6).cast(LongType)), ",")
            .as("unit_e6")),
    Some("""
      WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
           n AS (SELECT vec_id, e,
                        sqrt(list_reduce(list_transform(e, v -> v * v),
                                         (a, b) -> a + b)) AS norm
                 -- guard BEFORE list_reduce: it errors on an empty
                 -- list where the Spark fold returns 0.0
                 FROM x WHERE len(e) > 0)
      SELECT vec_id,
             array_to_string(list_transform(e,
               v -> CAST(round(v / norm * 1000000) AS BIGINT)), ',')
               AS unit_e6
      FROM n WHERE norm > 0"""))

  /** Symmetric max-abs int8 quantization: q_i = round(x_i·127/maxabs),
    * plus the per-vector scale needed to dequantize. maxabs is an
    * order-independent max, so no fold discipline needed there. */
  val quantizeInt8 = QueryDef(
    "embedding_quantize_int8",
    (s, dir) =>
      asVec(s, dir)
        .withColumn("maxabs", array_max(transform(col("e"), x => abs(x))))
        .filter(col("maxabs") > 0)
        .select(col("vec_id"),
          round(col("maxabs") * 1e6).cast(LongType).as("scale_e6"),
          array_join(transform(col("e"),
            x => round(x * 127 / col("maxabs")).cast(LongType)), ",").as("q")),
    Some("""
      WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                 FROM embeddings),
           m AS (SELECT vec_id, e,
                        list_max(list_transform(e, v -> abs(v))) AS maxabs
                 FROM x)
      SELECT vec_id,
             CAST(round(maxabs * 1000000) AS BIGINT) AS scale_e6,
             array_to_string(list_transform(e,
               v -> CAST(round(v * 127 / maxabs) AS BIGINT)), ',') AS q
      FROM m WHERE maxabs > 0"""))

  val all: Seq[QueryDef] = Seq(normalize, quantizeInt8)
}
