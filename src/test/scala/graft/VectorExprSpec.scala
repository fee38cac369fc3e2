package graft

import graft.ext.Dedup
import graft.ml.Knn
import org.apache.spark.sql.functions._

/** Native fused vector expressions must be bit-identical to the
  * declarative zip_with/aggregate forms they replaced (oracle hashes
  * depend on it).
  */
class VectorExprSpec extends SparkSpec {

  private lazy val pairs = {
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    emb.limit(40).select(col("vec_id").as("a"), col("e").as("ea"))
      .crossJoin(emb.limit(40).select(col("vec_id").as("b"), col("e").as("eb")))
  }

  test("native cosine == declarative cosine, bit for bit") {
    val diff = pairs.select(
      Dedup.cosine(col("ea"), col("eb")).as("x"),
      Dedup.cosineDeclarative(col("ea"), col("eb")).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(diff == 0)
  }

  test("native l2sq == declarative l2sq, bit for bit") {
    val diff = pairs.select(
      Knn.sqDist(col("ea"), col("eb")).as("x"),
      Knn.sqDistDeclarative(col("ea"), col("eb")).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(diff == 0)
  }

  test("expressions participate in whole-stage codegen") {
    val df = Tables(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("e"))
      .select(Dedup.cosine(col("e"), col("e")).as("c"))
    df.collect()
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosine_sim"), plan.take(800))
  }
}
