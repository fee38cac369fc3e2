package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in their modules (graft.ops.*, graft.ext.*, graft.ml.*);
  * this object only aggregates them.
  */
object SparkEntry {

  /** Every implemented operator from SURVEY.md §2, in registration order. */
  def allQueries: Seq[QueryDef] =
    ops.Relational.all ++ ops.Parity.all ++ ops.Skew.all ++
      ops.AsofJoin.all ++ ops.RangeJoin.all ++ ops.Sketches.all ++
      ops.PageRank.all ++ ops.Triangles.all ++ ops.Funnel.all ++
      ops.PipelineOps.all ++ ops.Quality.all ++
      streaming.StreamOps.all ++
      ml.Knn.all ++ workflow.BatchTrainPredict.all ++
      ext.TextAnalysis.all ++ ext.Dedup.all ++ ext.EntityResolution.all ++
      ext.Similarity.all ++
      ext.Embeddings.all ++ ext.Chunking.all ++ ext.Corpus.all ++
      ext.Retrieval.all ++ ext.UrlOps.all ++ ext.Multimodal.all ++
      ext.Dsir.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's predict pipeline in miniature: distributed KNN
    * classification of the held-out embedding vectors (SURVEY.md §7.2).
    */
  def entry(spark: SparkSession): DataFrame =
    ml.Knn.predict.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
