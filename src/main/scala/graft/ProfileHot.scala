package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer (dev tool): runs the named query keys once. */
object ProfileHot {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = if (args.nonEmpty) args.toSeq else Seq(
      "dedup_embedding_cosine", "knn_predict", "dedup_minhash_lsh",
      "workflow_e2e", "doc_fingerprint")
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    keys.foreach { k =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(k)(spark, dir)
      // when explaining, execute df ITSELF (count() derives a different
      // plan) so AQE finalizes and the printed tree is the one that ran
      // — an action on df's own toRdd, NOT collect(): materializing the
      // full operator output on the driver is an OOM at profile scale
      // (round-4 advice), while the InternalRow count ships nothing
      val n = if (explain) df.queryExecution.toRdd.count() else df.count()
      println(f"[hot] $k%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      if (explain)
        println(s"[hot] $k plan:\n" +
          df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
