package graft

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup hot path (dev tool). */
object ProfileMain {
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

    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val corpus = Dedup.plantedCorpus(Tables(spark, dir, "documents"))
    t("corpus")(corpus.count())
    val shingled = Dedup.shingleSets(corpus)
    t("shingleSets")(shingled.count())
    val inv = shingled.select(col("doc_id"), explode(col("shs")).as("sh"))
    t("inverted")(inv.count())
    val pairCounts = inv.select(col("sh"), col("doc_id").as("a"))
      .join(inv.select(col("sh"), col("doc_id").as("b")), "sh")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
    t("pairCounts")(pairCounts.count())
    t("jaccardPairs full")(Dedup.jaccardPairs(shingled).count())
    val sigs = Dedup.minhashSignatures(shingled)
    t("minhashSignatures")(sigs.count())
    t("lshCandidates")(Dedup.lshCandidates(sigs).count())
    t("minhashDedup full")(Dedup.minhashDedup(corpus).count())
    spark.stop()
  }
}
