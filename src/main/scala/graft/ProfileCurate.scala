package graft

import org.apache.spark.sql.functions._

/** Stage breakdown of corpus_curate (dev tool, r13 punch #8): where do
  * the 26 jobs / ~3 s go — quality gate + exact dedup, near-dup pair
  * generation, the CC fixed point, or the final filter?
  */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[curate] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_HOT_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"[curate] --- rep $rep ---")
      val docs = Tables(spark, dir, "documents")
      val corpus = graft.ext.Dedup.plantedCorpus(docs).unionAll(
        docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 20000000L).as("doc_id"), col("text")))
      import graft.ext.{Dedup, TextAnalysis}
      val tk = TextAnalysis.tokens(col("text"))
      val nTok = size(tk)
      val nStop = size(filter(tk,
        w => w.isin(TextAnalysis.stopwords: _*)))
      val good = corpus.filter(
        nTok.between(10, 10000) && nStop * 20 >= nTok &&
          length(col("text")) <= nTok * 15)
      val exactKeep = good.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id", "text").persist()
      t("gate+exact (persist+count)")(exactKeep.count())
      val pairs = t("neardup pairs (jaccard)") {
        Dedup.jaccardPairs(Dedup.shingleSets(exactKeep)).select("a", "b")
      }
      val labels = t("connected components") {
        val l = Dedup.connectedComponents(
          exactKeep.select("doc_id"), pairs).persist()
        l.count()
        l
      }
      t("final filter + noop") {
        labels.filter(col("doc_id") === col("cluster")).select("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      labels.unpersist(); exactKeep.unpersist()
      t("full key (end-to-end)") {
        SparkEntry.queries("corpus_curate")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      GraftSession.dropAllCaches(spark)
    }
    spark.stop()
  }
}
