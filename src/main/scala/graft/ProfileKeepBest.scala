package graft

import org.apache.spark.sql.functions._

/** Stage breakdown of dedup_keep_best (dev tool, r13 verdict #2): the
  * key composes the shingle→jaccard-pairs→connected-components
  * pipeline (shared shape with dedup_clusters) with a quality-argmax
  * aggregate; this main times each stage with its own action so the
  * SCALE.md row states where the 3.35 s goes — and in particular what
  * the score-join/argmax tail costs beyond the dedup_clusters prefix.
  */
object ProfileKeepBest {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[keepbest] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def jobs(): Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val reps = sys.env.getOrElse("SPARK_GRAFT_HOT_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"[keepbest] --- rep $rep ---")
      val corpus = graft.ext.Dedup.plantedCorpus(
        Tables(spark, dir, "documents"))
      val sh = graft.ext.Dedup.shingleSets(corpus).persist()
      t("shingle+persist+count")(sh.count())
      val pairs = t("jaccardPairs (inv index)") {
        val p = graft.ext.Dedup.jaccardPairs(sh).select("a", "b")
        println(s"[keepbest]   n_pairs=${p.count()}")
        p
      }
      val nodes = corpus
        .filter(size(graft.ext.TextAnalysis.tokens(col("text"))) >= 4)
        .select("doc_id")
      val labels = t("connectedComponents") {
        val l = graft.ext.Dedup.connectedComponents(nodes, pairs).persist()
        println(s"[keepbest]   n_labels=${l.count()}")
        l
      }
      t("score+argmax (labels ⋈ score)") {
        graft.ext.Dedup.keepBestPerCluster(labels,
            graft.ext.TextAnalysis.qualityScoreOf(corpus))
          .write.format("noop").mode("overwrite").save()
      }
      if (rep == reps && sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println("[keepbest] argmax plan:\n" +
          graft.ext.Dedup.keepBestPerCluster(labels,
              graft.ext.TextAnalysis.qualityScoreOf(corpus))
            .queryExecution.executedPlan.toString.take(8000))
      labels.unpersist()
      sh.unpersist()
      val j0 = jobs()
      t("full key (end-to-end)") {
        SparkEntry.queries("dedup_keep_best")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      println(s"[keepbest]   full-key jobs=${jobs() - j0}")
      GraftSession.dropAllCaches(spark)
    }
    spark.stop()
  }
}
