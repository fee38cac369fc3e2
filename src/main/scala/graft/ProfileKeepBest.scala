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
      // r14 shape: CC over the ACTIVE node set only, then the
      // singleton-folding coalesce-argmax (the exact key core)
      val active = pairs.select(col("a").as("doc_id"))
        .unionAll(pairs.select(col("b").as("doc_id"))).distinct()
      val labels = t("connectedComponents (active)") {
        val l = graft.ext.Dedup.connectedComponents(active, pairs).persist()
        println(s"[keepbest]   n_labels=${l.count()}")
        l
      }
      def argmax = {
        val scores = graft.ext.TextAnalysis.qualityScoreOf(corpus
            .filter(size(graft.ext.TextAnalysis.tokensWs(col("text")))
              >= graft.ext.Dedup.ShingleN))
          .select("doc_id", "score")
        scores.join(labels, Seq("doc_id"), "left")
          .groupBy(coalesce(col("cluster"), col("doc_id")).as("cluster"))
          .agg(max(struct(col("score"), (-col("doc_id")).as("neg_id")))
            .as("best"))
          .select(col("cluster"), (-col("best.neg_id")).as("keep_id"),
            col("best.score").as("best_score"))
      }
      t("score+coalesce-argmax") {
        argmax.write.format("noop").mode("overwrite").save()
      }
      if (rep == reps && sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println("[keepbest] argmax plan:\n" +
          argmax.queryExecution.executedPlan.toString.take(8000))
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
