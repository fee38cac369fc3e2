package graft

import org.apache.spark.sql.functions._

/** Stage breakdown of dedup_ngram_jaccard_prefix (dev tool, r13 punch
  * #1): times each sub-stage of the prefix SSJoin with its own action
  * so the SCALE.md profile row states where the 3.3 s actually goes —
  * shingle UDF, df aggregate, prefix index (df join + window), the
  * candidate self-join, and exact verification.
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ngram] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_HOT_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"[ngram] --- rep $rep ---")
      val corpus = graft.ext.Dedup.plantedCorpus(
        Tables(spark, dir, "documents"))
      val shingled = graft.ext.Dedup.shingleSets(corpus)
      val sh = shingled.persist()
      t("shingle+persist+count")(sh.count())
      val pre = t("prefixIndex (df+win)") {
        val p = graft.ext.Dedup.prefixIndex(sh).persist()
        p.count()
        p
      }
      val cands = t("candidates (selfjoin)") {
        // the REAL candidate stage (not a re-implementation — the
        // profiler must measure the plan the key runs, r13 review)
        val c = graft.ext.Dedup.prefixCandidatesOn(pre).persist()
        println(s"[ngram]   n_candidates=${c.count()}")
        c
      }
      t("verify (2 joins+intersect)") {
        val v = graft.ext.Dedup.verifyJaccard(cands, sh)
        v.write.format("noop").mode("overwrite").save()
        if (rep == reps && sys.env.contains("SPARK_GRAFT_EXPLAIN"))
          println("[ngram] verify plan:\n" +
            v.queryExecution.executedPlan.toString.take(8000))
      }
      if (rep == reps && sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println("[ngram] prefixIndex plan:\n" +
          graft.ext.Dedup.prefixIndex(sh).queryExecution.executedPlan
            .toString.take(6000))
      t("full key (end-to-end)") {
        SparkEntry.queries("dedup_ngram_jaccard_prefix")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      pre.unpersist(); cands.unpersist(); sh.unpersist()
      GraftSession.dropAllCaches(spark)
    }
    spark.stop()
  }
}
