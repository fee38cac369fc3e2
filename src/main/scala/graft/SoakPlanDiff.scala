package graft

/** One-off round-12 soak auditor: for every query key, compare the
  * physical plan fingerprint with the opt-in rewrites globally OFF vs
  * ON and print the keys whose plans differ — the explicit "any key
  * whose plan changed" list the rules-on soak artifact needs. */
object SoakPlanDiff {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get(8)
    GraftSession.muteBenignGlobalWindowWarn()
    def fingerprint(p: String): String = {
      // operator-name multiset: stable under exprId/alias churn
      "[A-Za-z]+Exec|RowTopK|RankTopK|row_topk|rank_topk|Window\\b".r
        .findAllIn(p).toSeq.groupBy(identity)
        .map { case (k, v) => s"$k:${v.size}" }.toSeq.sorted.mkString(",")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        GraftSession.resetQueryConfs(spark)
        val off = fingerprint(
          fn(spark, dir).queryExecution.executedPlan.toString)
        GraftSession.resetQueryConfs(spark)
        spark.conf.set(plans.RangeJoinRewrite.EnabledConf, "true")
        spark.conf.set(plans.TopKRewrite.EnabledConf, "true")
        val on = fingerprint(
          fn(spark, dir).queryExecution.executedPlan.toString)
        if (off != on) println(s"[soakdiff] $name CHANGED\n  off: $off\n  on:  $on")
      } catch { case e: Throwable =>
        println(s"[soakdiff] $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      } finally GraftSession.dropAllCaches(spark)
    }
    GraftSession.resetQueryConfs(spark)
    println("[soakdiff] done")
    spark.stop()
  }
}
