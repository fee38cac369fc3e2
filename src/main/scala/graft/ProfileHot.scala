package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timer (dev tool): runs the named query keys once. */
object ProfileHot {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the EXACT session Bench uses (codegen-cache sizing included) —
    // a bare builder here measured ~2x Bench on codegen-heavy keys,
    // profiling the session config instead of the plan
    val spark = GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val keys = if (args.nonEmpty) args.toSeq else Seq(
      "dedup_embedding_cosine", "knn_predict", "dedup_minhash_lsh",
      "workflow_e2e", "doc_fingerprint")
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    // per-query Spark job/stage/task counts — on local[32] small-data
    // wall time is dominated by job+stage fixed overhead, so these
    // counts ARE the profile (graft-perf-lessons)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
          stages.addAndGet(j.stageInfos.size): Unit
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum): Unit
        }
      })
    // bench-like mode: repeat each key with cold caches like graft.Bench
    val reps = sys.env.getOrElse("SPARK_GRAFT_HOT_REPS", "1").toInt
    keys.foreach { k =>
      (1 to reps).foreach { rep =>
        val (j0, s0, t0c) = (jobs.get(), stages.get(), tasks.get())
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(k)(spark, dir)
        // when explaining, execute df ITSELF (a derived action changes
        // the plan) so AQE finalizes and the printed tree is the one
        // that ran — an action on df's own toRdd, NOT collect():
        // materializing the full operator output on the driver is an
        // OOM at profile scale (round-4 advice), while the InternalRow
        // count ships nothing. Otherwise time the same noop-sink write
        // Bench times (count() lets Catalyst prune terminal projections
        // and unused aggregate expressions — round-7 verdict #3).
        val n = if (explain) df.queryExecution.toRdd.count() else {
          df.write.format("noop").mode("overwrite").save(); -1L
        }
        val sec = (System.nanoTime() - t0) / 1e9
        if (reps > 1) GraftSession.dropAllCaches(spark)
        println(f"[hot] $k%-28s $sec%8.2f s  rows=$n  jobs=${jobs.get - j0}" +
          f" stages=${stages.get - s0} tasks=${tasks.get - t0c} rep=$rep")
        if (explain && rep == reps)
          println(s"[hot] $k plan:\n" +
            df.queryExecution.executedPlan.toString.take(
              sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_CHARS", "4000").toInt))
      }
    }
    spark.stop()
  }
}
