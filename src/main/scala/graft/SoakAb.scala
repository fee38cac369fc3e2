package graft

/** Canary-normalized scoped-vs-rules-on A/B over the rewrite-affected
  * keys (r13 verdict punch #1): r12 measured the rules-on posture net
  * FASTER at suite level, r13 net slower, with only a fraction of the
  * gap attributable to the keys whose plans actually change — so the
  * flagship optimizer story needs a per-key adjudication that
  * suite-level totals (±8% run-to-run) cannot give.
  *
  * Design: B blocks; each block runs every key ONCE per posture,
  * back-to-back (blocks count from 1: scoped-first on odd blocks,
  * rules-on-first on even, cancelling ordering/cache effects), with
  * the Bench canary probe timed at every block edge. Adjacent A/B runs of the same key
  * land on the same instantaneous box state, so the per-block ratio
  * rulesOn/scoped is box-free by construction; the canary series
  * additionally exposes any drift for post-hoc normalization. Reports
  * per-key: per-posture medians, the median of per-block RATIOS (the
  * robust estimator), and job counts per posture (a job-count delta
  * means the rewrite changed the executed plan, as intended).
  */
object SoakAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    GraftSession.muteBenignGlobalWindowWarn()
    val blocks = sys.env.getOrElse("SPARK_GRAFT_AB_BLOCKS", "7").toInt
    val keys = if (args.nonEmpty) args.toSeq else Seq(
      "q5_window_topn", "q34_latest_by_key", "asof_join",
      "asof_join_forward", "topk_cosine_ivf", "topk_cosine_lsh",
      "bm25_topk", "hybrid_rrf_topk", "stream_window_topk",
      "event_top_paths", "sample_class_cap", "tfidf_topterms")
    // session warmup — same as Bench, so run 1 measures the plan
    spark.range(1000000).selectExpr("sum(id * 2)").collect(): Unit
    Tables(spark, dir, "lineitem").limit(1000).count(): Unit
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet(): Unit
      })
    def canary(): Double = {
      val t0 = System.nanoTime()
      spark.range(1000000).selectExpr("sum(id * 2)").collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    final case class Run(sec: Double, jobs: Int)
    val recs = scala.collection.mutable.Map
      .empty[(String, Boolean), scala.collection.mutable.ArrayBuffer[Run]]
    keys.foreach { k =>
      recs((k, false)) = scala.collection.mutable.ArrayBuffer.empty
      recs((k, true)) = scala.collection.mutable.ArrayBuffer.empty
    }
    def runOnce(name: String, rulesOn: Boolean): Unit = {
      // drain the async listener bus so queued JobStart events from the
      // PREVIOUS run can't bleed into this run's [j0, jobs] window and
      // fabricate a cross-posture job delta (r14 review)
      org.apache.spark.sql.graftbridge.ListenerBridge
        .drain(spark.sparkContext)
      GraftSession.resetQueryConfs(spark)
      if (rulesOn) {
        spark.conf.set(plans.RangeJoinRewrite.EnabledConf, "true")
        spark.conf.set(plans.TopKRewrite.EnabledConf, "true")
      }
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      GraftSession.dropAllCaches(spark)
      org.apache.spark.sql.graftbridge.ListenerBridge
        .drain(spark.sparkContext)
      recs((name, rulesOn)) += Run(sec, jobs.get() - j0)
      (): Unit
    }
    val canaries = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to blocks).foreach { b =>
      canaries += canary()
      println(f"[soakab] block $b canary=${canaries.last}%.3f s")
      keys.foreach { k =>
        val order = if (b % 2 == 0) Seq(true, false) else Seq(false, true)
        order.foreach(on => runOnce(k, on))
      }
    }
    canaries += canary()
    GraftSession.resetQueryConfs(spark)
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.size - 1) / 2)
    }
    println(f"[soakab] canary med=${med(canaries.toSeq)}%.3f " +
      s"all=${canaries.map(c => f"$c%.3f").mkString(",")}")
    keys.foreach { k =>
      val off = recs((k, false)).toSeq
      val on = recs((k, true)).toSeq
      val ratios = off.zip(on).map { case (o, n) => n.sec / o.sec }
      println(f"[soakab] $k%-22s scoped=${med(off.map(_.sec))}%6.3f s " +
        f"rulesOn=${med(on.map(_.sec))}%6.3f s " +
        f"medRatio=${med(ratios)}%5.2f " +
        s"jobs=${med(off.map(_.jobs.toDouble)).toInt}->" +
        s"${med(on.map(_.jobs.toDouble)).toInt} " +
        s"offRuns=${off.map(r => f"${r.sec}%.2f").mkString(",")} " +
        s"onRuns=${on.map(r => f"${r.sec}%.2f").mkString(",")}")
    }
    println("[soakab] done")
    spark.stop()
  }
}
