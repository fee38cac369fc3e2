package graft

/** Job-count attribution for `corpus_curate_stream` (dev tool, r19
  * verdict #1): the key's floor is JOB COUNT, not data — this main
  * runs the witness once and histograms every Spark job by its
  * description/call site, so the per-batch fixed overhead can be
  * attacked line by line instead of guessed at.
  */
object ProfileCurateStream {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val byDesc = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]
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
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
          val d = (desc match {
            case Some(x) if x.contains("batch = ") =>
              s"[stream-machinery] ${site.getOrElse("?")}"
            case Some(x) => x
            case None => site.getOrElse("?")
          }).replaceAll("\\s+", " ").take(110)
          byDesc.computeIfAbsent(d,
            _ => new java.util.concurrent.atomic.AtomicInteger)
            .incrementAndGet(): Unit
        }
      })
    val key = if (args.nonEmpty) args(0) else "corpus_curate_stream"
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(key)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[cstream] $key $sec%.2f s  jobs=${jobs.get}" +
      f" stages=${stages.get} tasks=${tasks.get}")
    import scala.jdk.CollectionConverters._
    byDesc.asScala.toSeq.sortBy(-_._2.get).foreach { case (d, n) =>
      println(f"[cstream] ${n.get}%4d  $d")
    }
    spark.stop()
  }
}
