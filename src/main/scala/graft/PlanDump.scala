package graft

/** Dev tool (r20 optimization round): dump `.explain("formatted")` for
  * the named query keys to stdout, bracketed by BEGIN/END markers so a
  * script can split them into `plans/r20/<key>_{before,after}.txt`.
  *
  * NOTE for materializing keys (the dedup family routes through
  * `Work.materialize`, so the RETURNED frame is a parquet scan of the
  * already-computed result): the formatted plan of the returned frame
  * only shows the final scan — for those keys the meaningful "plan
  * shape" is the executed job/stage/task profile, which this tool
  * appends as a footer (the same counts graft.Bench records per run).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
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
    args.foreach { k =>
      GraftSession.applyQueryConfPolicy(spark)
      // drain the async listener bus around the timed region, exactly
      // like Bench — an undrained read can under-count the footer or
      // leak a late job into the next key's baseline (r20 review #4)
      org.apache.spark.sql.graftbridge.ListenerBridge
        .drain(spark.sparkContext)
      val (j0, s0, t0) = (jobs.get(), stages.get(), tasks.get())
      val sec0 = System.nanoTime()
      val df = SparkEntry.queries(k)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - sec0) / 1e9
      org.apache.spark.sql.graftbridge.ListenerBridge
        .drain(spark.sparkContext)
      println(s"===PLAN BEGIN $k===")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println(f"-- executed profile: jobs=${jobs.get - j0} " +
        f"stages=${stages.get - s0} tasks=${tasks.get - t0} " +
        f"wall=$sec%.2f s (single run, incl. any Work.materialize " +
        "pipeline the returned frame scans)")
      println(s"===PLAN END $k===")
      GraftSession.dropAllCaches(spark)
    }
    spark.stop()
  }
}
