package graft

import org.apache.spark.sql.functions._

/** Dev tool (r21 optimization round): isolate the curate-stream
  * HISTORY-PROBE pipeline of one micro-batch — the `fresh.count()`
  * action of [[graft.streaming.StreamingDedup.curateFoldBatch]] — by
  * folding batch 0 for real, then running batch 1's probe standalone
  * with a per-job listener and printing the EXECUTED (AQE-final) plan.
  * The job count of that single action is the quantity VERDICT r20
  * item #1 wants cut; this main makes it attributable stage by stage.
  */
object ProfileCurateProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.ext.Dedup
    val docs = Tables(spark, dir, "documents")
    val corpus = Dedup.plantedCorpus(docs).unionAll(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 20000000L).as("doc_id"), col("text")))
    val slices = Seq(
      corpus.filter(col("doc_id") < Dedup.PlantedOffset),
      corpus.filter(col("doc_id") >= Dedup.PlantedOffset &&
        col("doc_id") < 20000000L))
    val base = Work.scratch("curate_probe_dev")
    Work.clean(base)
    val idx = s"$base/idx"
    graft.streaming.StreamingDedup
      .curateFoldBatch(idx, s"$base/kept")(slices(0), 0L)
    // --- batch 1 probe, replicated from curateFoldBatch ---------------
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
          descs.add(s"job ${j.jobId}: stages=${j.stageInfos.size} " +
            s"tasks=${j.stageInfos.map(_.numTasks).sum} " +
            j.stageInfos.map(_.name.takeWhile(_ != '(')).mkString("[", ",", "]"))
          (): Unit
        }
      })
    val good = Dedup.curationGate(
      slices(1).select(col("doc_id"), col("text")))
    val exactKeep = good.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id", "text")
    val exactSh = exactKeep
      .withColumn("shs",
        graft.ext.TextAnalysis.shingleHashesUdf(Dedup.ShingleN)(col("text")))
      .withColumn("n", size(col("shs")))
      .persist()
    org.apache.spark.sql.graftbridge.ListenerBridge.drain(spark.sparkContext)
    val j0 = jobs.get()
    exactSh.count(): Unit
    org.apache.spark.sql.graftbridge.ListenerBridge.drain(spark.sparkContext)
    println(s"[probe] gate+shingle persist: jobs=${jobs.get - j0}")
    val j1 = jobs.get()
    val rejected = Dedup
      .incrementalAgainstSegmentedIndexShingled(spark, idx,
        exactSh.filter(col("n") > 0).drop("text"))
      .select(col("b").as("doc_id"))
    val fresh = exactSh.join(rejected, Seq("doc_id"), "left_anti").persist()
    val t0 = System.nanoTime()
    fresh.count(): Unit
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.sql.graftbridge.ListenerBridge.drain(spark.sparkContext)
    println(f"[probe] history join + persist: jobs=${jobs.get - j1} wall=$sec%.2f s")
    import scala.jdk.CollectionConverters._
    descs.asScala.foreach(d => println(s"[probe]   $d"))
    println("[probe] === executed plan (AQE final) ===")
    println(fresh.queryExecution.executedPlan.toString.take(
      sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_CHARS", "12000").toInt))
    spark.stop()
  }
}
