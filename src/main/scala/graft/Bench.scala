package graft

import scala.jdk.CollectionConverters._

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.get(cpus)
    // Session warmup: JIT + codegen + filesystem caches, so the first
    // timed query measures its plan, not JVM cold start.
    spark.range(1000000).selectExpr("sum(id * 2)").collect(): Unit
    Tables(spark, sfDir, "lineitem").limit(1000).count(): Unit
    // Failures are fatal and loud — a swallowed failure would report a
    // broken query as fast (round-1 verdict "What's wrong" 9).
    // Sub-second queries swing ±2-3× run-to-run (GC/AQE/fs cache), so
    // each query is timed `runs` times and the MEDIAN reported — one
    // noisy outlier no longer masquerades as a cross-round regression.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    var failed = List.empty[String]
    // a query that fails EVERY run is excluded from the total and the
    // per-query map (not reported as 0.0 — a broken query must not
    // shrink the headline total); the `failed` list carries it and the
    // non-zero exit code flags the run
    // dev-only filter: bench a comma-separated subset under the exact
    // gate conditions (warmup, cold-cache medians) — driver runs unset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Per-run observability (round-6 verdict #1: the 26 s gate median
    // for dedup_ngram_jaccard was unexplainable from a medians-only
    // artifact). Each run records wall seconds, exact Spark job/stage/
    // task counts (listener bus drained before reading — see
    // ListenerBridge), cumulative JVM GC ms during the run, and the
    // run's start offset from bench start, so one stuck run, GC decay
    // with session age, or a job-count blowup are distinguishable in
    // the committed artifact.
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
    def gcMs(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    final case class Run(sec: Double, jobs: Int, stages: Int, tasks: Int,
        gcMs: Long, atSec: Double)
    val benchT0 = System.nanoTime()
    val details = scala.collection.mutable.LinkedHashMap
      .empty[String, (Int, Seq[Run])]
    val results = SparkEntry.queries.zipWithIndex
      .filter { case ((name, _), _) => only.forall(_.contains(name)) }
      .flatMap { case ((name, fn), idx) =>
      val runRecs = (1 to runs).flatMap { _ =>
        org.apache.spark.sql.graftbridge.ListenerBridge
          .drain(spark.sparkContext)
        val (j0, s0, k0, g0) = (jobs.get(), stages.get(), tasks.get(), gcMs())
        val at = (System.nanoTime() - benchT0) / 1e9
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              if (!failed.contains(name)) {
                failed ::= name
                System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              }
              false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        // each run measured cold-cache, like an isolated run
        GraftSession.dropAllCaches(spark)
        org.apache.spark.sql.graftbridge.ListenerBridge
          .drain(spark.sparkContext)
        if (ok) Some(Run(sec, jobs.get - j0, stages.get - s0,
          tasks.get - k0, gcMs() - g0, at))
        else None
      }
      if (runRecs.isEmpty) None
      else {
        details(name) = (idx, runRecs)
        val ts = runRecs.map(_.sec)
        Some(name -> ts.sorted.apply((ts.size - 1) / 2))
      }
    }.toMap
    // The driver captures only a 2000-char stdout TAIL (measured from
    // BENCH_r03.json) and parses the JSON line out of it; rounds 1-3
    // recorded "parsed": null because the all-queries map pushed the
    // line start past the buffer. So: `value` totals ALL queries, but
    // the stdout `queries` map carries only the headline subset (the
    // relational q-series plus the flagship ext/streaming/ML keys) to
    // keep the line well under the window. The FULL map still goes to
    // the bench-out file. Locale.ROOT: a comma-decimal default locale
    // would render invalid JSON.
    def n3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val headline: Set[String] = Set(
      "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
      "dedup_ngram_jaccard_prefix", "dedup_clusters",
      "dedup_embedding_cosine", "corpus_curate",
      "decontaminate", "topk_cosine", "topk_cosine_lsh", "topk_cosine_ivf",
      "knn_train", "knn_score", "knn_predict", "workflow_e2e",
      "stream_window_agg", "stream_sessionize", "stream_interval_join",
      "stream_dedup_exactly_once", "build_vocab", "inverted_index",
      "pack_chunk_text", "text_stats", "token_count",
      "multimodal_video_frames", "multimodal_avi_frames",
      "multimodal_audio")
    def mapJson(rs: scala.collection.Map[String, Double]): String =
      rs.map { case (k, v) => s""""$k":${n3(v)}""" }.mkString("{", ",", "}")
    val shown = results.filter { case (k, _) =>
      k.startsWith("q") || headline(k) }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    def line(qs: String): String =
      s"""{"metric":"total","value":${n3(total)},"unit":"sec","runs":$runs,"n_queries":${results.size},"queries":$qs,"sf":"$sfDir","failed":$fs}"""
    println(line(mapJson(shown)))
    // full artifact to a file the driver/devs can parse directly (stdout
    // is wrapped in sbt's [info] decoration and tail-truncated):
    //   line 1 — the same schema as stdout but with ALL per-query
    //            medians (cross-round comparison must not depend on the
    //            tail lottery; round-6 verdict #2)
    //   line 2 — per-run detail: {"metric":"detail","queries":{name:
    //            {"median":s,"idx":i,"runs":[{"sec","jobs","stages",
    //            "tasks","gc_ms","at"}…]}}} — `idx` is the session
    //            execution order, `at` the run's start offset (sec)
    //            from bench start, `gc_ms` the JVM GC time during the
    //            run. This is the artifact that makes a 26 s outlier
    //            diagnosable: one slow run vs three, with or without a
    //            job-count/GC anomaly, early vs late in the session.
    def runJson(r: Run): String =
      s"""{"sec":${n3(r.sec)},"jobs":${r.jobs},"stages":${r.stages},""" +
        s""""tasks":${r.tasks},"gc_ms":${r.gcMs},"at":${n3(r.atSec)}}"""
    val detailJson = details.map { case (name, (idx, rs)) =>
      val med = results(name)
      s""""$name":{"median":${n3(med)},"idx":$idx,"runs":[""" +
        rs.map(runJson).mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/target/bench.json")
    new java.io.File(out).getParentFile.mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      line(mapJson(results)) + "\n" +
        s"""{"metric":"detail","runs":$runs,"sf":"$sfDir","queries":$detailJson}""" +
        "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
