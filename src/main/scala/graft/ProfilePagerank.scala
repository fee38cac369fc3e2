package graft

import org.apache.spark.sql.functions._

/** Stage breakdown of graph_pagerank (dev tool, r13 verdict #6): the
  * suite's #1 local key (3.73 s) is three fixed integer rounds over a
  * node-sized score frame — this main separates the edge-build cost
  * (fact-table join + distinct) from the per-round join+sum cost and
  * the final materialize, so the SCALE.md row can say whether the
  * rounds or the edge list dominate and whether the persists are hit.
  */
object ProfilePagerank {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pagerank] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def jobs(): Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val reps = sys.env.getOrElse("SPARK_GRAFT_HOT_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"[pagerank] --- rep $rep ---")
      val edges = t("tradeEdges build+persist") {
        val e = graft.ops.PageRank.tradeEdges(spark, dir).persist()
        println(s"[pagerank]   n_edges=${e.count()}")
        e
      }
      val outdeg = t("outdeg agg+persist") {
        val o = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
          .persist()
        println(s"[pagerank]   n_nodes=${o.count()}")
        o
      }
      t("3 rounds (one chained job)") {
        var scores = outdeg.select(col("src").as("node"),
          lit(graft.ops.PageRank.Scale).as("score_fp"))
        (1 to graft.ops.PageRank.Rounds).foreach { _ =>
          val contrib = scores
            .join(outdeg, col("node") === col("src"))
            .select(col("node"),
              expr(s"score_fp * 85 DIV 100 DIV outdeg").as("c"))
          scores = edges
            .join(contrib, col("src") === col("node"))
            .select(col("dst"), col("c"))
            .groupBy("dst").agg(sum("c").as("in_fp"))
            .select(col("dst").as("node"),
              (lit(graft.ops.PageRank.Scale * 15 / 100) + col("in_fp"))
                .as("score_fp"))
        }
        scores.write.format("noop").mode("overwrite").save()
      }
      outdeg.unpersist(); edges.unpersist()
      val j0 = jobs()
      t("full key (end-to-end)") {
        SparkEntry.queries("graph_pagerank")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      println(s"[pagerank]   full-key jobs=${jobs() - j0}")
      GraftSession.dropAllCaches(spark)
    }
    spark.stop()
  }
}
