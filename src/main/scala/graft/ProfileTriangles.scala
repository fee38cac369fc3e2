package graft

import org.apache.spark.sql.functions._

/** Stage breakdown of graph_triangles (dev tool, r14 verdict #3): the
  * suite's #1 quiet-box key (3.05 s) has growth rows but never had the
  * ProfileNgram/ProfilePagerank treatment. This main separates the
  * pair-gen/materialize cost from the orientation build, the wedge
  * self-join, the closing equi-join, and the final per-node aggregate —
  * and A/Bs whether persisting the ORIENTED edge frame (consumed by
  * both the wedge join and the closing join, which repartition on
  * different keys so only the deg-aggregate exchange dedups via
  * ReuseExchange) buys anything over recomputing it per consumer.
  */
object ProfileTriangles {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tri] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def jobs(): Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val reps = sys.env.getOrElse("SPARK_GRAFT_HOT_REPS", "2").toInt
    (1 to reps).foreach { rep =>
      println(s"[tri] --- rep $rep ---")
      val mat = t("pair-gen + distinct + materialize") {
        Work.materialize("tri_prof_edges",
          graft.ops.Triangles.coPurchaseEdges(spark, dir))
      }
      val m = t("edge count (parquet metadata)") { mat.count() }
      val parts = graft.ops.Triangles.wedgeParts(m,
        spark.conf.get("spark.sql.shuffle.partitions").toInt)
      println(s"[tri]   n_edges=$m wedge_parts=$parts")
      // the triangleListOn plan, stage by stage (same spelling)
      def orientedOf(edges: org.apache.spark.sql.DataFrame) = {
        val deg = edges.select(col("u").as("node"))
          .unionAll(edges.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        val ranked = deg.select(col("node"),
          (col("deg") * 1000000000L + col("node")).as("rank"))
        edges
          .join(ranked.withColumnRenamed("node", "u")
            .withColumnRenamed("rank", "ru"), "u")
          .join(ranked.withColumnRenamed("node", "v")
            .withColumnRenamed("rank", "rv"), "v")
          .select(
            when(col("ru") < col("rv"), col("u")).otherwise(col("v"))
              .as("src"),
            when(col("ru") < col("rv"), col("v")).otherwise(col("u"))
              .as("dst"),
            when(col("ru") < col("rv"), col("rv")).otherwise(col("ru"))
              .as("rdst"))
      }
      t("deg+rank+orient (noop)") {
        orientedOf(mat).write.format("noop").mode("overwrite").save()
      }
      def wedgesOf(oriented: org.apache.spark.sql.DataFrame) = {
        val bySrc = oriented.repartition(parts, col("src"))
        bySrc.as("x").join(bySrc.as("y"),
            col("x.src") === col("y.src") && col("x.rdst") < col("y.rdst"))
          .select(col("x.src").as("a"), col("x.dst").as("b"),
            col("y.dst").as("c"))
      }
      // the PRE-r15 closing spelling: z side recomputes the oriented
      // frame (deg aggregate + two rank joins) just to test membership
      def trianglesOldClose(oriented: org.apache.spark.sql.DataFrame) =
        wedgesOf(oriented).repartition(parts, col("b"), col("c"))
          .join(oriented.repartition(parts, col("src"), col("dst"))
            .as("z"),
            col("b") === col("z.src") && col("c") === col("z.dst"))
          .select("a", "b", "c")
      // the r15 spelling: closure is undirected membership — the z
      // side is the bare materialized edge list, least/greatest-
      // normalized EXACTLY like Triangles.triangleListOn (r15 ADVICE:
      // the unnormalized z side here was correct only because
      // coPurchaseEdges emits u < v; this profiler must stay
      // byte-equivalent to the shipped plan even if the edge builder
      // changes)
      def triangles(oriented: org.apache.spark.sql.DataFrame) =
        wedgesOf(oriented)
          .withColumn("bb", least(col("b"), col("c")))
          .withColumn("cc", greatest(col("b"), col("c")))
          .repartition(parts, col("bb"), col("cc"))
          .join(mat.select(least(col("u"), col("v")).as("zu"),
              greatest(col("u"), col("v")).as("zv"))
              .repartition(parts, col("zu"), col("zv")),
            col("bb") === col("zu") && col("cc") === col("zv"))
          .select("a", "b", "c")
      t("wedge join only (noop)") {
        wedgesOf(orientedOf(mat))
          .write.format("noop").mode("overwrite").save()
      }
      t("wedge + OLD closing (noop)") {
        trianglesOldClose(orientedOf(mat))
          .write.format("noop").mode("overwrite").save()
      }
      t("wedge + NEW closing (noop)") {
        triangles(orientedOf(mat))
          .write.format("noop").mode("overwrite").save()
      }
      t("OLD full list + agg (noop)") {
        trianglesOldClose(orientedOf(mat))
          .select(explode(array(col("a"), col("b"), col("c"))).as("part"))
          .groupBy("part").agg(count(lit(1)).as("n_triangles"))
          .write.format("noop").mode("overwrite").save()
      }
      t("NEW full list + agg (noop)") {
        triangles(orientedOf(mat))
          .select(explode(array(col("a"), col("b"), col("c"))).as("part"))
          .groupBy("part").agg(count(lit(1)).as("n_triangles"))
          .write.format("noop").mode("overwrite").save()
      }
      // A/B: oriented persisted across its two consumers vs recomputed
      // (answers the r14 verdict question; persist was measured worse)
      t("OLD, oriented PERSISTED") {
        val o = orientedOf(mat).persist()
        o.count(): Unit
        trianglesOldClose(o)
          .select(explode(array(col("a"), col("b"), col("c"))).as("part"))
          .groupBy("part").agg(count(lit(1)).as("n_triangles"))
          .write.format("noop").mode("overwrite").save()
        o.unpersist(): Unit
      }
      val j0 = jobs()
      t("full key (end-to-end)") {
        SparkEntry.queries("graph_triangles")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      println(s"[tri]   full-key jobs=${jobs() - j0}")
      GraftSession.dropAllCaches(spark)
    }
    spark.stop()
  }
}
