package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. Column names/types must line up exactly — the driver
  * sorts columns by name and hash-compares values (see SURVEY.md §5).
  *
  * Float discipline: testdata is DOUBLE; aggregates over money-like
  * columns are fixed-point BIGINT (see Relational.cents) on BOTH sides
  * so neither partial-aggregation order nor engine-specific DECIMAL /
  * HUGEINT output representations can perturb the driver's hash
  * (SURVEY.md §7.4 item 4; round-1 verdict "What's wrong" 1-2).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Scratch space for queries that need to materialize intermediate files
  * (CSV sinks, the log store). Lives under target/ so it is gitignored.
  */
object Work {
  lazy val dir: String =
    sys.env.getOrElse("GRAFT_WORK_DIR", "/root/repo/target/graftwork")

  /** Recursively delete a scratch subdir (idempotent re-runs). */
  def clean(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(path))
  }

  /** Materialize `df` to a work-dir parquet and return a clean scan of
    * it. For query plans that pin cached intermediates (persist() inside
    * the builder): the returned frame holds no reference to the cache,
    * so the caller can unpersist immediately instead of leaking storage
    * across a long multi-query session (round-1 bench showed cached RDDs
    * accumulating over 45 queries). The result sets here are small
    * (pair lists), so the extra write is noise.
    */
  private val matSeq = new java.util.concurrent.atomic.AtomicLong(0)

  def materialize(name: String, df: DataFrame): DataFrame = {
    // unique path per call: a second materialize under the same name
    // must not clean the files a previously returned (lazy) frame still
    // reads. Stale dirs from prior sessions are overwritten on path
    // collision by the clean below; within a session paths never repeat.
    val path = s"$dir/mat_${name}_${matSeq.incrementAndGet()}"
    clean(path)
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
