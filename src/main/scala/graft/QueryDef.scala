package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. Column names/types must line up exactly — the driver
  * sorts columns by name and hash-compares values (see SURVEY.md §5).
  *
  * Float discipline: testdata is DOUBLE; aggregates over money-like
  * columns are cast to DECIMAL on BOTH sides so partial-aggregation
  * order (Spark tree-agg vs DuckDB sequential) cannot perturb the hash
  * (SURVEY.md §7.4 item 4).
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
}
