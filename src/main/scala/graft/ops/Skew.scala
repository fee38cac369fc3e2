package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY-brief "salting for skew"):
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * the deterministic fallback when a single key is so hot that even a
  * split partition won't fit (or when AQE is off).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side salted into
    * `salts` sub-partitions per key and the small side replicated once
    * per salt — one hot key becomes `salts` shuffle partitions. Result
    * set is identical to `big.join(small, key)`; cost is a `salts`-fold
    * replication of the SMALL side only, which is the side that fits.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    // content-derived salt: deterministic under task retries (a
    // recomputed map task must route each row to the SAME shuffle
    // partition or reducers see duplicates/losses), and spreads a hot
    // key's rows because non-key columns vary within the key
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(salts.toLong))
        .cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Driver-verified witness: lineitem⋈orders salted 8 ways, then a
    * grouped aggregate — the salt column vanishes in the groupBy, so
    * the oracle is the plain join. (orders is "small" only relative to
    * lineitem; in a real skew case it would be the dimension side.)
    */
  val saltedJoinAgg = QueryDef(
    "q14_skew_salted_join",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val ords = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      saltedJoin(li, ords, "l_orderkey", salts = 8)
        .groupBy((col("o_custkey") % 100).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(Relational.cents(col("l_quantity"))).as("sum_qty"))
    },
    Some("""
      SELECT o_custkey % 100 AS bucket, count(*) AS n,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(saltedJoinAgg, Bucketing.bucketedJoinAgg)
}

/** Co-located joins via bucketing — the shuffle-elimination pattern for
  * repeatedly-joined fact tables at 100 TB: both sides pre-hashed into
  * the same bucket count on the join key, so the join reads bucket i
  * against bucket i with NO exchange (asserted in PlanSpec).
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and sorted) on `key`.
    * Drops any previous incarnation first — the warehouse directory
    * outlives the in-memory catalog, so a stale location from an
    * earlier session would otherwise block the CREATE. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = s.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    graft.Work.clean(s"$warehouse/$table")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Driver-verified witness: orders and customer bucketed 8 ways on
    * the customer key, joined and aggregated — results identical to
    * the plain join (the oracle), plan exchange-free (PlanSpec).
    */
  // bucketing is an INGEST-TIME storage-layout decision — a production
  // table is bucketed once, then every query reads the layout. Prepare
  // the bucketed twins once per (session, sf dir) so the query key
  // measures the exchange-free join, not the re-ingest.
  private val bucketedOnce = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), Boolean]

  val bucketedJoinAgg = QueryDef(
    "q16_bucketed_join",
    (s, dir) => {
      graft.SessionCaches.evictStopped(bucketedOnce)(_._1)
      bucketedOnce.computeIfAbsent((s, dir), _ => {
        writeBucketed(Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
          "graft_b_orders", "o_custkey", buckets = 8)
        writeBucketed(Tables(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          "graft_b_customer", "c_custkey", buckets = 8)
        true
      })
      val o = s.table("graft_b_orders")
      val c = s.table("graft_b_customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(Relational.cents(col("o_totalprice"))).as("total_price"))
    },
    Some("""
      SELECT c_nationkey, count(*) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1"""))
}
