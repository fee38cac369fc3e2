package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-accelerated operators. [[bloomPrefilterJoin]] is the
  * join-side use of a sketch: build a Bloom filter over the small
  * side's keys, pre-filter the big side BEFORE its shuffle, then run
  * the exact join. False positives survive the filter but die in the
  * join, so the result is provably identical to the plain join — the
  * sketch only cuts shuffle volume (at 100 TB, the difference between
  * shuffling the whole fact table and shuffling the ~matching slice;
  * the same idea Spark 3 runtime row-level filtering applies
  * automatically when thresholds allow, made explicit and testable
  * here).
  */
object Sketches {

  /** Exact inner equi-join with a Bloom pre-filter on `big`.
    * @param expectedKeys sizing for the filter (items on small side)
    * @param fpp          false-positive rate (shuffle overhead, not
    *                     correctness)
    */
  def bloomPrefilterJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, expectedKeys: Long, fpp: Double): DataFrame = {
    val bloom = small.stat.bloomFilter(smallKey, expectedKeys, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bloom)
    val mightMatch = udf((k: Long) => bc.value.mightContainLong(k))
    big.filter(mightMatch(col(bigKey)))
      .join(small, col(bigKey) === col(smallKey))
  }

  /** Driver-verified witness: lineitem joined to a 1% slice of orders;
    * the Bloom filter drops ~99% of lineitem before the join shuffle
    * and the result still equals the plain join (the oracle).
    */
  val bloomJoin = QueryDef(
    "q17_bloom_prefilter_join",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val hot = Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
      val n = math.max(1000L, hot.count())
      bloomPrefilterJoin(li, hot, "l_orderkey", "o_orderkey", n, 0.01)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_lines"),
          sum(Relational.cents(col("l_quantity"))).as("sum_qty"))
    },
    Some("""
      SELECT o_custkey, count(*) AS n_lines,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderkey % 100 = 0
      GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(bloomJoin)
}
