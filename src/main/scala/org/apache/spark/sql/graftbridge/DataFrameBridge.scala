package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.types.StructType

/** Bridge to `SparkSession.internalCreateDataFrame` (private[sql]):
  * wraps an already-computed `RDD[InternalRow]` as a LogicalRDD *leaf*
  * DataFrame without the Row round-trip of the public
  * `createDataFrame(rdd, schema)`. Iterative algorithms (connected
  * components) re-root each round's result on a leaf so the logical
  * plan stays one round deep instead of growing 3^N.
  */
object DataFrameBridge {
  def fromInternalRows(spark: org.apache.spark.sql.SparkSession,
      rows: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[SparkSession].internalCreateDataFrame(rows, schema)

  /** Wrap an analyzed/optimized LogicalPlan as a DataFrame (the
    * private[sql] `Dataset.ofRows`). Used by optimizer rules that need
    * a bounded statistics sample of a sub-plan (RangeJoinRewrite's
    * auto bin derivation). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[SparkSession], plan)
}
