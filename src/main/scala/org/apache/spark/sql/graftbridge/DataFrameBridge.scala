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
}
