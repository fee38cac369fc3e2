package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.classic.SparkSession

/** Access to a live session's FunctionRegistry (private[sql] via
  * sessionState) so graft's native expressions can be registered by SQL
  * name on an existing session — the in-process twin of configuring
  * `spark.sql.extensions=graft.GraftExtensions` at session build.
  */
object FunctionBridge {
  def registry(spark: org.apache.spark.sql.SparkSession): FunctionRegistry =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
}
