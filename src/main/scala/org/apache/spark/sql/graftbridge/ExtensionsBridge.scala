package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Test access to what a `spark.sql.extensions=graft.GraftExtensions`
  * deployment would actually register: the build/register methods of
  * SparkSessionExtensions are private[sql], so the suite pins the
  * cluster wiring through this bridge instead of tearing down the
  * shared test session (getOrCreate cannot re-apply extensions to a
  * live session).
  */
object ExtensionsBridge {
  def optimizerRules(ext: SparkSessionExtensions,
      s: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(s)

  def registerFunctions(ext: SparkSessionExtensions,
      reg: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(reg)
}
