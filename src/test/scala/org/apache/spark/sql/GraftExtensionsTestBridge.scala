package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression

/** Test-only bridge into `private[sql]`
  * `SparkSessionExtensions.registerFunctions`: lets the suite verify
  * the extensions-injection path without building a fresh
  * SparkContext (the `spark.sql.extensions` conf is static, so a
  * shared-JVM test can never observe it through a real session). */
object GraftExtensionsTestBridge {

  private def freshRegistry(ext: SparkSessionExtensions): SimpleFunctionRegistry = {
    val reg = new SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg
  }

  def registeredNames(ext: SparkSessionExtensions): Seq[String] =
    freshRegistry(ext).listFunction().map(_.funcName)

  def buildExpression(
      ext: SparkSessionExtensions, name: String, args: Seq[Expression]): Expression =
    freshRegistry(ext).lookupFunction(FunctionIdentifier(name), args)

  /** The optimizer rules the extensions would inject into a session —
    * verifies `injectOptimizerRule` registrations actually happened. */
  def injectedOptimizerRules(
      ext: SparkSessionExtensions, spark: SparkSession): Seq[AnyRef] =
    ext.buildOptimizerRules(spark)
}
