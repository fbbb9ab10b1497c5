package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` shim: execute a Catalyst [[LogicalPlan]] as a
  * DataFrame. Spark exposes `spark.sql(text)` but no public "run this
  * (possibly transformed) parse tree", so graft's SQL→snapshot-catalog
  * bridge — which substitutes catalog relations in the PLAN, never in
  * the query text — needs `classic.Dataset.ofRows`. This object lives
  * under `org.apache.spark.sql` purely to satisfy that access scope;
  * the standard pattern used by Spark extension libraries.
  *
  * Analysis is eager (`ofRows` runs the analyzer), so callers may drop
  * any temp views the plan references as soon as this returns.
  */
object PlanExec {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Test-side probe for `SparkSessionExtensions.buildOptimizerRules`
    * (`private[sql]`): lets specs assert an extensions class wires its
    * rules without racing other suites for the JVM's default session.
    */
  def optimizerRulesOf(exts: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]] =
    exts.buildOptimizerRules(spark.asInstanceOf[classic.SparkSession])
}
