package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door the engine needs: turning a hand-built
  * [[LogicalPlan]] into a DataFrame (`classic.Dataset.ofRows`). Lives in a
  * subpackage of `org.apache.spark.sql` — the standard extension-library
  * technique for plan-level integration (same route Delta/Sedona use);
  * everything else in the engine goes through public API or
  * SparkSessionExtensions.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): Dataset[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
