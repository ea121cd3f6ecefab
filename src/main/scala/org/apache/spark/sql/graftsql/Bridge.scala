package org.apache.spark.sql.graftsql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The ONE file that lives inside Spark's `org.apache.spark.sql`
  * namespace — the standard extension-library pattern (Delta Lake is
  * `org.apache.spark.sql.delta` for the same reason): two `private[sql]`
  * seams the SQL-text surface needs and nothing else. All real logic
  * stays in `graft.sql`. */
object Bridge {

  /** A DataFrame over an already-analyzed logical plan — how a command
    * intercepted from SQL text re-enters the engine's DataFrame verbs
    * (`Dataset.ofRows` is `private[sql]`). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A `Column` over a catalyst `Expression` (Spark 4's Column wraps
    * `ColumnNode`s; the Expression bridge is `private[sql]`). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}

/** Eagerly-executed leaf command (`RunnableCommand` is `private[sql]`):
  * the DML interception rule replaces a resolved MERGE/UPDATE/DELETE
  * with one of these, and QueryExecution's command path runs it.
  *
  * Conditions/assignments are stored as `Column`s (NOT raw
  * `Expression` fields): a leaf command whose product elements carried
  * unresolved expressions would flunk CheckAnalysis's unresolved-
  * operator sweep — a Column is opaque to `QueryPlan.expressions`, and
  * the remapped-by-name attributes inside it resolve against the verb's
  * own frame at run time. */
abstract class GraftLeafCommand
    extends org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL `DELETE FROM <graft table> WHERE <cond>` → the bounded
  * auto-pruned delete verb. */
case class GraftDeleteCommand(root: String, cond: org.apache.spark.sql.Column)
    extends GraftLeafCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.sources.VersionedTable.deleteWherePredicate(spark, root, cond)
    Seq.empty
  }
}

/** SQL `UPDATE <graft table> SET … WHERE <cond>` → the bounded
  * auto-pruned update verb. */
case class GraftUpdateCommand(root: String, cond: org.apache.spark.sql.Column,
                              set: Seq[(String, org.apache.spark.sql.Column)])
    extends GraftLeafCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.sources.VersionedTable.updateWhere(spark, root, cond, set.toMap)
    Seq.empty
  }
}

/** SQL `MERGE INTO <graft table> USING <source> ON … WHEN …` → the
  * full-form bounded merge verb. `source` is the resolved source plan
  * captured at analysis time; re-entering it through [[Bridge.ofRows]]
  * re-runs the analyzer, so graft-table reads inside the source resolve
  * through [[graft.sql.GraftSqlRule]]'s fast path too. */
case class GraftMergeCommand(root: String,
                             source: LogicalPlan,
                             keys: Seq[String],
                             updateWhen: Option[org.apache.spark.sql.Column],
                             deleteWhen: Option[org.apache.spark.sql.Column],
                             insertWhen: Option[org.apache.spark.sql.Column],
                             evolveSchema: Boolean)
    extends GraftLeafCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src = Bridge.ofRows(spark, source)
    graft.sources.VersionedTable.mergeInto(spark, root, src, keys,
      updateWhen = updateWhen, deleteWhen = deleteWhen, insertWhen = insertWhen,
      evolveSchema = evolveSchema)
    Seq.empty
  }
}

/** SQL `RESTORE TABLE`-style entry is not parsed by vanilla Spark; kept
  * out deliberately — time travel reads cover the SQL surface. */
