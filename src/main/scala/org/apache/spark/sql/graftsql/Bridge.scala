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

/** SQL MERGE in its FULL form — partial assignments, expressions over
  * `t.*`/`s.*`, per-clause conditions — via SOURCE ENRICHMENT: one
  * left join of the source against the target materializes, per target
  * column, the value the row would take if its clause fires (update
  * branch may reference target values — `SET v = t.v + s.delta`;
  * insert branch fills unassigned columns with NULL, SQL's rule) plus
  * the clause conditions as boolean flag columns, and the engine's
  * whole-row bounded merge then applies it exactly. Keys pass through
  * as `s.<k>` so the merge's source-derived pruning is unchanged. Costs
  * one extra target-side join pass the star form doesn't pay — the
  * star form remains [[graft.sql.GraftSqlRule]]'s fast path.
  *
  * `updSet`/`insSet` values and the conditions are Columns over the
  * `t.`/`s.` aliases of the enrichment join; flags land as extra
  * source columns, which the engine keeps condition-only. */
case class GraftMergeEnrichedCommand(root: String,
                                     source: LogicalPlan,
                                     keys: Seq[String],
                                     updSet: Seq[(String, org.apache.spark.sql.Column)],
                                     insSet: Seq[(String, org.apache.spark.sql.Column)],
                                     hasUpdate: Boolean, hasDelete: Boolean,
                                     hasInsert: Boolean,
                                     updCond: Option[org.apache.spark.sql.Column],
                                     delCond: Option[org.apache.spark.sql.Column],
                                     insCond: Option[org.apache.spark.sql.Column],
                                     deleteListedFirst: Boolean)
    extends GraftLeafCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not, when}
    import graft.sources.VersionedTable
    val updByCol = updSet.toMap
    val insByCol = insSet.toMap
    val tgt = VersionedTable.table(spark, root)
      .withColumn("__t_m", lit(true)).alias("t")
    val src = Bridge.ofRows(spark, source).alias("s")
    val joined = src.join(tgt,
      keys.map(k => col(s"s.$k") === col(s"t.$k")).reduce(_ && _), "left")
    val matched = col("t.__t_m").isNotNull
    val targetCols = VersionedTable.logicalSchema(root)
      .map(_.fieldNames.toSeq)
      .getOrElse(VersionedTable.read(spark, root).schema.fieldNames.toSeq)
    val valueCols = targetCols.map { c =>
      if (keys.contains(c)) col(s"s.$c").as(c)
      else when(matched, updByCol.getOrElse(c, col(s"t.$c")))
        .otherwise(insByCol.get(c).getOrElse(lit(null))).as(c)
    }
    def flag(on: org.apache.spark.sql.Column,
             cond: Option[org.apache.spark.sql.Column]) =
      when(on, coalesce(cond.getOrElse(lit(true)), lit(false)))
        .otherwise(lit(false))
    val flagCols =
      (if (hasUpdate) Seq(flag(matched, updCond).as("__uc")) else Nil) ++
      (if (hasDelete) Seq(flag(matched, delCond).as("__dc")) else Nil) ++
      (if (hasInsert) Seq(flag(not(matched), insCond).as("__ic")) else Nil)
    val enriched = joined.select(valueCols ++ flagCols: _*)
    // SQL evaluates matched clauses in listed order; the engine is
    // fixed update-then-delete — a delete listed FIRST folds into the
    // update guard (same algebra as the star path)
    val uw =
      if (!hasUpdate) None
      else if (hasDelete && deleteListedFirst)
        Some(col("s.__uc") && not(col("s.__dc")))
      else Some(col("s.__uc"))
    VersionedTable.mergeInto(spark, root, enriched, keys,
      updateWhen = uw,
      deleteWhen = if (hasDelete) Some(col("s.__dc")) else None,
      insertWhen = if (hasInsert) Some(col("s.__ic")) else None)
    Seq.empty
  }
}

/** SQL `VACUUM <tbl> [RETAIN n HOURS] [DRY RUN]` (graft.sql's parser
  * extension) → the retention-windowed vacuum verbs. Lazily executed —
  * EXPLAIN never deletes; DRY RUN reports without touching anything.
  * Returns the (would-)deleted relative paths. */
case class GraftVacuumCommand(root: String, minAgeMs: Option[Long],
                              dryRun: Boolean) extends GraftLeafCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
    Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "path", org.apache.spark.sql.types.StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.sources.VersionedTable
    val age = minAgeMs.getOrElse(VersionedTable.DefaultRetentionMs)
    val paths =
      if (dryRun) VersionedTable.vacuumDryRun(root, minAgeMs = age)._2
      else VersionedTable.vacuum(root, minAgeMs = age)
    paths.map(Row(_))
  }
}

/** SQL `OPTIMIZE <tbl> [ZORDER BY (…)]` (graft.sql's parser extension):
  * plain OPTIMIZE bin-packs the small-file trail (`compactSmall`);
  * ZORDER re-clusters into size-derived file counts. Returns one
  * metrics row. */
case class GraftOptimizeCommand(root: String, zorderCols: Seq[String])
    extends GraftLeafCommand {
  override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.LongType
    Seq(AttributeReference("version", LongType)(),
      AttributeReference("rewritten_files", LongType)(),
      AttributeReference("carried_files", LongType)())
  }
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.sources.VersionedTable
    if (zorderCols.isEmpty) {
      val (v, rw, carried) = VersionedTable.compactSmall(spark, root,
        minBytes = 32L * 1024 * 1024)
      Seq(Row(v, rw.toLong, carried.toLong))
    } else {
      // file count derived from the table's own bytes at the 128 MB
      // Delta target — OPTIMIZE never needs a caller-supplied number
      val bytes = VersionedTable.fileStats(root).values.map(_._1).sum
      val n = math.max(1L, (bytes + (128L << 20) - 1) / (128L << 20)).toInt
      val v = VersionedTable.optimize(spark, root, zorderCols, numFiles = n)
      Seq(Row(v, n.toLong, 0L))
    }
  }
}
