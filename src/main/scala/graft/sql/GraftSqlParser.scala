package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.graftsql.{GraftOptimizeCommand, GraftVacuumCommand}

import graft.sources.VersionedTable

/** Maintenance-verb SQL parser (the Delta `DeltaSqlParser` shape): a
  * tiny pre-parse over four statements vanilla Spark has no grammar
  * for, delegating EVERYTHING else untouched —
  *
  *   - `DESCRIBE HISTORY <cat>.<table>`
  *   - `DESCRIBE DETAIL <cat>.<table>`
  *   - `VACUUM <cat>.<table> [RETAIN <n> HOURS] [DRY RUN]`
  *   - `OPTIMIZE <cat>.<table> [ZORDER BY (c1[, c2…])]`
  *
  * `<cat>` must be a registered [[GraftCatalog]] (resolved through the
  * session conf); anything else falls through to the delegate so
  * non-graft statements keep their native errors. DESCRIBE variants
  * return the metadata frames' own plans (driver-side metadata reads —
  * the DESCRIBE contract); VACUUM/OPTIMIZE build lazily-executed
  * commands, so `EXPLAIN` never triggers a side effect. */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case HistoryRe(cat, tbl) =>
      rootOf(spark, cat, tbl).map(root =>
          VersionedTable.history(spark, root).queryExecution.logical)
        .getOrElse(delegate.parsePlan(sqlText))
    case DetailRe(cat, tbl) =>
      rootOf(spark, cat, tbl).map(root =>
          VersionedTable.describeDetail(spark, root).queryExecution.logical)
        .getOrElse(delegate.parsePlan(sqlText))
    case VacuumRe(cat, tbl, hours, dry) =>
      rootOf(spark, cat, tbl).map(root =>
          GraftVacuumCommand(root,
            Option(hours).map(h => h.toLong * 60 * 60 * 1000),
            dryRun = dry != null): LogicalPlan)
        .getOrElse(delegate.parsePlan(sqlText))
    case OptimizeRe(cat, tbl, zcols) =>
      rootOf(spark, cat, tbl).map(root =>
          GraftOptimizeCommand(root,
            Option(zcols).toSeq.flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)))
            : LogicalPlan)
        .getOrElse(delegate.parsePlan(sqlText))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

object GraftSqlParser {
  private val Id = """([A-Za-z_][A-Za-z0-9_]*)"""
  private val HistoryRe =
    s"""(?is)\\s*DESCRIBE\\s+HISTORY\\s+$Id\\.$Id\\s*;?\\s*""".r
  private val DetailRe =
    s"""(?is)\\s*DESCRIBE\\s+DETAIL\\s+$Id\\.$Id\\s*;?\\s*""".r
  private val VacuumRe =
    s"""(?is)\\s*VACUUM\\s+$Id\\.$Id(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  private val OptimizeRe =
    s"""(?is)\\s*OPTIMIZE\\s+$Id\\.$Id(?:\\s+ZORDER\\s+BY\\s*\\(([^)]*)\\))?\\s*;?\\s*""".r

  /** The table's root iff `<cat>` is a registered [[GraftCatalog]] with
    * a root and the table exists — else None (fall through). */
  private def rootOf(spark: SparkSession, cat: String, tbl: String): Option[String] =
    spark.conf.getOption(s"spark.sql.catalog.$cat")
      .filter(_ == classOf[GraftCatalog].getName)
      .flatMap(_ => spark.conf.getOption(s"spark.sql.catalog.$cat.root"))
      .map(r => s"$r/$tbl")
      .filter(VersionedTable.isVersioned)
}
