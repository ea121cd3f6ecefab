package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.graftsql.{GraftAddConstraintCommand, GraftCloneCommand, GraftConvertCommand, GraftDropConstraintCommand, GraftOptimizeCommand, GraftRestoreCommand, GraftVacuumCommand}

import graft.sources.VersionedTable

/** Maintenance-verb SQL parser (the Delta `DeltaSqlParser` shape): a
  * tiny pre-parse over four statements vanilla Spark has no grammar
  * for, delegating EVERYTHING else untouched —
  *
  *   - `DESCRIBE HISTORY <cat>.<table>`
  *   - `DESCRIBE DETAIL <cat>.<table>`
  *   - `VACUUM <cat>.<table> [RETAIN <n> HOURS] [DRY RUN]`
  *   - `OPTIMIZE <cat>.<table> [ZORDER BY (c1[, c2…])]`
  *   - `RESTORE [TABLE] <cat>.<table> TO VERSION AS OF <n> |
  *      TO TIMESTAMP AS OF '<ts>'` (Delta's RESTORE surface)
  *   - `CREATE TABLE <cat>.<dst> SHALLOW CLONE <cat>.<src>
  *      [VERSION AS OF <n>]` (Delta's zero-copy clone surface)
  *   - `ALTER TABLE <cat>.<table> ADD CONSTRAINT <name> CHECK (<expr>)`
  *      / `DROP CONSTRAINT <name>` (Delta's constraint DDL)
  *   - `CONVERT TO GRAFT '<path>'` (the CONVERT TO DELTA surface:
  *      in-place upgrade of a flat parquet directory, zero rewrites)
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
    case RestoreVRe(cat, tbl, v) =>
      rootOf(spark, cat, tbl).map(root =>
          GraftRestoreCommand(root, Some(v.toLong), None): LogicalPlan)
        .getOrElse(delegate.parsePlan(sqlText))
    case RestoreTsRe(cat, tbl, ts) =>
      rootOf(spark, cat, tbl).map(root =>
          GraftRestoreCommand(root, None, Some(parseTsMillis(ts))): LogicalPlan)
        .getOrElse(delegate.parsePlan(sqlText))
    case CloneRe(dcat, dtbl, scat, stbl, v) =>
      (for {
        src <- rootOf(spark, scat, stbl) // the SOURCE must exist ...
        dst <- catRoot(spark, dcat).map(r => s"$r/$dtbl") // ... the target must not
      } yield GraftCloneCommand(src, dst, Option(v).map(_.toLong)): LogicalPlan)
        .getOrElse(delegate.parsePlan(sqlText))
    case AddConstraintRe(cat, tbl, name, expr) =>
      rootOf(spark, cat, tbl).map(root =>
          GraftAddConstraintCommand(root, name, expr.trim): LogicalPlan)
        .getOrElse(delegate.parsePlan(sqlText))
    case DropConstraintRe(cat, tbl, name) =>
      rootOf(spark, cat, tbl).map(root =>
          GraftDropConstraintCommand(root, name): LogicalPlan)
        .getOrElse(delegate.parsePlan(sqlText))
    case ConvertRe(dir) => GraftConvertCommand(dir)
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
  private val RestoreVRe =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$Id\\.$Id\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val RestoreTsRe =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?$Id\\.$Id\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)'\\s*;?\\s*""".r
  private val CloneRe =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+$Id\\.$Id\\s+SHALLOW\\s+CLONE\\s+$Id\\.$Id(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*;?\\s*""".r

  private val AddConstraintRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Id\\.$Id\\s+ADD\\s+CONSTRAINT\\s+$Id\\s+CHECK\\s*\\((.+)\\)\\s*;?\\s*""".r
  private val DropConstraintRe =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$Id\\.$Id\\s+DROP\\s+CONSTRAINT\\s+$Id\\s*;?\\s*""".r
  private val ConvertRe =
    """(?is)\s*CONVERT\s+TO\s+GRAFT\s+'([^']+)'\s*;?\s*""".r

  private def parseTsMillis(s: String): Long =
    s.trim.toLongOption.getOrElse(java.sql.Timestamp.valueOf(s.trim).getTime)

  /** The catalog's warehouse root iff `<cat>` is a registered
    * [[GraftCatalog]] with a root — else None (fall through). */
  private def catRoot(spark: SparkSession, cat: String): Option[String] =
    spark.conf.getOption(s"spark.sql.catalog.$cat")
      .filter(_ == classOf[GraftCatalog].getName)
      .flatMap(_ => spark.conf.getOption(s"spark.sql.catalog.$cat.root"))

  /** The table's root iff `<cat>` is a registered [[GraftCatalog]] with
    * a root and the table exists — else None (fall through). */
  private def rootOf(spark: SparkSession, cat: String, tbl: String): Option[String] =
    catRoot(spark, cat).map(r => s"$r/$tbl").filter(VersionedTable.isVersioned)
}
