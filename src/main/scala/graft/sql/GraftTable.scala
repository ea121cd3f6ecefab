package graft.sql

import java.util

import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.VersionedTable

/** One versioned table served through DSv2 (loaded by [[GraftCatalog]],
  * optionally pinned to a time-travel `version`).
  *
  * Split of responsibilities, deliberately Delta-shaped:
  *   - the FAST read path is NOT here — [[GraftSqlRule]] replaces this
  *     relation at resolution time with the planner-integrated
  *     [[VersionedTable.table]] plan (SnapshotFileIndex: commit-list
  *     file pruning, bloom probes, pushdown), exactly as Delta swaps
  *     its DSv2 relation for a log-backed V1 plan;
  *   - [[V1Scan]] below is the no-extensions FALLBACK so a session that
  *     registered only the catalog still reads correctly (full scan);
  *   - WRITES go through the public [[V1Write]] bridge: `INSERT INTO`
  *     appends, `INSERT OVERWRITE`/CTAS overwrite — one entry point,
  *     the versioned commit protocol underneath;
  *   - [[SupportsDelete]] keeps Spark's own `RewriteDeleteFromTable`
  *     from refusing the plan before [[GraftSqlRule]] rewrites it (and
  *     serves filter-based DELETE when the rule is absent). */
class GraftTable(fullName: String, val root: String, val pinnedVersion: Option[Long])
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  override def name(): String = fullName

  override lazy val schema: StructType =
    VersionedTable.logicalSchema(root, pinnedVersion).getOrElse {
      VersionedTable.read(SparkSession.active, root, pinnedVersion).schema
    }

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.V1_BATCH_WRITE)
    s.add(TableCapability.OVERWRITE_BY_FILTER)
    s.add(TableCapability.TRUNCATE)
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = schema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = GraftTable.this.schema
            override def buildScan(): org.apache.spark.rdd.RDD[Row] =
              VersionedTable.table(context.sparkSession, root, pinnedVersion).rdd
          }.asInstanceOf[T]
      }
    }

  /** Write modes: append (`INSERT INTO`), truncate-overwrite (`INSERT
    * OVERWRITE`, CTAS) and FILTERED overwrite (`INSERT OVERWRITE …
    * PARTITION (p=…)` — Spark plans `OverwriteByExpression` with the
    * static partition filter), backing the advertised
    * `OVERWRITE_BY_FILTER` capability honestly: a translatable filter
    * routes to the one-commit [[VersionedTable.replaceWhere]] verb; an
    * untranslatable one refuses at ANALYSIS via [[canOverwrite]], never
    * at write-build (ADVICE r13). */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsOverwrite {
      private var overwrite = false
      private var replaceCond: Option[org.apache.spark.sql.Column] = None
      override def canOverwrite(filters: Array[Filter]): Boolean =
        filters.forall(f => FilterToColumn.translate(f).isDefined)
      override def truncate(): WriteBuilder = {
        overwrite = true; replaceCond = None; this
      }
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        if (filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
          return truncate()
        overwrite = true
        replaceCond = Some(filters.toSeq.map(f =>
          FilterToColumn.translate(f).getOrElse(throw new UnsupportedOperationException(
            s"overwrite filter `$f` on $fullName is not translatable")))
          .reduce(_ && _))
        this
      }
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteMode: Boolean): Unit = {
              require(pinnedVersion.isEmpty, s"cannot write to a time-travel pin: $fullName")
              val spark = data.sparkSession
              replaceCond match {
                case Some(cond) =>
                  VersionedTable.replaceWhere(spark, root, data, cond)
                case None =>
                  if (overwrite || overwriteMode)
                    VersionedTable.overwrite(spark, root, data,
                      partitionBy = VersionedTable.partitionCols(root))
                  else VersionedTable.append(spark, root, data)
              }
              ()
            }
          }
      }
    }

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => FilterToColumn.translate(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(pinnedVersion.isEmpty, s"cannot DELETE from a time-travel pin: $fullName")
    import org.apache.spark.sql.functions.lit
    val spark = SparkSession.active
    val cond = filters.toSeq.flatMap(FilterToColumn.translate)
      .reduceOption(_ && _).getOrElse(lit(true))
    VersionedTable.deleteWherePredicate(spark, root, cond)
    ()
  }
}

/** V1 `Filter` → `Column` for the filter-based DELETE fallback (the
  * [[GraftSqlRule]] path handles arbitrary conditions; this handles the
  * translatable subset Spark pushes when the rule is absent). */
private[sql] object FilterToColumn {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not}
  import org.apache.spark.sql.sources._

  def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for { a <- translate(l); b <- translate(r) } yield a && b
    case Or(l, r) => for { a <- translate(l); b <- translate(r) } yield a || b
    case Not(c) => translate(c).map(not)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
