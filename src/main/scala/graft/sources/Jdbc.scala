package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** JDBC scan builders (SURVEY §2.1 S1-S3, S6): full-table, pushdown-query,
  * and watermark-incremental reads. Proven end-to-end in JdbcSpec against
  * an embedded Derby database (the one JDBC engine on the Spark classpath);
  * the parquet fixtures stand in behind the same [[TableSource]] trait for
  * the query gates.
  *
  * 100 TB design note: the reference pulls each table over a single JDBC
  * stream; here every scan takes `partitionColumn/lowerBound/upperBound/
  * numPartitions` so executors pull ranges in parallel — the known
  * single-stream fix called out in SURVEY §4.
  */
object Jdbc {

  /** `driver` pins the JDBC driver class when the URL alone can't resolve
    * it through ServiceLoader (e.g. Derby embedded under Spark's child
    * classloaders). */
  final case class Conn(url: String, user: String, password: String,
                        fetchSize: Int = 10000, driver: Option[String] = None)

  final case class RangePartitioning(column: String, lower: Long, upper: Long,
                                     numPartitions: Int)

  private def base(spark: SparkSession, c: Conn): DataFrameReader = {
    val r = spark.read.format("jdbc")
      .option("url", c.url)
      .option("user", c.user)
      .option("password", c.password)
      .option("fetchsize", c.fetchSize.toString)
    c.driver.fold(r)(d => r.option("driver", d))
  }

  private def withParts(r: DataFrameReader, p: Option[RangePartitioning]): DataFrameReader =
    p.fold(r)(rp => r
      .option("partitionColumn", rp.column)
      .option("lowerBound", rp.lower.toString)
      .option("upperBound", rp.upper.toString)
      .option("numPartitions", rp.numPartitions.toString))

  /** S1 — full-table scan. */
  def fullScan(spark: SparkSession, c: Conn, table: String,
               parts: Option[RangePartitioning] = None): DataFrame =
    withParts(base(spark, c).option("dbtable", table), parts).load()

  /** S2 — arbitrary SQL pushed to the source. */
  def pushdownQuery(spark: SparkSession, c: Conn, sql: String): DataFrame =
    base(spark, c).option("query", sql).load()

  /** Identifier shapes we will interpolate into pushed-down SQL: a plain
    * (dotted, at most 3-part) SQL identifier, or the caller's own
    * `"…"`-quoted form — Spark's JDBC writer creates case-sensitive quoted
    * lowercase columns, so callers MUST pass the quoted form back when the
    * column was written that way (JdbcSpec passes `"ts"`). Anything else
    * (whitespace, semicolons, comment markers) is rejected, so an
    * identifier sourced from config or source metadata cannot smuggle SQL
    * into the generated query. */
  private val IdentPattern =
    """^(?:[A-Za-z_][A-Za-z0-9_$]*|"[^"]+")(?:\.(?:[A-Za-z_][A-Za-z0-9_$]*|"[^"]+")){0,2}$""".r

  private def requireIdent(kind: String, s: String): String = {
    require(IdentPattern.findFirstIn(s).isDefined,
      s"""$kind must be a plain or "…"-quoted SQL identifier, got: $s""")
    s
  }

  /** S3 — watermark-incremental scan with the reference's fixed overlap:
    * `WHERE <tsCol> > <literal(watermark - overlap)>`, pushed into the
    * source. `tsLiteral` renders the timestamp for the target dialect:
    * the default plain-quoted string comparison is what SQL Server /
    * Postgres / MySQL accept (and what the reference emits); Derby needs
    * `TIMESTAMP('…')` ([[Dialects.derbyTs]]).
    *
    * QUOTING CONTRACT: `table` and `tsCol` are interpolated verbatim into
    * the pushed-down SQL, validated against [[IdentPattern]] — pass
    * already-quoted identifiers (`"ts"`) when the source column is
    * case-sensitive (see [[Dialects.quoteIdent]]). */
  def incrementalScan(spark: SparkSession, c: Conn, table: String, tsCol: String,
                      watermark: java.sql.Timestamp, overlapSeconds: Long = 3600,
                      parts: Option[RangePartitioning] = None,
                      tsLiteral: java.sql.Timestamp => String = Dialects.quotedTs): DataFrame = {
    val from = new java.sql.Timestamp(watermark.getTime - overlapSeconds * 1000L)
    val sql = s"SELECT * FROM ${requireIdent("table", table)} " +
      s"WHERE ${requireIdent("tsCol", tsCol)} > ${tsLiteral(from)}"
    withParts(base(spark, c).option("query", sql), parts).load()
  }

  /** Per-dialect SQL timestamp literal renderers for the incremental WHERE. */
  object Dialects {
    val quotedTs: java.sql.Timestamp => String = t => s"'$t'"
    val derbyTs: java.sql.Timestamp => String = t => s"TIMESTAMP('$t')"
    /** SQL-standard literal (Postgres, Oracle, Trino). */
    val ansiTs: java.sql.Timestamp => String = t => s"TIMESTAMP '$t'"
    /** ANSI double-quote identifier quoting (Derby/Postgres/Oracle/Trino);
      * embedded quotes doubled per the standard. */
    val quoteIdent: String => String = s => "\"" + s.replace("\"", "\"\"") + "\""
  }
}

/** S4-style table source over a JDBC connection: the medallion pipeline
  * runs identically off a database or the parquet fixtures. `parts`
  * supplies per-table range partitioning so big tables are pulled by
  * multiple executors in parallel. */
final case class JdbcTableSource(conn: Jdbc.Conn, tables: Seq[String],
    parts: Map[String, Jdbc.RangePartitioning] = Map.empty)
  extends TableSource {
  def read(spark: SparkSession, table: String): DataFrame =
    Jdbc.fullScan(spark, conn, table, parts.get(table))
  def list(spark: SparkSession): Seq[String] = tables
}

/** Source abstraction so the pipeline runs identically off JDBC or the
  * parquet fixtures (S4): `read(table)` returns the raw relation. */
trait TableSource {
  def read(spark: SparkSession, table: String): DataFrame
  def list(spark: SparkSession): Seq[String]
}

final case class ParquetDirSource(dir: String, tables: Seq[String]) extends TableSource {
  def read(spark: SparkSession, table: String): DataFrame =
    Tables.load(spark, dir, table)
  def list(spark: SparkSession): Seq[String] = tables
}

/** Generic file-format source: one `<dir>/<table>.<ext>` per table in any
  * Spark-supported format (csv/json/orc/parquet). CSV/JSON read with an
  * optional explicit schema — at scale, always pass one: schema inference
  * is a full extra pass over the data. */
final case class FileFormatSource(dir: String, format: String, tables: Seq[String],
    schemas: Map[String, org.apache.spark.sql.types.StructType] = Map.empty,
    options: Map[String, String] = Map.empty) extends TableSource {
  def read(spark: SparkSession, table: String): DataFrame = {
    val base = spark.read.format(format).options(options)
    val r = if (format == "csv") base.option("header", "true") else base
    val withSchema = schemas.get(table).fold {
      if (format == "csv") r.option("inferSchema", "true") else r
    }(r.schema)
    withSchema.load(s"$dir/$table.$format")
  }
  def list(spark: SparkSession): Seq[String] = tables
}
