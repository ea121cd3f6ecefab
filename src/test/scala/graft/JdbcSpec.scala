package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.run.{Pipeline, Warehouse}
import graft.sources.{Jdbc, JdbcTableSource, ParquetDirSource, Tables}

/** End-to-end JDBC proof (SURVEY §2.1 S1-S3/S6) against embedded Derby —
  * the one real JDBC engine on the Spark classpath. Fixture tables are
  * loaded into Derby through Spark's own JDBC writer, then every scan
  * builder is exercised against the live database and compared
  * row-for-row with the parquet twin: options assembly (quoting,
  * timestamp literals, partitioning bounds) is exactly what structural
  * tests can't see. */
class JdbcSpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val DerbyDriver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
  private lazy val conn = Jdbc.Conn(url, "app", "app", driver = Some(DerbyDriver))

  // one-time Derby load: region + nation full fixtures, plus a timestamped
  // events slice for the incremental scan
  private lazy val seeded: Unit = {
    Class.forName(DerbyDriver)
    DriverManager.getConnection(url).close()
    val region = Tables.load(spark, sfDir, "region")
    val nation = Tables.load(spark, sfDir, "nation")
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("value"))
    Seq("region" -> region, "nation" -> nation, "events" -> events).foreach {
      case (name, df) =>
        df.write.format("jdbc")
          .option("url", url).option("driver", DerbyDriver)
          .option("dbtable", name).mode("overwrite").save()
    }
  }

  test("S1: JDBC full scan is row-identical to the parquet twin") {
    seeded
    val viaJdbc = Jdbc.fullScan(spark, conn, "region")
    val parquet = Tables.load(spark, sfDir, "region")
    assert(viaJdbc.columns.toSeq == parquet.columns.toSeq) // S6: introspection
    assert(viaJdbc.orderBy("r_regionkey").collect().map(_.toString).toSeq ==
      parquet.orderBy("r_regionkey").collect().map(_.toString).toSeq)
  }

  test("S1: range partitioning splits the scan without changing results") {
    seeded
    val parts = Jdbc.RangePartitioning("n_nationkey", 0, 24, 4)
    val df = Jdbc.fullScan(spark, conn, "nation", Some(parts))
    assert(df.rdd.getNumPartitions == 4, "executors must pull ranges in parallel")
    val parquet = Tables.load(spark, sfDir, "nation")
    assert(df.orderBy("n_nationkey").collect().map(_.toString).toSeq ==
      parquet.orderBy("n_nationkey").collect().map(_.toString).toSeq)
    assert(df.count() == 25)
  }

  test("S2: pushdown query executes in the database") {
    seeded
    // Spark's JDBC writer creates case-sensitive quoted columns, so
    // user-supplied SQL must quote them back — exactly the options-assembly
    // class of bug a structural test can't see
    val agg = Jdbc.pushdownQuery(spark, conn,
      """SELECT "n_regionkey", COUNT(*) AS n FROM nation GROUP BY "n_regionkey"""")
    assert(agg.count() == 5)
    assert(agg.agg(sum("n")).head().getLong(0) == 25L)
  }

  test("S3: incremental scan pushes the watermark WHERE with overlap") {
    seeded
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
    val wm = events.agg(percentile_approx(col("ts"), lit(0.5), lit(100)))
      .head().getTimestamp(0)
    val overlap = 3600L
    // tsCol goes into the WHERE verbatim: the caller quotes it the way the
    // target dialect expects (Spark-written Derby columns are quoted lowercase)
    val got = Jdbc.incrementalScan(spark, conn, "events", "\"ts\"",
      new java.sql.Timestamp(wm.getTime),
      overlapSeconds = overlap, tsLiteral = Jdbc.Dialects.derbyTs)
    val cut = new java.sql.Timestamp(wm.getTime - overlap * 1000L)
    val expected = events.filter(col("ts") > lit(cut))
    assert(got.count() == expected.count())
    assert(got.count() > 0 && got.count() < events.count(),
      "watermark must actually restrict the scan")
    assert(got.agg(min("ts")).head().getTimestamp(0).after(cut))
  }

  test("bronze run from the JDBC source is row-identical to the parquet-source run") {
    seeded
    val clock = () => java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val jdbcRoot = java.nio.file.Files.createTempDirectory("graft_wh_jdbc").toString
    val pqRoot = java.nio.file.Files.createTempDirectory("graft_wh_pq").toString
    val viaJdbc = new Pipeline(Warehouse(spark, jdbcRoot),
      JdbcTableSource(conn, Seq("region", "nation")), "exec-jdbc", clock)
    val viaPq = new Pipeline(Warehouse(spark, pqRoot),
      ParquetDirSource(sfDir, Seq("region", "nation")), "exec-jdbc", clock)
    val rj = viaJdbc.runBronze()
    val rp = viaPq.runBronze()
    assert(rj.tables == rp.tables)
    for (t <- Seq("bronze_region", "bronze_nation")) {
      val a = Warehouse(spark, jdbcRoot).read(t)
      val sortCols = a.columns.sorted.toSeq
      val b = Warehouse(spark, pqRoot).read(t).select(a.columns.map(col): _*)
      assert(a.orderBy(sortCols.map(col): _*).collect().map(_.toString).toSeq ==
        b.orderBy(sortCols.map(col): _*).collect().map(_.toString).toSeq, s"$t differs")
    }
  }
}
