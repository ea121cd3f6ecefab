package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** SQL-text surface (VERDICT r12 #2): `SELECT` (+ time travel),
  * `INSERT`, `DELETE`, `UPDATE`, `MERGE INTO`, DDL — parsed by vanilla
  * Spark, routed through [[graft.sql.GraftCatalog]] +
  * [[graft.sql.GraftSqlRule]] to the versioned-table verbs. */
class SqlSurfaceSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sqlwh").toString
    spark.conf.set("spark.sql.catalog.g", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g.root", d)
    d
  }

  private def freshTable(name: String, n: Int = 1000, files: Int = 4): String = {
    val dir = s"$wh/$name"
    VersionedTable.overwrite(spark, dir,
      (0 until n).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "v", "grp")
        .repartitionByRange(files, col("id")).sortWithinPartitions("id"))
    dir
  }

  test("SELECT routes through the planner-integrated versioned scan; VERSION AS OF time-travels") {
    freshTable("sel")
    assert(spark.sql("SELECT count(*) c FROM g.sel").head().getLong(0) == 1000L)
    // the plan must be the SnapshotFileIndex scan (GraftSqlRule's fast
    // path), NOT the V1Scan fallback or a plain parquet listing
    val qe = spark.sql("SELECT id, v FROM g.sel WHERE id BETWEEN 10 AND 19")
    assert(qe.queryExecution.executedPlan.toString.contains("SnapshotFileIndex"),
      s"expected the versioned FileIndex in:\n${qe.queryExecution.executedPlan}")
    assert(qe.count() == 10)
    // time travel: v1 appends, both versions stay SQL-addressable
    VersionedTable.append(spark, s"$wh/sel", Seq((5000L, "x", 0)).toDF("id", "v", "grp"))
    assert(spark.sql("SELECT count(*) c FROM g.sel").head().getLong(0) == 1001L)
    assert(spark.sql("SELECT count(*) c FROM g.sel VERSION AS OF 0").head().getLong(0) == 1000L)
    assert(spark.sql("SELECT count(*) c FROM g.sel VERSION AS OF 1").head().getLong(0) == 1001L)
    // joins across catalog tables resolve through the same path
    freshTable("sel2", n = 50)
    assert(spark.sql(
      "SELECT count(*) c FROM g.sel a JOIN g.sel2 b ON a.id = b.id").head().getLong(0) == 50L)
  }

  test("INSERT INTO appends a version; INSERT OVERWRITE replaces (V1 write bridge)") {
    freshTable("ins", n = 100, files = 1)
    spark.sql("INSERT INTO g.ins VALUES (9000, 'nine', 1), (9001, 'nine1', 2)")
    assert(VersionedTable.read(spark, s"$wh/ins").count() == 102)
    assert(VersionedTable.versions(s"$wh/ins") == Seq(0L, 1L))
    spark.sql("INSERT OVERWRITE g.ins SELECT id, v, grp FROM g.ins WHERE id >= 9000")
    assert(VersionedTable.read(spark, s"$wh/ins").count() == 2)
    // the overwrite is a new VERSION, not a truncation of history
    assert(VersionedTable.read(spark, s"$wh/ins", Some(1L)).count() == 102)
  }

  test("DELETE routes to the bounded auto-pruned delete verb") {
    freshTable("del")
    spark.sql("DELETE FROM g.del WHERE id BETWEEN 100 AND 149 AND grp <> 3")
    val want = 1000L - (100 until 150).count(_ % 7 != 3)
    assert(VersionedTable.read(spark, s"$wh/del").count() == want)
    // the delete committed ONE bounded rewrite version
    assert(VersionedTable.versions(s"$wh/del") == Seq(0L, 1L))
    val h = VersionedTable.history(spark, s"$wh/del")
      .filter(col("version") === 1L).select("operation").head().getString(0)
    assert(h == "DELETE", s"history must record the SQL delete as DELETE, got $h")
  }

  test("UPDATE with arbitrary per-column expressions routes to updateWhere") {
    freshTable("upd")
    spark.sql("UPDATE g.upd SET v = concat(v, '!'), grp = grp + 10 WHERE id < 10")
    val got = VersionedTable.read(spark, s"$wh/upd").filter(col("id") < 10)
      .orderBy("id").select("v", "grp").as[(String, Int)].collect()
    assert(got.forall { case (v, g) => v.endsWith("!") && g >= 10 },
      s"updated rows must carry both expressions: ${got.take(3).toSeq}")
    assert(VersionedTable.read(spark, s"$wh/upd")
      .filter(col("v").endsWith("!")).count() == 10)
  }

  test("MERGE INTO routes to the bounded merge with SQL clause semantics") {
    freshTable("mrg", n = 200, files = 2)
    Seq((5L, "updated", 99), (6L, "deleted", 0), (777L, "inserted", 1))
      .toDF("id", "v", "grp").createOrReplaceTempView("src")
    spark.sql("""
      MERGE INTO g.mrg t USING src s ON t.id = s.id
      WHEN MATCHED AND s.v = 'deleted' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
    """)
    val m = VersionedTable.read(spark, s"$wh/mrg")
    assert(m.count() == 200) // -1 deleted +1 inserted
    assert(m.filter(col("id") === 5L).select("v").head().getString(0) == "updated")
    assert(m.filter(col("id") === 6L).isEmpty)
    assert(m.filter(col("id") === 777L).select("v").head().getString(0) == "inserted")
    // delete-listed-first order folds into the engine's update guard:
    // the same source with clauses flipped updates NOTHING it deletes
    Seq((7L, "deleted", 0)).toDF("id", "v", "grp").createOrReplaceTempView("src2")
    spark.sql("""
      MERGE INTO g.mrg t USING src2 s ON t.id = s.id
      WHEN MATCHED AND s.v = 'deleted' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
    """)
    assert(VersionedTable.read(spark, s"$wh/mrg").filter(col("id") === 7L).isEmpty)
  }

  test("DDL: CREATE TABLE / SHOW TABLES / DROP TABLE against the warehouse layout") {
    spark.sql("CREATE TABLE g.fresh (id BIGINT, name STRING) USING parquet")
    assert(VersionedTable.isVersioned(s"$wh/fresh"))
    spark.sql("INSERT INTO g.fresh VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT count(*) c FROM g.fresh").head().getLong(0) == 2L)
    val names = spark.sql("SHOW TABLES IN g").select("tableName")
      .as[String].collect().toSet
    assert(names.contains("fresh"))
    spark.sql("DROP TABLE g.fresh")
    assert(!VersionedTable.isVersioned(s"$wh/fresh"))
  }

  test("unsupported SQL shapes refuse loudly, never silently mis-merge") {
    freshTable("ref", n = 20, files = 1)
    Seq((1L, "x", 0)).toDF("id", "v", "grp").createOrReplaceTempView("rsrc")
    val e1 = intercept[Exception] {
      spark.sql("MERGE INTO g.ref t USING rsrc s ON t.id > s.id " +
        "WHEN MATCHED THEN UPDATE SET *")
    }
    assert(e1.getMessage.contains("equi-key"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("MERGE INTO g.ref t USING rsrc s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET v = concat(s.v, '!')")
    }
    assert(e2.getMessage.contains("star-equivalent"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("DELETE FROM g.ref VERSION AS OF 0 WHERE id = 1")
    }
    assert(e3 != null) // time-travel DML refuses (parser or rule)
  }
}
