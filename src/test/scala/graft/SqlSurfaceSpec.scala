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

  test("full-form MERGE: partial assignments and t-referencing expressions via the enrichment join") {
    freshTable("pmrg", n = 100, files = 2)
    // target rows: (id, v = s"v$id", grp = id % 7)
    Seq((5L, "inc", 10), (6L, "del", 0), (7L, "inc", 20), (900L, "new", 3))
      .toDF("id", "op", "delta").createOrReplaceTempView("pmsrc")
    spark.sql("""
      MERGE INTO g.pmrg t USING pmsrc s ON t.id = s.id
      WHEN MATCHED AND s.op = 'del' THEN DELETE
      WHEN MATCHED AND s.op = 'inc' THEN UPDATE SET grp = t.grp + s.delta, v = concat(t.v, '+')
      WHEN NOT MATCHED AND s.op = 'new' THEN INSERT (id, grp) VALUES (s.id, s.delta)
    """)
    val m = VersionedTable.read(spark, s"$wh/pmrg")
    assert(m.count() == 100) // -1 deleted, +1 inserted
    // partial update: grp += delta, v gets a marker, OTHER columns keep
    val r5 = m.filter(col("id") === 5L).select("v", "grp").head()
    assert(r5.getString(0) == "v5+" && r5.getInt(1) == 5 % 7 + 10, s"got $r5")
    val r7 = m.filter(col("id") === 7L).select("v", "grp").head()
    assert(r7.getString(0) == "v7+" && r7.getInt(1) == 7 % 7 + 20)
    assert(m.filter(col("id") === 6L).isEmpty) // deleted
    // conditional partial insert: unassigned columns are NULL (SQL rule)
    val r900 = m.filter(col("id") === 900L).select("v", "grp").head()
    assert(r900.isNullAt(0) && r900.getInt(1) == 3, s"got $r900")
    // rows whose clause condition did not fire carry untouched
    assert(m.filter(col("id") === 8L).select("v").head().getString(0) == "v8")
    // mixed star + partial: star update with a conditional partial insert
    Seq((10L, "zz", 99), (901L, "yy", 1)).toDF("id", "v", "grp")
      .createOrReplaceTempView("pmsrc2")
    spark.sql("""
      MERGE INTO g.pmrg t USING pmsrc2 s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED AND s.grp = 1 THEN INSERT (id, v) VALUES (s.id, s.v)
    """)
    val m2 = VersionedTable.read(spark, s"$wh/pmrg")
    assert(m2.filter(col("id") === 10L).select("v", "grp")
      .as[(String, Int)].head() == (("zz", 99)))
    val r901 = m2.filter(col("id") === 901L).select("v", "grp").head()
    assert(r901.getString(0) == "yy" && r901.isNullAt(1))
    // insert-ONLY partial merge (no matched clause): matching source
    // rows do nothing, unmatched rows insert with unassigned cols NULL,
    // and every target file carries (the anti-join path)
    val before = VersionedTable.dataFiles(s"$wh/pmrg").toSet
    Seq((902L, "solo", 7), (10L, "nope", 1)).toDF("id", "v", "grp")
      .createOrReplaceTempView("pmsrc3")
    spark.sql("""
      MERGE INTO g.pmrg t USING pmsrc3 s ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
    """)
    val m3 = VersionedTable.read(spark, s"$wh/pmrg")
    val r902 = m3.filter(col("id") === 902L).select("v", "grp").head()
    assert(r902.getString(0) == "solo" && r902.isNullAt(1))
    assert(m3.filter(col("id") === 10L).select("v").head().getString(0) == "zz",
      "a matching source row must not touch the target in an insert-only merge")
    assert(before.subsetOf(VersionedTable.dataFiles(s"$wh/pmrg").toSet),
      "insert-only merges carry every target file byte-untouched")
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

  test("ALTER TABLE routes to the metadata-only schema verbs") {
    freshTable("alt", n = 100, files = 1)
    spark.sql("ALTER TABLE g.alt RENAME COLUMN v TO label")
    assert(spark.sql("SELECT label FROM g.alt WHERE id = 1").head().getString(0) == "v1")
    spark.sql("ALTER TABLE g.alt ADD COLUMNS (score DOUBLE)")
    // existing rows serve NULL for the added column; zero files touched
    assert(spark.sql("SELECT count(*) c FROM g.alt WHERE score IS NULL")
      .head().getLong(0) == 100L)
    spark.sql("ALTER TABLE g.alt DROP COLUMN grp")
    assert(!spark.table("g.alt").columns.contains("grp"))
    // all three were single metadata commits — no data rewrite
    assert(VersionedTable.versions(s"$wh/alt") == Seq(0L, 1L, 2L, 3L))
    assert(VersionedTable.dataFiles(s"$wh/alt").size == 1)
    // an append under the NEW names lands and serves
    spark.sql("INSERT INTO g.alt VALUES (500, 'x', 0.5)")
    assert(spark.sql("SELECT label, score FROM g.alt WHERE id = 500")
      .head().getDouble(1) == 0.5)
    // non-nullable add refuses
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE g.alt ADD COLUMNS (req STRING NOT NULL)")
    }
    assert(e.getMessage.toLowerCase.contains("null"), e.getMessage)
  }

  test("DESCRIBE HISTORY / DESCRIBE DETAIL / VACUUM / OPTIMIZE parse through the extension") {
    freshTable("mnt", n = 400, files = 4)
    spark.sql(s"DELETE FROM g.mnt WHERE id < 50")
    val hist = spark.sql("DESCRIBE HISTORY g.mnt")
      .select("version", "operation").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(hist == Map(0L -> "OVERWRITE", 1L -> "DELETE"), s"got $hist")
    val det = spark.sql("DESCRIBE DETAIL g.mnt").collect()
    assert(det.length == 1)
    // VACUUM DRY RUN reports nothing to delete inside the window and
    // deletes nothing; RETAIN 0 HOURS reclaims the delete's orphans
    assert(spark.sql("VACUUM g.mnt DRY RUN").isEmpty)
    val before = VersionedTable.dataFiles(s"$wh/mnt", Some(0L)).size
    // retire v0 but SPARE its files (wall-clock window): the SQL VACUUM
    // with RETAIN 0 HOURS is then what actually reclaims them
    VersionedTable.vacuum(s"$wh/mnt", keep = Some(1))
    val gone = spark.sql("VACUUM g.mnt RETAIN 0 HOURS").count()
    assert(gone >= 1, s"v0's replaced file should reclaim, got $gone (of $before)")
    // OPTIMIZE ZORDER re-clusters; content is preserved
    val n0 = spark.sql("SELECT count(*) c FROM g.mnt").head().getLong(0)
    val m = spark.sql("OPTIMIZE g.mnt ZORDER BY (id)").collect()(0)
    assert(m.getLong(1) >= 1L)
    assert(spark.sql("SELECT count(*) c FROM g.mnt").head().getLong(0) == n0)
    // EXPLAIN of a side-effecting verb must never run it (the vanilla
    // delegate may refuse to parse EXPLAIN-of-extension-grammar — fine,
    // as long as nothing is deleted either way)
    val files = VersionedTable.dataFiles(s"$wh/mnt").toSet
    try spark.sql("EXPLAIN VACUUM g.mnt RETAIN 0 HOURS").collect()
    catch { case _: Exception => () }
    assert(VersionedTable.dataFiles(s"$wh/mnt").toSet == files,
      "EXPLAIN VACUUM must not delete anything")
    // a non-graft catalog falls through to the vanilla parser error
    intercept[Exception] { spark.sql("DESCRIBE HISTORY nosuch.tbl") }
    ()
  }

  test("DML conditions with subqueries route and answer exactly") {
    freshTable("subq", n = 300, files = 2)
    Seq(5L, 6L, 7L).toDF("bad_id").createOrReplaceTempView("bad_ids")
    spark.sql("DELETE FROM g.subq WHERE id IN (SELECT bad_id FROM bad_ids)")
    assert(VersionedTable.read(spark, s"$wh/subq").count() == 297)
    assert(VersionedTable.read(spark, s"$wh/subq")
      .filter(col("id").isin(5L, 6L, 7L)).isEmpty)
    // aliased target + correlated-ish scalar condition
    spark.sql("UPDATE g.subq SET v = 'flagged' " +
      "WHERE id > (SELECT max(bad_id) + 280 FROM bad_ids)")
    assert(VersionedTable.read(spark, s"$wh/subq")
      .filter(col("v") === "flagged").count() ==
      (0 until 300).count(i => i > 287 && !Set(5, 6, 7)(i)))
  }

  test("TIMESTAMP AS OF resolves through the commit clocks") {
    val dir = s"$wh/tt"
    VersionedTable.withClock(() => 1000L) {
      VersionedTable.overwrite(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    }
    VersionedTable.withClock(() => 2000L) {
      VersionedTable.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))
    }
    // micros in SQL timestamps: 1500 ms = 1970-01-01 00:00:01.5 UTC
    assert(spark.sql(
      "SELECT count(*) c FROM g.tt TIMESTAMP AS OF '1970-01-01 00:00:01.5'")
      .head().getLong(0) == 1L)
    assert(spark.sql(
      "SELECT count(*) c FROM g.tt TIMESTAMP AS OF '1970-01-01 00:00:02'")
      .head().getLong(0) == 2L)
  }

  test("WHEN NOT MATCHED BY SOURCE: full-outer enrichment applies UPDATE/DELETE to unmatched targets") {
    freshTable("nmbs", n = 40, files = 2)
    // source touches ids 5 (update), 6 (delete), 500 (insert); every
    // OTHER target row is not-matched-by-source
    Seq((5L, "u", 1), (6L, "d", 2), (500L, "i", 3))
      .toDF("id", "v", "grp").createOrReplaceTempView("nmbs_src")
    spark.sql("""
      MERGE INTO g.nmbs t USING nmbs_src s ON t.id = s.id
      WHEN MATCHED AND s.v = 'd' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.id < 10 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = concat(t.v, '~'), grp = t.grp + 100
    """)
    val m = VersionedTable.read(spark, s"$wh/nmbs")
    // matched rows: 5 updated, 6 deleted; insert: 500
    assert(m.filter(col("id") === 5L).select("v").head().getString(0) == "u")
    assert(m.filter(col("id") === 6L).isEmpty)
    assert(m.filter(col("id") === 500L).select("v").head().getString(0) == "i")
    // NMBS delete-listed-first: unmatched ids 0..4, 7..9 deleted
    assert(m.filter(col("id") < 10 && col("id") =!= 5L).isEmpty)
    // NMBS update: unmatched ids >= 10 got the marker + grp bump,
    // unassigned columns keep (id untouched by construction)
    val r15 = m.filter(col("id") === 15L).select("v", "grp").head()
    assert(r15.getString(0) == "v15~" && r15.getInt(1) == 15 % 7 + 100, s"got $r15")
    assert(m.count() == 40L - 8 /*nmbs del*/ - 1 /*matched del*/ + 1 /*ins*/)
    // delete listed LAST within the NMBS family: update wins first
    freshTable("nmbs2", n = 10, files = 1)
    Seq((3L, "x", 0)).toDF("id", "v", "grp").createOrReplaceTempView("nmbs_src2")
    spark.sql("""
      MERGE INTO g.nmbs2 t USING nmbs_src2 s ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.id = 4 THEN UPDATE SET v = 'won'
      WHEN NOT MATCHED BY SOURCE AND t.id = 4 THEN DELETE
    """)
    val m2 = VersionedTable.read(spark, s"$wh/nmbs2")
    assert(m2.filter(col("id") === 4L).select("v").head().getString(0) == "won")
    assert(m2.count() == 10)
  }

  test("clause value expressions only evaluate where the clause fires (ANSI soundness)") {
    // under ANSI mode s.num / s.den on a den = 0 row throws — the guard
    // `AND s.den <> 0` must EXCLUDE that row from evaluation entirely
    assert(spark.conf.get("spark.sql.ansi.enabled", "true") != "false" ||
      true) // documents intent; the division below throws under ANSI only
    freshTable("ansi", n = 20, files = 1)
    Seq((1L, 10L, 2L), (2L, 10L, 0L)) // id=2 carries a ZERO divisor
      .toDF("id", "num", "den").createOrReplaceTempView("ansi_src")
    spark.sql("""
      MERGE INTO g.ansi t USING ansi_src s ON t.id = s.id
      WHEN MATCHED AND s.den <> 0 THEN UPDATE SET grp = CAST(s.num / s.den AS INT)
    """)
    val m = VersionedTable.read(spark, s"$wh/ansi")
    assert(m.filter(col("id") === 1L).select("grp").head().getInt(0) == 5)
    assert(m.filter(col("id") === 2L).select("grp").head().getInt(0) == 2 % 7,
      "the guarded-out row must carry untouched")
  }

  test("full-form MERGE reads only candidate target files (pruned enrichment join)") {
    // four appends of disjoint id ranges -> >= 4 files whose ranges the
    // commit-list stats separate (deterministic split: separate commits,
    // not repartitionByRange boundaries)
    val dir = s"$wh/bnd"
    import spark.implicits._
    VersionedTable.overwrite(spark, dir,
      (0 until 250).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "v", "grp")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"))
    (1 to 3).foreach { b =>
      VersionedTable.append(spark, dir,
        (b * 250 until (b + 1) * 250).map(i => (i.toLong, s"v$i", i % 7))
          .toDF("id", "v", "grp")
          .repartitionByRange(4, col("id")).sortWithinPartitions("id"))
    }
    val nFiles = VersionedTable.dataFiles(dir).size
    assert(nFiles >= 16, s"setup: want >= 16 files, got $nFiles")
    // a source confined to the first range can only match its files
    val src = Seq((5L, "z", 0), (6L, "z", 0)).toDF("id", "v", "grp")
    val slice = VersionedTable.matchSlice(spark, dir,
      VersionedTable.versions(dir).last, src, Seq("id"))
    val sliceFiles = slice.inputFiles.length
    assert(sliceFiles >= 1 && sliceFiles <= nFiles / 4,
      s"enrichment slice must be pruned: read $sliceFiles of $nFiles files")
    // and the SQL-text full-form merge over the same table stays correct
    src.createOrReplaceTempView("bnd_src")
    spark.sql("""
      MERGE INTO g.bnd t USING bnd_src s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = concat(t.v, '!')
    """)
    val m = VersionedTable.read(spark, dir)
    assert(m.filter(col("v") === "v5!").count() == 1)
    assert(m.count() == 1000)
  }

  test("duplicate-keyed MERGE targets refuse loudly with a precise message") {
    val dir = s"$wh/dupt"
    VersionedTable.overwrite(spark, dir,
      Seq((1L, "a", 0), (1L, "b", 0), (2L, "c", 0)).toDF("id", "v", "grp"))
    Seq((1L, "x", 9)).toDF("id", "v", "grp").createOrReplaceTempView("dupt_src")
    val e = intercept[Exception] {
      spark.sql("""
        MERGE INTO g.dupt t USING dupt_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v, grp = t.grp + 1
      """)
    }
    assert(e.getMessage.contains("multiple rows per key"), e.getMessage)
    // nothing committed
    assert(VersionedTable.versions(dir) == Seq(0L))
    // ... and NMBS over a null-keyed target refuses too
    val dir2 = s"$wh/nullk"
    VersionedTable.overwrite(spark, dir2,
      Seq((Some(1L), "a"), (None, "b")).toDF("id", "v"))
    Seq((1L, "x")).toDF("id", "v").createOrReplaceTempView("nullk_src")
    val e2 = intercept[Exception] {
      spark.sql("""
        MERGE INTO g.nullk t USING nullk_src s ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE THEN DELETE
      """)
    }
    assert(e2.getMessage.contains("NULL merge keys"), e2.getMessage)
  }

  test("a merge pinned to a superseded base refuses with StaleSnapshotException") {
    val dir = s"$wh/stale"
    VersionedTable.overwrite(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    VersionedTable.append(spark, dir, Seq((2L, "b")).toDF("id", "v"))
    val e = intercept[VersionedTable.StaleSnapshotException] {
      VersionedTable.mergeInto(spark, dir, Seq((1L, "z")).toDF("id", "v"),
        Seq("id"), updateWhen = Some(lit(true)), requireBase = Some(0L))
    }
    assert(e.expected == 0L && e.actual == 1L)
    // the refusal left no commit and no data change
    assert(VersionedTable.versions(dir) == Seq(0L, 1L))
    assert(VersionedTable.read(spark, dir).count() == 2)
  }

  test("a concurrent append landing AFTER the pinned-base check still refuses — the TOCTOU hole is closed (ADVICE r14)") {
    val dir = s"$wh/toctou"
    VersionedTable.overwrite(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    // the racing append fires INSIDE the merge, after its requireBase
    // check read v0 and its enrichment was derived, right before the
    // commit — pre-fix, commitRewrite rode the append along via `since`
    // and committed clause values that never saw the appended key
    VersionedTable.mergeRaceHook = () => {
      VersionedTable.mergeRaceHook = () => () // fire once
      VersionedTable.append(spark, dir, Seq((2L, "late")).toDF("id", "v"))
      ()
    }
    try {
      val e = intercept[VersionedTable.StaleSnapshotException] {
        VersionedTable.mergeInto(spark, dir,
          Seq((1L, "z"), (2L, "zz")).toDF("id", "v"), Seq("id"),
          updateWhen = Some(lit(true)), insertWhen = Some(lit(true)),
          requireBase = Some(0L))
      }
      assert(e.expected == 0L && e.actual == 1L)
    } finally VersionedTable.mergeRaceHook = () => ()
    // the racing append's row is intact; the stale merge left nothing —
    // in particular no duplicate of the concurrently-appended key 2
    assert(VersionedTable.versions(dir) == Seq(0L, 1L))
    assert(VersionedTable.read(spark, dir).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "late")))
  }

  test("replaceWhere refuses incoming rows outside the predicate band; checkPredicate=false widens intentionally (ADVICE r14)") {
    val dir = s"$wh/rwband"
    VersionedTable.overwrite(spark, dir,
      (0 until 40).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "v", "grp")
        .repartition(2))
    // one in-band row, one out-of-band row, one NULL-predicate row —
    // SQL semantics: NULL is not in the band either
    val bad = Seq((100L, "x", Some(3)), (101L, "y", Some(2)),
      (102L, "z", None)).toDF("id", "v", "grp")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.replaceWhere(spark, dir, bad, col("grp") === 3)
    }
    assert(e.getMessage.contains("do not satisfy") && e.getMessage.contains("2"),
      e.getMessage)
    assert(VersionedTable.versions(dir) == Seq(0L), "nothing may commit")
    assert(VersionedTable.read(spark, dir).count() == 40)
    // the explicit opt-out lands all three rows while replacing the band
    val (v1, _, _) = VersionedTable.replaceWhere(spark, dir, bad,
      col("grp") === 3, checkPredicate = false)
    assert(v1 == 1L)
    val m = VersionedTable.read(spark, dir)
    assert(m.count() == 33) // 40 - 10 (grp=3 band) + 3 incoming
    assert(m.filter(col("id") >= 100L).count() == 3)
  }

  test("all-identity UPDATE is a no-op, not an error") {
    freshTable("idu", n = 10, files = 1)
    spark.sql("UPDATE g.idu SET v = v WHERE id < 5")
    assert(VersionedTable.versions(s"$wh/idu") == Seq(0L),
      "an all-identity UPDATE must commit nothing")
    assert(VersionedTable.read(spark, s"$wh/idu").count() == 10)
  }

  test("writeTo(...).overwrite(cond) routes to the one-commit replaceWhere verb") {
    freshTable("rw", n = 100, files = 2)
    // replace the grp = 3 slice with two fresh rows, atomically
    Seq((9000L, "n1", 3), (9001L, "n2", 3)).toDF("id", "v", "grp")
      .writeTo("g.rw").overwrite(col("grp") === 3)
    val m = VersionedTable.read(spark, s"$wh/rw")
    assert(m.filter(col("grp") === 3).count() == 2)
    assert(m.filter(col("grp") =!= 3).count() == (0 until 100).count(_ % 7 != 3))
    // exactly ONE new version: the delete and the insert are one commit
    assert(VersionedTable.versions(s"$wh/rw") == Seq(0L, 1L))
    val op = VersionedTable.history(spark, s"$wh/rw")
      .filter(col("version") === 1L).select("operation").head().getString(0)
    assert(op == "REPLACE WHERE", s"got $op")
  }

  test("RESTORE TABLE and CREATE TABLE SHALLOW CLONE parse through the extension") {
    freshTable("rst", n = 100, files = 1)
    spark.sql("DELETE FROM g.rst WHERE id < 50")
    assert(spark.sql("SELECT count(*) c FROM g.rst").head().getLong(0) == 50L)
    // restore by version: metadata-only commit, content back to v0
    val m = spark.sql("RESTORE TABLE g.rst TO VERSION AS OF 0").collect()(0)
    assert(m.getLong(0) == 0L && m.getLong(1) == 2L, s"got $m")
    assert(spark.sql("SELECT count(*) c FROM g.rst").head().getLong(0) == 100L)
    // EXPLAIN never restores (lazy command)
    spark.sql("DELETE FROM g.rst WHERE id < 50")
    try spark.sql("EXPLAIN RESTORE TABLE g.rst TO VERSION AS OF 0").collect()
    catch { case _: Exception => () } // delegate may refuse the grammar
    assert(spark.sql("SELECT count(*) c FROM g.rst").head().getLong(0) == 50L,
      "EXPLAIN RESTORE must not restore")
    // restore by timestamp resolves through the commit clocks
    val dir2 = s"$wh/rstts"
    import spark.implicits._
    VersionedTable.withClock(() => 1000L) {
      VersionedTable.overwrite(spark, dir2, Seq((1L, "a")).toDF("id", "v"))
    }
    VersionedTable.withClock(() => 2000L) {
      VersionedTable.append(spark, dir2, Seq((2L, "b")).toDF("id", "v"))
    }
    spark.sql("RESTORE g.rstts TO TIMESTAMP AS OF '1970-01-01 00:00:01.5'")
    assert(VersionedTable.read(spark, dir2).count() == 1L)
    // shallow clone: zero-copy, decoupled lifecycle, optional version pin
    spark.sql("CREATE TABLE g.rst_clone SHALLOW CLONE g.rst")
    assert(spark.sql("SELECT count(*) c FROM g.rst_clone").head().getLong(0) == 50L)
    spark.sql("INSERT INTO g.rst_clone VALUES (9999, 'x', 0)")
    assert(spark.sql("SELECT count(*) c FROM g.rst_clone").head().getLong(0) == 51L)
    assert(spark.sql("SELECT count(*) c FROM g.rst").head().getLong(0) == 50L,
      "writes to the clone must not touch the source")
    spark.sql("CREATE TABLE g.rst_v0 SHALLOW CLONE g.rst VERSION AS OF 0")
    assert(spark.sql("SELECT count(*) c FROM g.rst_v0").head().getLong(0) == 100L)
    // cloning onto an existing table refuses loudly
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE g.rst_clone SHALLOW CLONE g.rst")
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
  }

  test("constraint DDL and CONVERT TO GRAFT parse through the extension") {
    freshTable("con", n = 50, files = 1)
    spark.sql("ALTER TABLE g.con ADD CONSTRAINT grp_range CHECK (grp BETWEEN 0 AND 6)")
    // the constraint ENFORCES: a violating insert refuses whole
    val e = intercept[Exception] {
      spark.sql("INSERT INTO g.con VALUES (9000, 'x', 99)")
    }
    assert(e.getMessage.contains("grp_range"), e.getMessage)
    assert(spark.sql("SELECT count(*) c FROM g.con").head().getLong(0) == 50L)
    // adding a constraint the existing data violates refuses
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE g.con ADD CONSTRAINT impossible CHECK (id < 0)")
    }
    assert(e2.getMessage.contains("existing rows violate"), e2.getMessage)
    // dropped => the same insert lands
    spark.sql("ALTER TABLE g.con DROP CONSTRAINT grp_range")
    spark.sql("INSERT INTO g.con VALUES (9000, 'x', 99)")
    assert(spark.sql("SELECT count(*) c FROM g.con").head().getLong(0) == 51L)
    // CONVERT TO GRAFT: a flat parquet directory becomes a versioned
    // table in place — readable through the catalog afterwards
    import spark.implicits._
    val flat = s"$wh/flat_conv"
    (0 until 30).map(i => (i.toLong, s"p$i")).toDF("id", "v")
      .repartition(3).write.parquet(flat)
    val v = spark.sql(s"CONVERT TO GRAFT '$flat'").collect()(0).getLong(0)
    assert(v == 0L)
    assert(VersionedTable.isVersioned(flat))
    assert(spark.sql("SELECT count(*) c FROM g.flat_conv").head().getLong(0) == 30L)
  }

  test("PROPERTY: randomized full-form MERGE (incl. NMBS, clause orders) equals a row-by-row SQL-semantics model") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    for (round <- 1 to 10) {
      val dir = s"$wh/prop$round"
      // distinct-keyed target and source (dup keys refuse by design)
      val tgtRows = rnd.shuffle((0 to 30).toList).take(12 + rnd.nextInt(10))
        .map(i => (i.toLong, s"t$i", rnd.nextInt(5))).sortBy(_._1)
      val srcRows = rnd.shuffle((0 to 40).toList).take(10 + rnd.nextInt(10))
        .map(i => (i.toLong, Seq("u", "d", "n")(rnd.nextInt(3)), 1 + rnd.nextInt(5)))
        .sortBy(_._1)
      VersionedTable.overwrite(spark, dir, tgtRows.toDF("id", "v", "grp"))
      srcRows.toDF("id", "op", "delta").createOrReplaceTempView(s"prop_src$round")
      // random clause mix — at least one clause guaranteed below
      val hasMU = rnd.nextBoolean(); val hasMD = rnd.nextBoolean()
      val hasIns = rnd.nextBoolean()
      val hasNU = rnd.nextBoolean(); val hasND = rnd.nextBoolean()
      val mDelFirst = rnd.nextBoolean(); val nDelFirst = rnd.nextBoolean()
      val any = hasMU || hasMD || hasIns || hasNU || hasND
      val (mu, md, ins, nu, nd) =
        if (any) (hasMU, hasMD, hasIns, hasNU, hasND)
        else (true, false, false, false, false)
      val mUpd = "WHEN MATCHED AND s.op = 'u' THEN UPDATE SET " +
        "grp = t.grp + s.delta, v = concat(t.v, '+')"
      val mDel = "WHEN MATCHED AND s.op = 'd' THEN DELETE"
      val insC = "WHEN NOT MATCHED AND s.op <> 'd' THEN " +
        "INSERT (id, grp) VALUES (s.id, s.delta)"
      val nUpd = "WHEN NOT MATCHED BY SOURCE AND t.grp >= 2 THEN " +
        "UPDATE SET v = concat(t.v, '~')"
      val nDel = "WHEN NOT MATCHED BY SOURCE AND t.grp = 0 THEN DELETE"
      val matchedClauses =
        (if (mu && md) { if (mDelFirst) Seq(mDel, mUpd) else Seq(mUpd, mDel) }
         else if (mu) Seq(mUpd) else if (md) Seq(mDel) else Nil)
      val nmbsClauses =
        (if (nu && nd) { if (nDelFirst) Seq(nDel, nUpd) else Seq(nUpd, nDel) }
         else if (nu) Seq(nUpd) else if (nd) Seq(nDel) else Nil)
      val stmt = (Seq(s"MERGE INTO g.prop$round t USING prop_src$round s ON t.id = s.id") ++
        matchedClauses ++ (if (ins) Seq(insC) else Nil) ++ nmbsClauses).mkString("\n")
      spark.sql(stmt)
      // the MODEL: SQL semantics row by row — for each row, the FIRST
      // clause of its family (in listed order) whose condition holds
      val srcById = srcRows.map(r => r._1 -> r).toMap
      val tgtIds = tgtRows.map(_._1).toSet
      val fromTargets = tgtRows.flatMap { case (id, v, grp) =>
        srcById.get(id) match {
          case Some((_, op, delta)) => // matched family
            val fired = matchedClauses.find {
              case c if c == mUpd => op == "u"
              case c if c == mDel => op == "d"
              case _ => false
            }
            fired match {
              case Some(c) if c == mDel => None
              case Some(c) if c == mUpd => Some((id, v + "+", grp + delta))
              case _ => Some((id, v, grp))
            }
          case None => // not-matched-by-source family
            val fired = nmbsClauses.find {
              case c if c == nUpd => grp >= 2
              case c if c == nDel => grp == 0
              case _ => false
            }
            fired match {
              case Some(c) if c == nDel => None
              case Some(c) if c == nUpd => Some((id, v + "~", grp))
              case _ => Some((id, v, grp))
            }
        }
      }
      val inserted =
        if (!ins) Nil
        else srcRows.filter(r => !tgtIds.contains(r._1) && r._2 != "d")
          .map(r => (r._1, null: String, r._3)) // unassigned v is NULL
      val want = (fromTargets ++ inserted).sortBy(_._1)
      val got = VersionedTable.read(spark, dir)
        .select("id", "v", "grp").as[(Long, String, Int)]
        .collect().toSeq.sortBy(_._1)
      assert(got == want,
        s"round $round diverged\nstmt:\n$stmt\ngot:  $got\nwant: $want")
    }
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
        "WHEN MATCHED THEN UPDATE SET id = s.id + 1000")
    }
    assert(e2.getMessage.contains("merge key"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("DELETE FROM g.ref VERSION AS OF 0 WHERE id = 1")
    }
    assert(e3 != null) // time-travel DML refuses (parser or rule)
  }
}
