package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.run.{Pipeline, Warehouse}
import graft.sources.ParquetDirSource

/** End-to-end medallion pipeline over the sf0.001 fixtures. */
class PipelineSpec extends SparkSpecBase {

  private lazy val whRoot = Files.createTempDirectory("graft_wh").toString
  private lazy val src = ParquetDirSource(sfDir,
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem"))
  private val fixedClock = () => java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private lazy val pipe =
    new Pipeline(Warehouse(spark, whRoot), src, "exec-1", fixedClock)

  test("full bronze -> silver -> gold run") {
    val b = pipe.runBronze()
    assert(b.tables.keySet == src.tables.toSet)
    assert(b.tables("lineitem") > 0)

    val s = pipe.runSilver()
    // silver dedup removes the planted duplicates but keeps the grain:
    // count stays near bronze (guards against key-discovery collapse bugs)
    assert(s.tables("lineitem") <= b.tables("lineitem"))
    assert(s.tables("lineitem") > b.tables("lineitem") * 9 / 10)
    assert(s.tables("region") == 5)

    val g = pipe.runGold()
    // fact_sales is keyed at its MERGE grain: the fixture plants a few
    // merge-key collisions, so the keyed table sits just under the silver
    // row count (and must never collapse further than that)
    assert(g.tables("gold_fact_sales") <= s.tables("lineitem"))
    assert(g.tables("gold_fact_sales") > s.tables("lineitem") * 95 / 100)
    assert(g.tables("gold_dim_date") > 2000) // ~6.5y calendar
    assert(g.tables.keySet.size == 6)

    // execution log captured one success row per written table
    val log = pipe.executionLog
    assert(log.filter(col("status") === "success").count() >=
      (b.tables.size + s.tables.size + g.tables.size))
    // audit columns present and clock-stable
    val sil = Warehouse(spark, whRoot).read("silver_lineitem")
    assert(sil.columns.contains("silver_created_date"))
    assert(sil.select("silver_execution_id").distinct().count() == 1)
  }

  test("catalog listing excludes control/log tables and respects prefix") {
    pipe // ensure previous test ran (ordered within suite)
    val wh = Warehouse(spark, whRoot)
    val silver = wh.list("silver_")
    assert(silver.forall(_.startsWith("silver_")))
    assert(!silver.exists(_.endsWith("_execution_log")))
  }

  test("write-time manifest: gold-table pruned reads equal plain reads, metadata hidden") {
    pipe // ordered: gold tables exist
    val wh = Warehouse(spark, whRoot)
    wh.refreshManifest("gold_fact_sales", Seq("billing_year", "customer_key"))
    assert(!wh.list("gold_").exists(_.endsWith("__manifest")),
      "manifest tables are metadata — hidden from the catalog listing")
    import graft.sources.SkippingIndex.ColRange
    val ranges = Seq(ColRange("billing_year", 1994, 1995),
      ColRange("customer_key", 0, 500))
    val pruned = wh.prunedRead("gold_fact_sales", ranges)
    val plain = wh.read("gold_fact_sales")
      .filter(col("billing_year").between(1994, 1995) &&
        col("customer_key").between(0, 500))
    assert(pruned.count() == plain.count() && plain.count() > 0)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty,
      "manifest-pruned gold read must equal the plain filtered read")
    // manifest-on-commit: new files landing through the warehouse refresh
    // the existing manifest as part of the commit — NO explicit refresh
    wh.append("gold_fact_sales", wh.read("gold_fact_sales").limit(0))
    val again = wh.prunedRead("gold_fact_sales", ranges)
    assert(again.count() == plain.count())
  }

  test("pipeline-written gold tables are versioned: time travel across an incremental merge") {
    pipe // ordered: gold tables exist
    val wh = Warehouse(spark, whRoot)
    val vs0 = wh.versionsOf("gold_fact_orders")
    assert(vs0.nonEmpty, "the medallion's own gold output must be a versioned table")
    val before = wh.read("gold_fact_orders").count()
    // a re-merge of everything commits a NEW version; the pinned old
    // version stays byte-stable under it (snapshot isolation)
    val pinned = wh.readAt("gold_fact_orders", vs0.last).count()
    pipe.runGoldIncremental(java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))
    val vs1 = wh.versionsOf("gold_fact_orders")
    assert(vs1.size > vs0.size, "the incremental merge must land as a commit")
    assert(wh.readAt("gold_fact_orders", vs0.last).count() == pinned,
      "time travel to the pre-merge snapshot")
    assert(wh.read("gold_fact_orders").count() == before)
  }

  test("rewrite vs concurrent overwrite: the rewrite aborts and restarts instead of resurrecting rows") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_vconf").toString
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    def ids(d: org.apache.spark.sql.DataFrame) = d.select("id").collect().map(_.getLong(0)).toSet
    VersionedTable.overwrite(spark, root, df(0, 100))
    // deterministic interleave: the FIRST rewrite attempt's transform
    // sneaks a full overwrite in before the rewrite can commit — exactly
    // the window the conflict rule guards (Delta aborts RewriteFiles vs
    // full replace; committing would resurrect the pre-overwrite rows)
    var attempts = 0
    val v = VersionedTable.rewrite(spark, root) { snap =>
      attempts += 1
      if (attempts == 1) VersionedTable.overwrite(spark, root, df(500, 520))
      snap.repartition(2)
    }
    assert(attempts == 2, "the stale rewrite must restart from the new snapshot")
    assert(ids(VersionedTable.read(spark, root)) == (500L until 520L).toSet,
      "the final snapshot equals the overwrite and nothing else")
    assert(v == VersionedTable.versions(root).last)
    // and the restarted rewrite is content-preserving of the NEW snapshot
    assert(VersionedTable.read(spark, root, Some(v)).count() == 20)
  }

  test("vacuum(keep) retires versions cleanly: fail-fast time travel, versions() reflects retirement") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_vret").toString
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    VersionedTable.overwrite(spark, root, df(0, 50))
    VersionedTable.overwrite(spark, root, df(50, 120))
    VersionedTable.append(spark, root, df(120, 130))
    assert(VersionedTable.versions(root) == Seq(0L, 1L, 2L))
    VersionedTable.vacuum(root, keep = Some(1), minAgeMs = 0L)
    assert(VersionedTable.versions(root) == Seq(2L),
      "retired versions must leave the committed-version list")
    assert(VersionedTable.retiredVersions(root) == Seq(0L, 1L))
    val e = intercept[IllegalStateException] {
      VersionedTable.read(spark, root, Some(0L))
    }
    assert(e.getMessage.contains("retired by vacuum"),
      s"retired time travel must fail fast with a clean error, got: ${e.getMessage}")
    // the kept snapshot is complete and scannable (no mid-scan surprises)
    assert(VersionedTable.read(spark, root).count() == 80)
    // DESCRIBE HISTORY still lists the retired commits, flagged, with
    // their reclaimed versions carrying zero live bytes
    val h = VersionedTable.history(spark, root)
      .orderBy("version").collect()
    assert(h.map(_.getAs[Long]("version")).toSeq == Seq(0L, 1L, 2L))
    assert(h.map(_.getAs[Boolean]("retired")).toSeq == Seq(true, true, false))
    assert(h.last.getAs[Long]("n_bytes") > 0, "the live version reports its bytes")
    // r11: history carries each commit's operation kind and timestamp
    assert(h.map(_.getAs[String]("operation")).toSeq ==
      Seq("OVERWRITE", "OVERWRITE", "APPEND"))
    assert(h.forall(r => r.getAs[Long]("ts_ms") > 0L &&
      !r.isNullAt(r.fieldIndex("timestamp"))))
  }

  test("manifest-free pruning: DML prune decisions come from commit-list stats alone — zero file I/O") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    import java.nio.file.{Files, Paths}
    val root = java.nio.file.Files.createTempDirectory("graft_liststats").toString
    VersionedTable.overwrite(spark, root,
      (0 until 8000).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "v", "grp")
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"))
    // (a) the commit list carries column stats on every data line
    val raw = new String(Files.readAllBytes(Paths.get(root, "_commits", "v0.list")), "UTF-8")
      .split("\n").filterNot(_.startsWith("#")).toSeq
    assert(raw.forall(_.contains("\trows=")), s"stats missing:\n${raw.head}")
    assert(raw.forall(l => l.contains("id;n;") && l.contains("v;s;")),
      "numeric and string column stats must both be stamped")
    // (b) THE PROOF: hide the data directory — prune decisions that read
    // footers or stat files would die; list-served ones keep working
    Files.move(Paths.get(root, "data"), Paths.get(root, "data_hidden"))
    try {
      // a provably-no-match DELETE box: prune says zero files touch → no-op
      val (_, rw, carried) = VersionedTable.deleteWhere(spark, root,
        Seq(SkippingIndex.ColRange("id", -100, -1)))
      assert(rw == 0 && carried == 8, "no-match box must prune everything from the list alone")
      // same for UPDATE
      val (_, rwU, _) = VersionedTable.updateWhere(spark, root,
        col("id") === -5L, Map("v" -> org.apache.spark.sql.functions.lit("X")),
        Seq(SkippingIndex.ColRange("id", -5, -5)))
      assert(rwU == 0)
      // and the string column prunes too (bounds are 16-char-truncated)
      val (_, rwS, _) = VersionedTable.deleteWhere(spark, root,
        Nil, Seq(SkippingIndex.StrRange("v", "zzz", "zzzz")))
      assert(rwS == 0, "string stats must prune from the list alone")
    } finally Files.move(Paths.get(root, "data_hidden"), Paths.get(root, "data"))
    // (c) the same stats drive a REAL bounded delete correctly
    val (_, rw2, c2) = VersionedTable.deleteWhere(spark, root,
      Seq(SkippingIndex.ColRange("id", 1000, 1999)))
    assert(rw2 >= 1 && c2 >= 5, s"bounded: rw=$rw2 carried=$c2")
    assert(VersionedTable.read(spark, root).count() == 7000)
    // (d) carried files keep their stats verbatim across the rewrite
    // commit, so the NEXT prune is still list-served — asserted on the
    // RESOLVED snapshot (v1 is delta-encoded; carried lines live in the
    // base and replay through)
    val raw1 = VersionedTable.snapshotLines(root, 1L)
      .filterNot(_.startsWith("#"))
    assert(raw1.forall(_.contains("\trows=")),
      "every line of the rewrite commit (carried + fresh) must keep stats")
    // (e) a bimodal merge probe stays bounded, driven by list stats
    val src = (Seq((1500L, "UPD", 0)) ++ (0 until 5).map(i => (900000L + i, "NEW", 1)))
      .toDF("id", "v", "grp")
    val (_, rwM, cM) = VersionedTable.mergeInto(spark, root, src, Seq("id"),
      updateWhen = Some(org.apache.spark.sql.functions.expr("true")),
      insertWhen = Some(org.apache.spark.sql.functions.expr("true")))
    assert(rwM <= 1 && cM >= 6, s"probe must bound the merge: rw=$rwM carried=$cM")
  }

  test("retention cutoffs honor the injectable clock: deterministic vacuum specs need no sleeps (VERDICT r12 #4)") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_clockvac").toString
    // overwrites, not appends: each version ORPHANS its predecessor's
    // files once retired, giving the retention window real candidates
    (0 until 4).foreach { i =>
      VersionedTable.overwrite(spark, root, Seq((i.toLong, s"v$i")).toDF("id", "v"))
    }
    val window = 30L * 60 * 1000 // 30 min — nothing here is that old
    // clock = now: every candidate file is younger than the window
    val (_, dryNow) = VersionedTable.vacuumDryRun(root, keep = Some(1),
      minAgeMs = window)
    assert(dryNow.isEmpty, s"wall-clock-age files must be spared: $dryNow")
    // clock = now + 1h: the same files are now provably outside the
    // window — dry run sees them, vacuum reclaims them, and commit-log
    // GC takes the tombstones, all without a single sleep
    val future = System.currentTimeMillis() + 60L * 60 * 1000
    VersionedTable.withClock(() => future) {
      val (_, dry) = VersionedTable.vacuumDryRun(root, keep = Some(1),
        minAgeMs = window)
      assert(dry.nonEmpty, "an hour-advanced clock must age the orphans out")
      val gone = VersionedTable.vacuum(root, keep = Some(1), minAgeMs = window)
      assert(gone.toSet == dry.toSet, s"vacuum must reclaim the dry-run set: $gone vs $dry")
      assert(VersionedTable.vacuumCommitLogs(root, minAgeMs = window) == (0L until 3L))
    }
    assert(VersionedTable.read(spark, root).count() == 1L,
      "the kept head stays fully readable after the clocked vacuum")
  }

  test("commit-log GC deletes aged tombstones: the horizon moves honestly, _commits stays bounded under churn") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_loggc").toString
    (0 until 10).foreach { i =>
      if (i == 0)
        VersionedTable.overwrite(spark, root, Seq((i.toLong, s"v$i")).toDF("id", "v"))
      else VersionedTable.append(spark, root, Seq((i.toLong, s"v$i")).toDF("id", "v"))
    }
    VersionedTable.vacuum(root, keep = Some(1), minAgeMs = 0L)
    assert(VersionedTable.retiredVersions(root) == (0L until 9L))
    // retention window spares young tombstones (these are seconds old)
    assert(VersionedTable.vacuumCommitLogs(root).isEmpty,
      "tombstones inside the retention window must survive")
    // a retired version fails fast AS retired while its tombstone lives
    val eRet = intercept[IllegalStateException] {
      VersionedTable.read(spark, root, Some(3L))
    }
    assert(eRet.getMessage.contains("retired"))
    // age-0 GC (quiesced table): every tombstone goes
    assert(VersionedTable.vacuumCommitLogs(root, minAgeMs = 0L) == (0L until 9L))
    assert(VersionedTable.retiredVersions(root).isEmpty)
    assert(VersionedTable.history(spark, root).count() == 1,
      "history must reflect the moved horizon")
    // ... and the same read now reports an UNKNOWN version — the table
    // no longer remembers that far back, and says so
    val eGone = intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(3L))
    }
    assert(eGone.getMessage.contains("not in"))
    // _commits/ is bounded: exactly the one live list remains
    val left = new java.io.File(s"$root/_commits").listFiles().map(_.getName)
    assert(left.toSeq == Seq("v9.list"), s"got ${left.mkString(", ")}")
    // the surviving snapshot still reads
    assert(VersionedTable.read(spark, root).count() == 10)
  }

  test("deleteWhere is a bounded rewrite: non-matching files carry byte-identical, content equals the anti-filter, old snapshot travels") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    import SkippingIndex.ColRange
    val root = java.nio.file.Files.createTempDirectory("graft_vdel").toString
    // 8 near-disjoint id ranges, one file each, via a range-clustered write
    val df = (0 until 8000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
    VersionedTable.overwrite(spark, root, df)
    val v0Files = VersionedTable.dataFiles(root)
    def diskState(rel: String) = {
      val f = new java.io.File(s"$root/$rel")
      (f.lastModified(), f.length())
    }
    val before = v0Files.map(f => f -> diskState(f)).toMap
    val (v1, rewritten, carried) = VersionedTable.deleteWhere(spark, root,
      Seq(ColRange("id", 2000, 2999)))
    assert(rewritten >= 1 && carried >= 6,
      s"the delete must be bounded: rewritten=$rewritten carried=$carried")
    val v1Files = VersionedTable.dataFiles(root)
    // every carried file is THE SAME file: same committed name, untouched bytes
    val carriedRel = v0Files.toSet.intersect(v1Files.toSet)
    assert(carriedRel.size == carried)
    carriedRel.foreach(f => assert(diskState(f) == before(f),
      s"carried file $f must not be rewritten"))
    // surviving content equals the anti-filter exactly
    val got = VersionedTable.read(spark, root)
    val want = df.filter(!(col("id") >= 2000 && col("id") <= 2999))
    assert(got.count() == 7000)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // the pre-delete snapshot still serves the deleted rows
    assert(VersionedTable.read(spark, root, Some(v1 - 1)).count() == 8000)
    // a box no file can match is a free no-op: no commit, nothing rewritten
    val (v2, r2, _) = VersionedTable.deleteWhere(spark, root,
      Seq(ColRange("id", 1000000, 2000000)))
    assert(v2 == v1 && r2 == 0 && VersionedTable.versions(root).last == v1)
    // warehouse wrapper: persisted-manifest path + refresh after commit
    val whRoot2 = java.nio.file.Files.createTempDirectory("graft_vdelwh").toString
    val wh2 = Warehouse(spark, whRoot2)
    wh2.write("t", df) // volume policy: 8k rows land in ONE file
    wh2.clusterBy("t", Seq("id")) // 4 range-clustered files so carry is possible
    wh2.refreshManifest("t", Seq("id"))
    val (_, rw, cw) = wh2.deleteWhere("t", Seq(ColRange("id", 0, 999)))
    assert(rw >= 1 && cw >= 2, s"bounded at warehouse level: rw=$rw cw=$cw")
    assert(wh2.read("t").count() == 7000)
    // the refreshed manifest serves a pruned read over the new snapshot
    assert(wh2.prunedRead("t", Seq(ColRange("id", 7000, 7999))).count() == 1000)
  }

  test("change feed reads only the commit diff's files and equals the snapshot diff; restore is a data-free rollback commit") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_vcdf").toString
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    VersionedTable.overwrite(spark, root,
      df(0, 4000).repartitionByRange(4, col("id")).sortWithinPartitions("id"))
    VersionedTable.append(spark, root, df(4000, 4500))
    // append feed: inserts only, and the plan scans ONLY the appended
    // files (the v0 files are common to both snapshots and never read)
    val f01 = VersionedTable.changeFeed(spark, root, 0L, 1L)
    assert(f01.filter(col("_change_type") === "delete").count() == 0)
    assert(f01.filter(col("_change_type") === "insert").count() == 500)
    val v0Files = VersionedTable.dataFiles(root, Some(0L)).toSet
    assert(!f01.inputFiles.exists(f => v0Files.exists(f.endsWith)),
      "an append's change feed must not read any carried file")
    // feed across a SCHEMA EVOLUTION: the evolved column comes back
    // null-filled on the evolved-append side
    VersionedTable.append(spark, root, Seq((9000L, "x", 1.5)).toDF("id", "v", "w"))
    val f12 = VersionedTable.changeFeed(spark, root, 1L, 2L)
    assert(f12.columns.contains("w"))
    assert(f12.count() == 1 &&
      f12.head().getAs[Double]("w") == 1.5)
    // the feed equals the full snapshot diff (multiset) on a rewriting
    // commit too: deleteWhere rewrites files that carry survivors
    VersionedTable.deleteWhere(spark, root,
      Seq(graft.sources.SkippingIndex.ColRange("id", 1000, 1999)))
    val f23 = VersionedTable.changeFeed(spark, root, 2L, 3L)
    val snap2 = VersionedTable.read(spark, root, Some(2L))
    val snap3 = VersionedTable.read(spark, root, Some(3L))
    val wantDel = snap2.exceptAll(snap3)
    val gotDel = f23.filter(col("_change_type") === "delete").drop("_change_type")
    assert(gotDel.exceptAll(wantDel).isEmpty && wantDel.exceptAll(gotDel).isEmpty)
    assert(f23.filter(col("_change_type") === "insert").count() == 0)
    // RESTORE: rollback to v1 is a NEW commit with v1's exact content,
    // no files copied (the restored list names v1's own files)
    val v4 = VersionedTable.restore(spark, root, 1L)
    assert(VersionedTable.read(spark, root).count() ==
      VersionedTable.read(spark, root, Some(1L)).count())
    assert(VersionedTable.dataFiles(root, Some(v4)).toSet ==
      VersionedTable.dataFiles(root, Some(1L)).toSet)
    // a vacuum-retired version refuses restore fast
    VersionedTable.vacuum(root, keep = Some(2))
    val e = intercept[IllegalStateException] {
      VersionedTable.restore(spark, root, 0L)
    }
    assert(e.getMessage.contains("retired"))
  }

  test("schema evolution: append adds columns with null-fill, type flips fail loudly, versions keep their own schema") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_vschema").toString
    VersionedTable.overwrite(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(VersionedTable.schemaOf(root).get.fieldNames.toSeq == Seq("id", "v"))
    // evolving append: new column arrives; old rows read it as null
    VersionedTable.append(spark, root,
      Seq((3L, "c", 10.5)).toDF("id", "v", "score"))
    val cur = VersionedTable.read(spark, root)
    assert(cur.columns.toSeq == Seq("id", "v", "score"))
    assert(cur.filter(col("id") < 3 && col("score").isNull).count() == 2)
    assert(cur.filter(col("id") === 3 && col("score") === 10.5).count() == 1)
    // a batch MISSING a column null-fills it (align), nothing is lost
    VersionedTable.append(spark, root, Seq((4L, "d")).toDF("id", "v"))
    assert(VersionedTable.read(spark, root)
      .filter(col("id") === 4 && col("score").isNull).count() == 1)
    // every version time-travels under ITS schema
    assert(VersionedTable.read(spark, root, Some(0L)).columns.toSeq == Seq("id", "v"))
    assert(VersionedTable.read(spark, root, Some(1L)).columns.toSeq == Seq("id", "v", "score"))
    // a type flip is refused loudly — silent coercion would corrupt
    // every earlier file's reads
    val e = intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root, Seq(("5", "e")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("cannot change column"))
    // overwrite REDEFINES the schema (a full replace is a new contract)
    VersionedTable.overwrite(spark, root, Seq((9L, 1.0)).toDF("id", "w"))
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id", "w"))
    // idempotent sink epochs evolve the same way and replay still no-ops
    val root2 = java.nio.file.Files.createTempDirectory("graft_vschema2").toString
    VersionedTable.appendIdempotent(spark, root2,
      Seq((1L, "a")).toDF("id", "v"), "w", 0L)
    VersionedTable.appendIdempotent(spark, root2,
      Seq((2L, "b", true)).toDF("id", "v", "flag"), "w", 1L)
    assert(VersionedTable.appendIdempotent(spark, root2,
      Seq((2L, "b", true)).toDF("id", "v", "flag"), "w", 1L) == -1L)
    val r2 = VersionedTable.read(spark, root2)
    assert(r2.columns.toSeq == Seq("id", "v", "flag") && r2.count() == 2)
  }

  test("versioned table: time travel, snapshot isolation, crash orphans, racing appends, vacuum") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_vtab").toString
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    def ids(d: org.apache.spark.sql.DataFrame) = d.select("id").collect().map(_.getLong(0)).toSet
    assert(VersionedTable.overwrite(spark, root, df(0, 100)) == 0L)
    assert(VersionedTable.append(spark, root, df(100, 150)) == 1L)
    // time travel: each version serves exactly its committed snapshot
    assert(ids(VersionedTable.read(spark, root, Some(0L))) == (0L until 100L).toSet)
    assert(ids(VersionedTable.read(spark, root)) == (0L until 150L).toSet)
    // snapshot isolation: a reader resolved at v1 is untouched by a later
    // overwrite (immutable files + list-driven reads, no directory glob)
    val pinned = VersionedTable.read(spark, root, Some(1L))
    VersionedTable.overwrite(spark, root, df(500, 510))
    assert(ids(pinned) == (0L until 150L).toSet,
      "the pinned snapshot must not see the overwrite")
    assert(ids(VersionedTable.read(spark, root)) == (500L until 510L).toSet)
    // a crashed writer (data files, no commit) is invisible; vacuum
    // removes exactly its orphans
    df(900, 905).write.parquet(s"$root/__stage_crashed")
    new java.io.File(s"$root/__stage_crashed").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => f.renameTo(new java.io.File(s"$root/data/crashed-${f.getName}")))
    assert(ids(VersionedTable.read(spark, root)) == (500L until 510L).toSet)
    // SAFE BY DEFAULT (ADVICE r10): without an explicit opt-in the
    // retention window spares the young orphans — "unreferenced" and
    // "in flight" look identical on disk
    assert(VersionedTable.vacuum(root).isEmpty,
      "default retention must spare files younger than the window")
    val gone = VersionedTable.vacuum(root, minAgeMs = 0L)
    assert(gone.nonEmpty && gone.forall(_.contains("crashed")),
      s"vacuum removes exactly the orphans: $gone")
    assert(ids(VersionedTable.read(spark, root, Some(0L))) == (0L until 100L).toSet,
      "default vacuum keeps every committed version readable")
    // racing appends: optimistic commit gives them distinct versions and
    // the final snapshot holds BOTH appended sets exactly once
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val r = Future.sequence(Seq(
      Future(VersionedTable.append(spark, root, df(1000, 1050))),
      Future(VersionedTable.append(spark, root, df(2000, 2050)))))
    val vs = Await.result(r, 120.seconds)
    assert(vs.toSet.size == 2, s"racing writers must land distinct versions: $vs")
    val fin = VersionedTable.read(spark, root)
    assert(ids(fin) == ((500L until 510L) ++ (1000L until 1050L) ++
      (2000L until 2050L)).toSet)
    assert(fin.count() == 110, "no row duplicated by the retry path")
    // vacuum(keep=2): files only older snapshots reference are dropped,
    // the kept versions stay intact
    VersionedTable.vacuum(root, keep = Some(2))
    assert(ids(VersionedTable.read(spark, root)) == ids(fin))
  }

  test("versioned optimize: content-identical clustered rewrite, txn guarantee survives, old snapshot vacuumable") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_vopt").toString
    val df = (0 until 2000).map(i => (i.toLong, (i * 37) % 500L)).toDF("id", "k")
    VersionedTable.appendIdempotent(spark, root, df.filter(col("id") < 1000), "w", 0L)
    VersionedTable.appendIdempotent(spark, root, df.filter(col("id") >= 1000), "w", 1L)
    val before = VersionedTable.read(spark, root)
    val v = VersionedTable.optimize(spark, root, Seq("k", "id"), numFiles = 6)
    val after = VersionedTable.read(spark, root)
    assert(v == 2L && VersionedTable.versions(root) == Seq(0L, 1L, 2L))
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty,
      "optimize must preserve the snapshot's exact row multiset")
    // physically: exactly numFiles clustered files
    assert(VersionedTable.read(spark, root, Some(2L)).inputFiles.length == 6)
    // the exactly-once guarantee survives the rewrite: old epochs still no-op
    assert(VersionedTable.appendIdempotent(spark, root,
      df.limit(5), "w", 1L) == -1L)
    // old pre-optimize files are reclaimable without touching the optimized
    // snapshot
    VersionedTable.vacuum(root, keep = Some(1))
    assert(VersionedTable.read(spark, root).count() == 2000)
  }

  test("parallel warehouse copies mirror every gold table") {
    val wh = Warehouse(spark, whRoot)
    val copied = pipe.copyToWarehouse()
    assert(copied.keySet == wh.list("gold_").toSet)
    copied.foreach { case (t, n) => assert(n == wh.read(t).count()) }
  }

  test("merge staging scratch never leaks into listings or the warehouse") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_stage").toString
    val wh = Warehouse(spark, root)
    wh.write("gold_t", Seq((1, "a", 1)).toDF("id", "v", "ver"))
    wh.mergeUpsert("gold_t", Seq((1, "b", 2)).toDF("id", "v", "ver"),
      Seq("id"), Seq(col("ver").desc))
    assert(!new java.io.File(s"$root/gold_t__staging").exists(),
      "staging dir must be deleted after the merge")
    assert(wh.list("gold_") == Seq("gold_t"))
  }

  test("incremental gold: changed-key dim rebuild + fact merge converge") {
    val wh = Warehouse(spark, whRoot)
    val dimBefore = wh.read("gold_dim_customer").count()
    val factBefore = wh.read("gold_fact_orders").count()
    // watermark before every silver row: everything re-merges, counts stable
    val all = pipe.runGoldIncremental(java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))
    assert(all("gold_dim_customer") == dimBefore)
    assert(all("gold_fact_orders") == factBefore)
    // watermark after every silver row: nothing changes, counts stable
    val none = pipe.runGoldIncremental(java.sql.Timestamp.valueOf("2030-01-01 00:00:00"))
    assert(none("gold_dim_customer") == dimBefore)
    assert(none("gold_fact_orders") == factBefore)
  }

  test("compaction rewrites to fewer files without changing the table") {
    val wh = Warehouse(spark, whRoot)
    val before = wh.read("silver_lineitem").orderBy("l_orderkey", "l_linenumber",
      "l_partkey", "l_suppkey").collect().toSeq
    val n = wh.compact("silver_lineitem")
    assert(n == before.size)
    val after = wh.read("silver_lineitem").orderBy("l_orderkey", "l_linenumber",
      "l_partkey", "l_suppkey").collect().toSeq
    assert(after == before)
    // versioned compaction: the SNAPSHOT collapses to the volume-policy
    // count (6k rows -> one file); pre-compaction files stay on disk for
    // time travel until vacuum
    assert(wh.read("silver_lineitem").inputFiles.length == 1)
    val preCompact = wh.versionsOf("silver_lineitem").dropRight(1).last
    assert(wh.readAt("silver_lineitem", preCompact).count() == before.size,
      "the pre-compaction snapshot stays time-travelable")
  }

  test("a broken source table logs failed and the run continues") {
    import graft.sources.{TableSource, ParquetDirSource}
    import org.apache.spark.sql.{DataFrame, SparkSession}
    val broken = new TableSource {
      val inner = ParquetDirSource(sfDir, Seq("region", "nation"))
      def read(s: SparkSession, t: String): DataFrame =
        if (t == "nation") throw new RuntimeException("simulated source outage")
        else inner.read(s, t)
      def list(s: SparkSession): Seq[String] = Seq("region", "nation")
    }
    val root2 = java.nio.file.Files.createTempDirectory("graft_fail").toString
    val p2 = new Pipeline(Warehouse(spark, root2), broken, "exec-f", fixedClock)
    val report = p2.runBronze()
    assert(report.tables.keySet == Set("region")) // healthy table survived
    val failed = p2.executionLog.filter(col("status") === "failed").collect()
    assert(failed.exists(r => r.getAs[String]("table_name") == "bronze_nation" &&
      r.getAs[String]("error_message").contains("simulated source outage")))
  }

  test("failure hook fires with the failing table's log entry") {
    import graft.meta.ControlTables.LogEntry
    import graft.sources.{TableSource, ParquetDirSource}
    import org.apache.spark.sql.{DataFrame, SparkSession}
    val broken = new TableSource {
      val inner = ParquetDirSource(sfDir, Seq("region", "nation"))
      def read(s: SparkSession, t: String): DataFrame =
        if (t == "nation") throw new RuntimeException("hook outage")
        else inner.read(s, t)
      def list(s: SparkSession): Seq[String] = Seq("region", "nation")
    }
    var captured = List.empty[LogEntry]
    val root = java.nio.file.Files.createTempDirectory("graft_hook").toString
    val p = new Pipeline(Warehouse(spark, root), broken, "exec-hook", fixedClock,
      onFailure = e => captured ::= e)
    p.runBronze()
    assert(captured.exists(e => e.tableName == "bronze_nation" &&
      e.status == "failed" && e.error.exists(_.contains("hook outage"))),
      s"hook must receive the failing entry, got $captured")
    assert(!captured.exists(_.tableName == "bronze_region"),
      "healthy tables must not fire the hook")
  }

  test("table format seam: parquet fallback here, well-formed Delta SQL, warehouse-level merge") {
    import spark.implicits._
    import graft.run.TableFormat
    // no Delta on this classpath/session -> parquet emulation mode
    assert(TableFormat.detect(spark) == TableFormat.Parquet)
    assert(Warehouse(spark, "/tmp/unused").format == TableFormat.Parquet)
    // the Delta branch is plain SQL: assert the exact statement the seam
    // would submit (testable without Delta linked)
    assert(TableFormat.mergeSql("/wh/gold_dim", "src", Seq("k1", "k2")) ==
      "MERGE INTO delta.`/wh/gold_dim` t USING src s " +
        "ON t.`k1` = s.`k1` AND t.`k2` = s.`k2` " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(TableFormat.optimizeSql("/wh/t") == "OPTIMIZE delta.`/wh/t`")
    // warehouse-level merge through the seam (parquet mode): upsert by key
    val root = java.nio.file.Files.createTempDirectory("graft_fmt_seam").toString
    val wh = Warehouse(spark, root)
    wh.write("t", Seq((1, "old", 1), (2, "keep", 1)).toDF("id", "v", "ver"))
    val n = wh.mergeUpsert("t", Seq((1, "new", 2), (3, "ins", 1)).toDF("id", "v", "ver"),
      Seq("id"), Seq(col("ver").desc))
    assert(n == 3)
    assert(wh.read("t").orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "new"), (2, "keep"), (3, "ins")))
    // compaction through the seam leaves the table unchanged
    assert(wh.compact("t") == 3)
  }

  test("failure lookup returns the most recent failed entry (X3)") {
    import graft.meta.ControlTables
    val wh = Warehouse(spark, whRoot)
    wh.append("pipeline_execution_log", ControlTables.logRow(spark,
      ControlTables.LogEntry("exec-2", "graft_etl", "silver_orders", "silver",
        "incremental", 0L, "failed", Some("boom"),
        java.sql.Timestamp.valueOf("2026-02-01 00:00:00"))))
    val last = ControlTables.lastFailure(pipe.executionLog)
    assert(last.exists(r => r.getAs[String]("error_message") == "boom"))
  }

  test("csv and json file sources feed the same pipeline surface") {
    import graft.sources.FileFormatSource
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val region = sources.Tables.load(spark, sfDir, "region")
    region.coalesce(1).write.option("header", "true").csv(s"$dir/region.csv")
    region.coalesce(1).write.json(s"$dir/nation.json")
    val csvSrc = FileFormatSource(dir, "csv", Seq("region"),
      schemas = Map("region" -> region.schema))
    val jsonSrc = FileFormatSource(dir, "json", Seq("nation"),
      schemas = Map("nation" -> region.schema))
    assert(csvSrc.read(spark, "region").orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
    assert(jsonSrc.read(spark, "nation").select("r_regionkey", "r_name")
      .orderBy("r_regionkey").count() == 5)
  }

  test("incremental silver merge-upsert is idempotent on re-run") {
    val wh = Warehouse(spark, whRoot)
    val before = wh.read("silver_orders").count()
    // re-run with full overlap: every re-extracted row must reconcile
    val after = pipe.runSilverIncremental("orders", "o_orderdate",
      overlapSeconds = 10L * 365 * 24 * 3600)
    assert(after == before, s"idempotent overlap re-apply: $after vs $before")
  }

  /** Non-audit row image as strings — the audit columns are excluded so
    * full-rebuild twins (same fixed clock, same exec id) compare on the
    * business payload alone. */
  private def goldRows(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] = {
    val cols = df.columns.filterNot(_.startsWith("gold_")).sorted
    df.select(cols.map(col): _*).collect().map(_.toSeq.map(String.valueOf)).toSet
  }

  test("five-model gold incremental converges to the full-rebuild twin after source mutation") {
    val wh = Warehouse(spark, whRoot)
    val t2 = java.sql.Timestamp.valueOf("2026-06-01 00:00:00")
    // mutate ~10% of each primary silver source: bump a value column and
    // stamp the mutated rows' silver audit ts past the watermark
    def mutate(table: String, keyCol: String, valCol: String): Unit = {
      val mutated = wh.read(table)
        .withColumn(valCol,
          when(col(keyCol) % 10 === 0, col(valCol) * 2).otherwise(col(valCol)))
        .withColumn("silver_created_date",
          when(col(keyCol) % 10 === 0, lit(t2)).otherwise(col("silver_created_date")))
        .localCheckpoint(true) // cut lineage off the files we overwrite
      wh.write(table, mutated)
    }
    mutate("silver_customer", "c_custkey", "c_acctbal")
    mutate("silver_part", "p_partkey", "p_retailprice")
    mutate("silver_orders", "o_orderkey", "o_totalprice")
    mutate("silver_lineitem", "l_orderkey", "l_quantity")

    val counts = pipe.runGoldIncremental(java.sql.Timestamp.valueOf("2026-05-01 00:00:00"))
    assert(counts.keySet == Set("gold_dim_customer", "gold_dim_product",
      "gold_fact_sales", "gold_fact_orders", "gold_fact_budget"),
      "all five reference models must take the incremental path")

    // the full-rebuild twin IS the model's keyed-grain build over the
    // mutated silver — the invariant is exact equality, not approximation
    pipe.goldModels().filter(m => counts.keySet.contains(m.name)).foreach { m =>
      assert(goldRows(wh.read(m.name)) == goldRows(m.atGrain),
        s"${m.name} must equal its full-rebuild twin after the incremental merge")
    }
  }

  test("gold bootstrap: a missing gold table is rebuilt in full by the incremental run") {
    val wh = Warehouse(spark, whRoot)
    val before = goldRows(wh.read("gold_fact_orders"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(s"$whRoot/gold_fact_orders"))
    assert(!wh.exists("gold_fact_orders"))
    // nothing changed since the last run: only the bootstrap rebuilds
    pipe.runGoldIncremental(java.sql.Timestamp.valueOf("2030-01-01 00:00:00"))
    assert(wh.exists("gold_fact_orders"))
    assert(goldRows(wh.read("gold_fact_orders")) == before,
      "bootstrap must reproduce the full build")
    val boot = pipe.executionLog.filter(col("load_type") === "bootstrap").collect()
    assert(boot.exists(_.getAs[String]("table_name") == "gold_fact_orders"))
  }

  test("partition-pruned merge rewrites only the touched partition directories") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_pruned").toString
    val wh = Warehouse(spark, root)
    wh.write("f", Seq((1, 2020, "a", 1), (2, 2021, "b", 1), (3, 2022, "c", 1),
      (4, 2021, "d", 1)).toDF("id", "y", "v", "ver"), partitionBy = Seq("y"))
    def dirState(y: Int): Seq[(String, Long, Long)] =
      Option(new java.io.File(s"$root/f/data/y=$y").listFiles()).map(_.toSeq).getOrElse(Nil)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified(), f.length())).sortBy(_._1)
    val before2020 = dirState(2020)
    val before2022 = dirState(2022)
    assert(before2020.nonEmpty && before2022.nonEmpty)
    Thread.sleep(1100) // file-mtime granularity

    val incoming = Seq((2, 2021, "B", 2), (5, 2021, "e", 1)).toDF("id", "y", "v", "ver")
    val n = wh.mergeUpsert("f", incoming, Seq("id"), Seq(col("ver").desc),
      partitionBy = Seq("y"))
    assert(n == 5)
    assert(dirState(2020) == before2020, "untouched 2020 files must be byte-identical")
    assert(dirState(2022) == before2022, "untouched 2022 files must be byte-identical")
    assert(!new java.io.File(s"$root/f__staging").exists())
    val got = wh.read("f").select("id", "y", "v", "ver").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getInt(3))).toSet
    assert(got == Set((1, 2020, "a", 1), (2, 2021, "B", 2), (3, 2022, "c", 1),
      (4, 2021, "d", 1), (5, 2021, "e", 1)),
      "pruned merge must still equal the full MERGE semantics")

    // empty incoming batch: a complete no-op — no directory rewritten
    val before2021 = dirState(2021)
    val n2 = wh.mergeUpsert("f", incoming.filter(col("id") < 0), Seq("id"),
      Seq(col("ver").desc), partitionBy = Seq("y"))
    assert(n2 == 5)
    assert(dirState(2021) == before2021, "empty batch must touch nothing")
  }

  test("clusterBy yields near-disjoint per-file ranges so footer stats can skip files") {
    val root = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    val wh = Warehouse(spark, root)
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_shipdate", "l_quantity")
    // hash-shuffled baseline written directly (the volume policy would
    // collapse 6k rows to one file): every file spans ~the whole range
    li.repartition(6).write.parquet(s"$root/t")
    def ranges(): Seq[(Long, Long)] = {
      val files = new java.io.File(s"$root/t").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(unix_date(col("l_shipdate").cast("date"))).cast("long"),
            max(unix_date(col("l_shipdate").cast("date"))).cast("long"))
          .head()
        (r.getLong(0), r.getLong(1))
      }
    }
    def overlaps(rs: Seq[(Long, Long)]): Int =
      rs.combinations(2).count { case Seq((a1, a2), (b1, b2)) => a1 <= b2 && b1 <= a2 }
    val before = ranges()
    assert(before.size > 1 && overlaps(before) == before.combinations(2).size,
      "hash layout: every file pair overlaps")
    val total = wh.read("t").count()
    assert(wh.clusterBy("t", Seq("l_shipdate")) == total)
    assert(wh.read("t").count() == total, "clustering must not change the rows")
    val after = ranges()
    assert(after.size > 1)
    // range-partitioned + sorted: only boundary-touching neighbors may
    // overlap, so the overlap count collapses from all-pairs to at most
    // the number of adjacent pairs
    assert(overlaps(after) <= after.size - 1,
      s"clustered files must be near-disjoint, got ${overlaps(after)} of ${after.combinations(2).size} pairs")
  }

  test("zorderBy bounds per-file ranges on BOTH clustered columns at once") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val wh = Warehouse(spark, root)
    // two INDEPENDENT uniform dimensions: a single-column sort can bound
    // one of them per file but never both; Morton interleave bounds both
    val rng = new scala.util.Random(3)
    val rows = (0 until 40000).map(_ => (rng.nextInt(10000), rng.nextInt(10000)))
    rows.toDF("x", "y").repartition(8).write.parquet(s"$root/t")
    def spans(colName: String): Seq[Long] = {
      new java.io.File(s"$root/t").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
        .map { f =>
          val r = spark.read.parquet(f)
            .agg(min(col(colName)).cast("long"), max(col(colName)).cast("long")).head()
          r.getLong(1) - r.getLong(0)
        }
    }
    assert(spans("x").forall(_ > 9000) && spans("y").forall(_ > 9000),
      "hash layout: every file spans ~the whole domain on both columns")
    val total = wh.read("t").count()
    assert(wh.zorderBy("t", Seq("x", "y"), targetFiles = Some(16)) == total)
    assert(wh.read("t").count() == total, "z-ordering must not change the rows")
    // 16 files over a 2-D Morton curve ≈ a 4×4 grid: each file should span
    // about a quarter of each domain; allow generous slack for quantile
    // sketch error and range-partition boundary straddle
    def avg(s: Seq[Long]): Double = s.sum.toDouble / s.size
    assert(spans("x").size > 4)
    assert(avg(spans("x")) < 5000 && avg(spans("y")) < 5000,
      s"z-order must bound both dims: avg x span ${avg(spans("x"))}, y ${avg(spans("y"))}")
  }

  test("compaction and warehouse copies preserve the partition layout") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_partkeep").toString
    val wh = Warehouse(spark, root)
    wh.write("gold_f", Seq((1, 2020, "a"), (2, 2021, "b"), (3, 2021, "c"))
      .toDF("id", "y", "v"), partitionBy = Seq("y"))
    assert(wh.partitionColsOf("gold_f") == Seq("y"))
    val before = wh.read("gold_f").orderBy("id").collect().toSeq
    wh.compact("gold_f")
    assert(new java.io.File(s"$root/gold_f/data/y=2020").isDirectory,
      "compaction must keep the year directories")
    assert(wh.read("gold_f").orderBy("id").collect().toSeq == before)
    val p = new Pipeline(wh, src, "exec-pk", fixedClock)
    p.copyToWarehouse()
    assert(new java.io.File(s"$root/dw_gold_f/data/y=2021").isDirectory,
      "warehouse copies must keep the year directories")
    assert(wh.read("dw_gold_f").orderBy("id").collect().toSeq == before)
  }

  test("pruned merge with NULL partition values keeps the default partition's rows") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_nullpart").toString
    val wh = Warehouse(spark, root)
    wh.write("f", Seq((1, Some(2020), "a", 1), (2, None, "b", 1), (3, None, "c", 1))
      .toDF("id", "y", "v", "ver"), partitionBy = Seq("y"))
    // incoming touches ONLY the null partition: updates id=2, inserts id=5
    val incoming = Seq((2, None: Option[Int], "B", 2), (5, None: Option[Int], "e", 1))
      .toDF("id", "y", "v", "ver")
    val n = wh.mergeUpsert("f", incoming, Seq("id"), Seq(col("ver").desc),
      partitionBy = Seq("y"))
    assert(n == 4)
    val got = wh.read("f").select("id", "v", "ver").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((1, "a", 1), (2, "B", 2), (3, "c", 1), (5, "e", 1)),
      "row 3 lives in the null partition and must survive the pruned rewrite")
  }

  test("a hung warehouse copy times out, fires the hook, and the rest complete") {
    import scala.concurrent.duration._
    import graft.meta.ControlTables.LogEntry
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_copy_to").toString
    val wh2 = Warehouse(spark, root)
    wh2.write("gold_a", Seq((1, "x")).toDF("id", "v"))
    wh2.write("gold_b", Seq((2, "y")).toDF("id", "v"))
    var captured = List.empty[LogEntry]
    val p = new Pipeline(wh2, src, "exec-copy", fixedClock, onFailure = e => captured ::= e)
    val done = p.copyToWarehouse(timeout = 5.seconds, copyFn = (t, target) => {
      if (t == "gold_a") Thread.sleep(120000)
      wh2.write(target, wh2.read(t))
    })
    assert(done.keySet == Set("gold_b"), s"only the healthy copy completes, got $done")
    assert(captured.exists(e => e.tableName == "dw_gold_a" && e.status == "failed" &&
      e.error.exists(_.contains("timed out"))),
      s"hook must receive the timed-out copy, got $captured")
    assert(wh2.read("dw_gold_b").count() == 1)
  }

  test("Delta merge sources are schema-aligned to the target (null-fill missing, drop extras)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_align").toString
    val wh = Warehouse(spark, root)
    wh.write("tgt", Seq((1, "a", 10.0)).toDF("id", "v", "only_in_target"))
    val incoming = Seq((2, "b", true)).toDF("id", "v", "only_in_source")
    val aligned = wh.alignToTarget("tgt", incoming)
    assert(aligned.columns.toSeq == Seq("id", "v", "only_in_target"),
      "aligned source must carry exactly the target's columns, in order")
    val row = aligned.head()
    assert(row.getInt(0) == 2 && row.getString(1) == "b" && row.isNullAt(2),
      "missing target columns null-fill; source-only columns are dropped")
  }

  test("writeObserved harvests DQ metrics from the write job itself") {
    val root = java.nio.file.Files.createTempDirectory("graft_obs").toString
    val wh = Warehouse(spark, root)
    val src = sources.Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    val (n, m) = wh.writeObserved("obs_t", src, Seq(
      count(lit(1)).as("rows"),
      sum(when(col("c_acctbal") < 0, 1L).otherwise(0L)).as("negative_balances"),
      coalesce(sum(when(col("c_mktsegment").isNull, 1L).otherwise(0L)), lit(0L))
        .as("null_segments")))
    // the observed metrics must equal a direct recount of what was written
    val back = wh.read("obs_t")
    assert(m("rows") == n && n == back.count())
    assert(m("negative_balances") == back.filter(col("c_acctbal") < 0).count())
    assert(m("null_segments") == back.filter(col("c_mktsegment").isNull).count())
  }

  test("analyze feeds real row/column statistics to the cost-based optimizer") {
    val root = java.nio.file.Files.createTempDirectory("graft_stats").toString
    val wh = Warehouse(spark, root)
    val n = wh.write("stats_t",
      sources.Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_orderpriority"))
    wh.analyze("stats_t")
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.table("stats_t").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(n)),
        s"CBO must see the exact row count $n, got ${stats.rowCount}")
      assert(stats.attributeStats.nonEmpty, "column-level stats must be recorded")
      val key = stats.attributeStats.find(_._1.name == "o_orderkey").map(_._2)
      assert(key.exists(_.distinctCount.isDefined), s"o_orderkey needs an NDV, got $key")
    } finally {
      saved.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
        spark.conf.set("spark.sql.cbo.enabled", _))
      spark.sql("DROP TABLE IF EXISTS stats_t")
    }
  }

  test("timestamp time travel: AS OF resolves the newest commit <= ts, ties to the highest version") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_tts").toString
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    val times = Array(1000L, 2000L, 2000L) // v1 and v2 land the same instant
    val tick = new java.util.concurrent.atomic.AtomicInteger(0)
    VersionedTable.withClock(() => times(math.min(tick.getAndIncrement(), 2))) {
      VersionedTable.overwrite(spark, root, df(0, 10))
      VersionedTable.append(spark, root, df(10, 20))
      VersionedTable.append(spark, root, df(20, 30))
    }
    assert(VersionedTable.timestampAsOf(root, 1000L) == 0L)
    assert(VersionedTable.timestampAsOf(root, 1500L) == 0L)
    // the tie: two commits stamped 2000 resolve DETERMINISTICALLY to the
    // higher version (version numbers are the true commit order)
    assert(VersionedTable.timestampAsOf(root, 2000L) == 2L)
    assert(VersionedTable.timestampAsOf(root, 99999L) == 2L)
    assert(VersionedTable.readAsOf(spark, root, 1500L).count() == 10)
    assert(VersionedTable.readAsOf(spark, root, 2000L).count() == 30)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.timestampAsOf(root, 999L)
    }
    assert(e.getMessage.contains("no commit at or before"))
    // history surfaces the same timestamps and the operation kinds
    val h = VersionedTable.history(spark, root).orderBy("version").collect()
    assert(h.map(_.getAs[Long]("ts_ms")).toSeq == Seq(1000L, 2000L, 2000L))
    assert(h.map(_.getAs[String]("operation")).toSeq ==
      Seq("OVERWRITE", "APPEND", "APPEND"))
    // CHANGE FEED BETWEEN TIMESTAMPS rides the same resolution: 1500 ->
    // 2000 resolves to v0 -> v2, i.e. both appends' rows as inserts
    val feed = VersionedTable.changeFeedAsOf(spark, root, 1500L, 2000L)
    assert(feed.filter(col("_change_type") === "insert").count() == 20)
    assert(feed.filter(col("_change_type") === "delete").count() == 0)
    // RESTORE TO TIMESTAMP rides the same resolution: back to the 1500
    // state (= v0) as a new data-free commit
    VersionedTable.restoreAsOf(spark, root, 1500L)
    assert(VersionedTable.read(spark, root).count() == 10)
    assert(VersionedTable.versions(root).size == 4)
  }

  test("protocol fuzz: 60 random op sequences over the FULL verb set keep read(), time travel, and history consistent with the model") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    val rnd = new scala.util.Random(42) // seeded: reproducible sequences
    def df(rows: Seq[(Long, Long)]) = rows.toDF("id", "x")
    (0 until 3).foreach { run =>
      val root = java.nio.file.Files.createTempDirectory(s"graft_fuzz$run").toString
      // the MODEL: expected row set per committed version (id -> x)
      var model = Map.empty[Long, Long]
      val history = scala.collection.mutable.Map.empty[Long, Map[Long, Long]]
      var nextId = 0L
      def fresh(n: Int): Seq[(Long, Long)] =
        (0 until n).map { _ => nextId += 1; (nextId, rnd.nextLong(1000L)) }
      val init = fresh(50)
      model = init.toMap
      VersionedTable.overwrite(spark, root, df(init))
      history(VersionedTable.versions(root).last) = model
      (0 until 20).foreach { _ =>
        rnd.nextInt(10) match {
          case 0 => // append
            val rows = fresh(rnd.nextInt(30) + 1)
            VersionedTable.append(spark, root, df(rows))
            model = model ++ rows
          case 1 => // overwrite
            val rows = fresh(rnd.nextInt(40) + 1)
            VersionedTable.overwrite(spark, root, df(rows))
            model = rows.toMap
          case 2 => // bounded delete on id range
            val lo = rnd.nextLong(nextId + 1)
            val hi = math.min(lo + rnd.nextLong(40L), nextId)
            VersionedTable.deleteWhere(spark, root,
              Seq(SkippingIndex.ColRange("id", lo.toDouble, hi.toDouble)))
            model = model.filter { case (id, _) => id < lo || id > hi }
          case 3 => // optimize (content-preserving)
            VersionedTable.optimize(spark, root, Seq("id"), numFiles = 3)
          case 4 => // restore to a random recorded version
            val vs = VersionedTable.versions(root)
            val v = vs(rnd.nextInt(vs.size))
            VersionedTable.restore(spark, root, v)
            model = history(v)
          case 5 => // vacuum with the safe default: must change NOTHING
            VersionedTable.vacuum(root)
          case 6 => // bounded UPDATE on an id box: x -> x + k for hits
            val lo = rnd.nextLong(nextId + 1)
            val hi = math.min(lo + rnd.nextLong(40L), nextId)
            val k = rnd.nextLong(100L) + 1L
            VersionedTable.updateWhere(spark, root,
              col("id") >= lo && col("id") <= hi,
              Map("x" -> (col("x") + org.apache.spark.sql.functions.lit(k))),
              Seq(SkippingIndex.ColRange("id", lo.toDouble, hi.toDouble)))
            model = model.map { case (id, x) =>
              id -> (if (id >= lo && id <= hi) x + k else x) }
          case 7 => // MERGE: updates over a random existing slice + fresh inserts
            val existing = rnd.shuffle(model.keys.toSeq.sorted)
              .take(rnd.nextInt(10)).map(id => (id, rnd.nextLong(1000L)))
            val inserts = fresh(rnd.nextInt(10))
            val src = existing ++ inserts
            if (src.nonEmpty) {
              VersionedTable.mergeInto(spark, root, df(src), Seq("id"),
                updateWhen = Some(org.apache.spark.sql.functions.lit(true)),
                insertWhen = Some(org.apache.spark.sql.functions.lit(true)))
              model = model ++ src
            }
          case 8 => // key-list delete over a random mix of live + dead ids
            val keys = rnd.shuffle(model.keys.toSeq.sorted).take(rnd.nextInt(10)) ++
              Seq(nextId + 500L) // a key that matches nothing
            VersionedTable.deleteWhereKeys(spark, root, "id",
              keys.toDF("id"))
            model = model -- keys
          case 9 => // small-file compaction (content-preserving)
            VersionedTable.compactSmall(spark, root, minBytes = 1024L * 1024)
        }
        val head = VersionedTable.versions(root).last
        history(head) = model
        // invariant 1: the head reads exactly the model
        val got = VersionedTable.read(spark, root).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == model, s"run $run: head diverged from the model")
        // invariant 2: a random recorded version still time-travels true
        val vs = VersionedTable.versions(root)
        val probe = vs(rnd.nextInt(vs.size))
        val old = VersionedTable.read(spark, root, Some(probe)).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(old == history(probe), s"run $run: v$probe time travel diverged")
      }
      // invariant 3: every commit has a meta header the history can render
      val ops = VersionedTable.history(spark, root).collect()
        .map(_.getAs[String]("operation"))
      assert(ops.forall(_ != null) && ops.nonEmpty)
    }
  }

  test("restore vs vacuum(keep): the head never references deleted files") {
    import spark.implicits._
    import graft.sources.VersionedTable
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    def freshTable(tag: String): String = {
      val root = java.nio.file.Files.createTempDirectory(s"graft_rvr$tag").toString
      VersionedTable.overwrite(spark, root, df(0, 40))    // v0
      VersionedTable.overwrite(spark, root, df(100, 160)) // v1
      root
    }
    def headSound(root: String, allowed: Set[Long]): Unit = {
      assert(allowed.contains(VersionedTable.read(spark, root).count()))
      VersionedTable.dataFiles(root).foreach(f =>
        assert(new java.io.File(s"$root/$f").exists(), s"head lists missing $f"))
    }
    // (a) vacuum fully first: restore fails FAST with the retired error —
    // it must never commit a head pointing at the deleted files
    val a = freshTable("a")
    VersionedTable.vacuum(a, keep = Some(1), minAgeMs = 0L)
    val ea = intercept[IllegalStateException] { VersionedTable.restore(spark, a, 0L) }
    assert(ea.getMessage.contains("retired"))
    headSound(a, Set(60L))
    // (b) restore fully first: the later vacuum's kept window includes the
    // restore commit, so v0's re-published files are live and spared
    val b = freshTable("b")
    VersionedTable.restore(spark, b, 0L)
    VersionedTable.vacuum(b, keep = Some(1), minAgeMs = 0L)
    headSound(b, Set(40L))
    // (c) THE window: restore commits INSIDE a running vacuum, after its
    // live-set was computed from [v0, v1] but before deletion — the
    // vacuum's head re-read must spare the files the new head references
    val c = freshTable("c")
    VersionedTable.vacuumWindowHook = () => {
      VersionedTable.restore(spark, c, 0L); ()
    }
    try VersionedTable.vacuum(c, keep = Some(1), minAgeMs = 0L)
    finally VersionedTable.vacuumWindowHook = () => ()
    headSound(c, Set(40L))
    assert(VersionedTable.read(spark, c).select("id").collect().map(_.getLong(0)).toSet ==
      (0L until 40L).toSet, "the restored content survives the racing vacuum")
    // (d) CONCURRENT restore ∥ vacuum under the SAFE DEFAULT retention —
    // the supported concurrent mode (age-0 is documented quiesced-only):
    // whatever the interleaving, the head stays fully readable
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    (0 until 4).foreach { i =>
      val root = freshTable(s"d$i")
      val restore = Future(
        try Some(VersionedTable.restore(spark, root, 0L))
        catch { case _: Exception => None }) // lost to vacuum: allowed
      val vac = Future(VersionedTable.vacuum(root, keep = Some(1)))
      Await.result(restore, 60.seconds)
      Await.result(vac, 60.seconds)
      headSound(root, Set(40L, 60L))
    }
  }

  test("general-predicate delete: IN-list filters exactly, the bounding box still carries files untouched") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    import SkippingIndex.ColRange
    val root = java.nio.file.Files.createTempDirectory("graft_vdelin").toString
    val df = (0 until 8000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
    VersionedTable.overwrite(spark, root, df)
    val v0Files = VersionedTable.dataFiles(root)
    def diskState(rel: String) = {
      val f = new java.io.File(s"$root/$rel")
      (f.lastModified(), f.length())
    }
    val before = v0Files.map(f => f -> diskState(f)).toMap
    val doomed = Seq(2100L, 2500L, 2900L)
    val (v1, rewritten, carried) = VersionedTable.deleteWherePredicate(spark, root,
      col("id").isin(doomed: _*), Seq(ColRange("id", 2100, 2900)))
    assert(rewritten >= 1 && carried >= 6,
      s"the IN-list delete must stay bounded by its box: rewritten=$rewritten carried=$carried")
    // exact predicate semantics: ONLY the listed ids left, not the box
    val ids = VersionedTable.read(spark, root).select("id").collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 8000L).toSet -- doomed)
    // carried files are byte-identical, old snapshot still travels
    val carriedRel = v0Files.toSet.intersect(VersionedTable.dataFiles(root).toSet)
    assert(carriedRel.size == carried)
    carriedRel.foreach(f => assert(diskState(f) == before(f)))
    assert(VersionedTable.read(spark, root, Some(v1 - 1)).count() == 8000)
    // no caller boxes: the engine now EXTRACTS them from the predicate
    // (id = 7000 → a point box), so even a hint-free delete is bounded
    val (_, rw2, c2) = VersionedTable.deleteWherePredicate(spark, root, col("id") === 7000L)
    assert(rw2 == 1 && c2 >= 6, s"auto-extracted box must bound: rw=$rw2 carried=$c2")
    assert(VersionedTable.read(spark, root).count() == 8000 - doomed.size - 1)
    // an UNBOUNDABLE predicate still rewrites everything — exact, never
    // wrongly pruned
    val (_, rw3, c3) = VersionedTable.deleteWherePredicate(spark, root,
      org.apache.spark.sql.functions.length(col("v")) === lit(99))
    assert(c3 == 0 && rw3 >= 1, "unboundable predicate => every file rewrites")
    assert(VersionedTable.read(spark, root).count() == 8000 - doomed.size - 1)
  }

  test("bounded update: CASE-WHEN semantics, box-carried files byte-identical, NULL predicate is no match") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    import SkippingIndex.ColRange
    val root = java.nio.file.Files.createTempDirectory("graft_vupd").toString
    // id 100 gets a NULL qty: the predicate evaluates NULL there and SQL
    // UPDATE semantics must leave the row untouched
    val df = (0 until 8000).map(i =>
        (i.toLong, if (i == 100) None else Some(i % 50), s"v$i"))
      .toDF("id", "qty", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
    VersionedTable.overwrite(spark, root, df)
    val v0Files = VersionedTable.dataFiles(root)
    def diskState(rel: String) = {
      val f = new java.io.File(s"$root/$rel")
      (f.lastModified(), f.length())
    }
    val before = v0Files.map(f => f -> diskState(f)).toMap
    // predicate: id in [50, 150] AND qty < 10 — qty is NULL at id=100
    val (v1, rewritten, carried) = VersionedTable.updateWhere(spark, root,
      col("id") >= 50L && col("id") <= 150L && col("qty") < 10,
      Map("v" -> org.apache.spark.sql.functions.lit("HIT"),
          "qty" -> (col("qty") + 1000)),
      Seq(ColRange("id", 50, 150)))
    assert(rewritten >= 1 && carried >= 6,
      s"the update must stay bounded by its box: rewritten=$rewritten carried=$carried")
    val rows = VersionedTable.read(spark, root)
      .select("id", "qty", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getString(2)))
      .toMap
    (0 until 8000).foreach { i =>
      val hit = i >= 50 && i <= 150 && i != 100 && (i % 50) < 10
      val expect =
        if (i == 100) (None, "v100") // NULL predicate: not a match
        else if (hit) (Some(i % 50 + 1000), "HIT")
        else (Some(i % 50), s"v$i")
      assert(rows(i.toLong) == expect, s"row $i: got ${rows(i.toLong)}, want $expect")
    }
    // hit was evaluated against the PRE-update row: qty+1000 never re-hits
    // carried files byte-identical; pre-update snapshot still travels
    val carriedRel = v0Files.toSet.intersect(VersionedTable.dataFiles(root).toSet)
    assert(carriedRel.size == carried)
    carriedRel.foreach(f => assert(diskState(f) == before(f)))
    assert(VersionedTable.read(spark, root, Some(v1 - 1))
      .filter(col("v") === "HIT").count() == 0)
    assert(VersionedTable.commitMeta(root, v1).map(_._2).contains("UPDATE"))
    // no caller boxes: the engine now EXTRACTS them from the predicate
    // (id = 7000 → a point box), so the hint-free update is bounded too
    val (_, rw2, c2) = VersionedTable.updateWhere(spark, root,
      col("id") === 7000L, Map("v" -> org.apache.spark.sql.functions.lit("X")))
    assert(rw2 == 1 && c2 >= 6, s"auto-extracted box must bound: rw=$rw2 carried=$c2")
    assert(VersionedTable.read(spark, root).filter(col("v") === "X").count() == 1)
  }

  test("partitioned update: a SET on the partition column re-homes rows to their new directory") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.lit
    val root = java.nio.file.Files.createTempDirectory("graft_vupdp").toString
    VersionedTable.overwrite(spark, root,
      (0 until 300).map(i => (i.toLong, s"p${i % 3}", s"v$i")).toDF("id", "part", "v"),
      partitionBy = Seq("part"))
    // move every p2 row to partition p9
    VersionedTable.updateWhere(spark, root,
      col("part") === "p2", Map("part" -> lit("p9")))
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 300)
    assert(got.filter(col("part") === "p2").count() == 0)
    assert(got.filter(col("part") === "p9").count() == 100)
    // the moved rows physically live under the NEW Hive directory
    val p9Files = VersionedTable.dataFiles(root).filter(_.contains("part=p9"))
    assert(p9Files.nonEmpty, "updated rows must land in part=p9 directories")
    // partition pruning still works on the updated layout
    val pruned = got.filter(col("part") === "p9").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(pruned == (0L until 300L).filter(_ % 3 == 2).toSet)
    // time travel shows the pre-move layout
    assert(VersionedTable.read(spark, root, Some(0L))
      .filter(col("part") === "p2").count() == 100)
  }

  test("update SET expressions all read the PRE-update row: SET a=b, b=a swaps") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_vswap").toString
    VersionedTable.overwrite(spark, root,
      (0 until 100).map(i => (i.toLong, i * 10L, i * 100L)).toDF("id", "a", "b"))
    // SQL UPDATE evaluates every SET RHS against the pre-update row, so
    // this swaps a and b on hit rows — a sequential fold would instead
    // set a=b then b=(new a)=b, losing a
    VersionedTable.updateWhere(spark, root, col("id") < 10L,
      Map("a" -> col("b"), "b" -> col("a")))
    val got = VersionedTable.read(spark, root).select("id", "a", "b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0 until 100).foreach { i =>
      val want = if (i < 10) (i * 100L, i * 10L) else (i * 10L, i * 100L)
      assert(got(i.toLong) == want, s"row $i: got ${got(i.toLong)}, want $want")
    }
    // and a SET referencing a column the same UPDATE also sets, mixed
    // with arithmetic: both read the original values
    VersionedTable.updateWhere(spark, root, col("id") === 50L,
      Map("a" -> (col("a") + col("b")), "b" -> (col("a") - col("b"))))
    val r50 = VersionedTable.read(spark, root).filter(col("id") === 50L)
      .select("a", "b").collect().head
    assert(r50.getLong(0) == 500L + 5000L && r50.getLong(1) == 500L - 5000L)
  }

  test("update refuses unknown SET targets, keeps committed types, and upholds generated columns + checks") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.lit
    val root = java.nio.file.Files.createTempDirectory("graft_vupdg").toString
    VersionedTable.overwrite(spark, root,
      (0 until 100).map(i => (i.toLong, i % 10, (i % 10).toLong)).toDF("id", "qty", "bucket"))
    VersionedTable.addGeneratedColumn(spark, root, "bucket", "pmod(id, 10)")
    VersionedTable.addCheckConstraint(spark, root, "qty_small", "qty < 100000")
    // (a) unknown SET target refused — UPDATE never adds columns
    val eUnknown = intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, root, col("id") < 5L, Map("nope" -> lit(1)))
    }
    assert(eUnknown.getMessage.contains("nope"))
    // (a') ... even when the prune box provably touches zero files: the
    // refuse-loudly contract cannot depend on whether the box matched
    val eUnknownBoxed = intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, root, col("id") === -1L,
        Map("nope" -> lit(1)),
        Seq(graft.sources.SkippingIndex.ColRange("id", -1, -1)))
    }
    assert(eUnknownBoxed.getMessage.contains("nope"),
      "a typo'd SET target must refuse even on a zero-touch box")
    // (b) SET of a generated column refused loudly
    val eGen = intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, root, col("id") < 5L, Map("bucket" -> lit(0L)))
    }
    assert(eGen.getMessage.contains("bucket") && eGen.getMessage.contains("generated"))
    // (c) updating a generated column's INPUT re-derives it on hit rows
    VersionedTable.updateWhere(spark, root, col("id") === 7L,
      Map("id" -> lit(1007L)))
    val r = VersionedTable.read(spark, root).filter(col("id") === 1007L)
      .select("bucket").collect()
    assert(r.length == 1 && r.head.getLong(0) == 7L,
      "bucket must re-derive as pmod(1007, 10) = 7 on the updated row")
    // (d) the SET expression is cast to the committed type (double -> int here)
    VersionedTable.updateWhere(spark, root, col("id") === 3L,
      Map("qty" -> lit(41.9))) // cast(41.9 as int) = 41, schema unchanged
    assert(VersionedTable.schemaOf(root).get("qty").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(VersionedTable.read(spark, root).filter(col("id") === 3L)
      .select("qty").collect().head.getInt(0) == 41)
    // (e) an update violating a CHECK constraint is refused whole
    val head = VersionedTable.versions(root).last
    val eChk = intercept[IllegalArgumentException] {
      VersionedTable.updateWhere(spark, root, col("id") === 4L,
        Map("qty" -> lit(200000)))
    }
    assert(eChk.getMessage.contains("qty_small"))
    assert(VersionedTable.versions(root).last == head, "nothing committed")
    assert(VersionedTable.read(spark, root).filter(col("qty") >= 100000).count() == 0)
  }

  test("rename/drop column are metadata-only: zero files touched, names time-travel, restore un-drops") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.lit
    val root = java.nio.file.Files.createTempDirectory("graft_vmap").toString
    VersionedTable.overwrite(spark, root,
      (0 until 400).map(i => (i.toLong, i % 50, s"n$i")).toDF("id", "qty", "note")
        .repartition(4))
    val v0Files = VersionedTable.dataFiles(root)
    def diskState(rel: String) = {
      val f = new java.io.File(s"$root/$rel")
      (f.lastModified(), f.length())
    }
    val before = v0Files.map(f => f -> diskState(f)).toMap
    // RENAME qty -> quantity: one commit, same files, same bytes
    val v1 = VersionedTable.renameColumn(spark, root, "qty", "quantity")
    assert(VersionedTable.dataFiles(root) == v0Files)
    v0Files.foreach(f => assert(diskState(f) == before(f)))
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id", "quantity", "note"))
    assert(VersionedTable.read(spark, root, Some(0L)).columns.toSeq == Seq("id", "qty", "note"),
      "old versions time-travel under their own names")
    assert(VersionedTable.logicalSchema(root).get.fieldNames.toSeq ==
      Seq("id", "quantity", "note"))
    assert(VersionedTable.commitMeta(root, v1).map(_._2).contains("RENAME COLUMN"))
    // a rename is not a data change: the feed across it is empty
    assert(VersionedTable.changeFeed(spark, root, 0L, v1).isEmpty)
    // appends address the CURRENT name; the old name is refused loudly
    VersionedTable.append(spark, root,
      (400 until 500).map(i => (i.toLong, i % 50, s"n$i")).toDF("id", "quantity", "note"))
    val eOld = intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root,
        Seq((999L, 1, "x")).toDF("id", "qty", "note"))
    }
    assert(eOld.getMessage.contains("renamed to `quantity`"))
    assert(VersionedTable.read(spark, root).count() == 500)
    assert(VersionedTable.read(spark, root)
      .filter(col("quantity") === col("id") % 50).count() == 500,
      "old files' physical qty serves under the logical name")
    // DROP note: bytes stay, the logical view loses the column
    val vDrop = VersionedTable.dropColumn(spark, root, "note")
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id", "quantity"))
    assert(VersionedTable.read(spark, root, Some(vDrop - 1)).columns.contains("note"))
    // a new column cannot shadow the dropped physical slot
    val eShadow = intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root,
        Seq((1000L, 1, "x")).toDF("id", "quantity", "note"))
    }
    assert(eShadow.getMessage.contains("DROPPED"))
    // RESTORE un-drops: the mapping is snapshot metadata
    VersionedTable.restore(spark, root, vDrop - 1)
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id", "quantity", "note"))
    VersionedTable.dropColumn(spark, root, "note") // drop again for the purge check
    // OPTIMIZE physically purges the dropped column from rewritten files
    VersionedTable.optimize(spark, root, Seq("id"), 2)
    val newFiles = VersionedTable.dataFiles(root).map(f => s"$root/$f")
    val physCols = spark.read.parquet(newFiles: _*).schema.fieldNames.toSet
    assert(!physCols.contains("note"), s"purged files still carry note: $physCols")
    assert(physCols.contains("qty"), "the rename stays metadata: physical name persists")
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id", "quantity"))
    assert(VersionedTable.read(spark, root).count() == 500)
    // rename BACK to the physical name clears the mapping entry
    VersionedTable.renameColumn(spark, root, "quantity", "qty")
    assert(VersionedTable.columnMapping(root)._1.isEmpty)
    assert(VersionedTable.read(spark, root).columns.toSeq == Seq("id", "qty"))
  }

  test("rename/drop refusals, and bounded DML + feed address the logical view") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    import SkippingIndex.ColRange
    import org.apache.spark.sql.functions.lit
    val root = java.nio.file.Files.createTempDirectory("graft_vmapdml").toString
    VersionedTable.overwrite(spark, root,
      (0 until 8000).map(i => (i.toLong, i % 10, s"v$i")).toDF("id", "qty", "v")
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"))
    VersionedTable.addCheckConstraint(spark, root, "qty_pos", "qty >= 0")
    // refusals: referenced / colliding / missing / partitioned / last column
    assert(intercept[IllegalArgumentException](
      VersionedTable.renameColumn(spark, root, "qty", "quantity"))
      .getMessage.contains("qty_pos"))
    assert(intercept[IllegalArgumentException](
      VersionedTable.dropColumn(spark, root, "qty"))
      .getMessage.contains("qty_pos"))
    assert(intercept[IllegalArgumentException](
      VersionedTable.renameColumn(spark, root, "id", "qty"))
      .getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException](
      VersionedTable.renameColumn(spark, root, "nope", "x"))
      .getMessage.contains("no column"))
    // rename id -> key, then bounded DML in LOGICAL names: the prune
    // boxes map through to the files' physical stats
    VersionedTable.renameColumn(spark, root, "id", "key")
    val (_, rw, carried) = VersionedTable.deleteWherePredicate(spark, root,
      col("key").isin(2100L, 2500L), Seq(ColRange("key", 2100, 2500)))
    assert(rw >= 1 && carried >= 6,
      s"logical-name boxes must still prune physical stats: rw=$rw carried=$carried")
    assert(VersionedTable.read(spark, root).count() == 7998)
    val (_, rwU, carriedU) = VersionedTable.updateWhere(spark, root,
      col("key") === 3000L, Map("v" -> lit("HIT")),
      Seq(ColRange("key", 3000, 3000)))
    assert(rwU >= 1 && carriedU >= 6)
    assert(VersionedTable.read(spark, root)
      .filter(col("v") === "HIT").select("key").collect().map(_.getLong(0)).toSeq == Seq(3000L))
    // the feed across drop+append serves the TO version's logical view
    VersionedTable.dropColumn(spark, root, "v")
    val vFrom = VersionedTable.versions(root).last
    VersionedTable.append(spark, root,
      Seq((9001L, 5)).toDF("key", "qty"))
    val feed = VersionedTable.changeFeed(spark, root, vFrom, vFrom + 1)
    assert(feed.columns.toSeq == Seq("key", "qty", "_change_type"))
    assert(feed.collect().map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((9001L, "insert")))
    // partition-column mapping is refused
    val proot = java.nio.file.Files.createTempDirectory("graft_vmapp").toString
    VersionedTable.overwrite(spark, proot,
      (0 until 100).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "part"),
      partitionBy = Seq("part"))
    assert(intercept[IllegalArgumentException](
      VersionedTable.renameColumn(spark, proot, "part", "bucket"))
      .getMessage.contains("partition"))
    assert(intercept[IllegalArgumentException](
      VersionedTable.dropColumn(spark, proot, "part"))
      .getMessage.contains("partition"))
    // the last remaining column cannot be dropped
    VersionedTable.dropColumn(spark, proot, "id")
    assert(intercept[IllegalArgumentException](
      VersionedTable.dropColumn(spark, proot, "part"))
      .getMessage.contains("last column"))
    val lroot = java.nio.file.Files.createTempDirectory("graft_vmapl").toString
    VersionedTable.overwrite(spark, lroot, Seq((1L, 2L)).toDF("a", "b"))
    VersionedTable.dropColumn(spark, lroot, "a")
    assert(intercept[IllegalArgumentException](
      VersionedTable.dropColumn(spark, lroot, "b"))
      .getMessage.contains("last column"))
  }

  test("full-form merge: update/delete/insert clauses, source-derived pruning, multiple-matches refusal") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.{expr, lit}
    val root = java.nio.file.Files.createTempDirectory("graft_vmerge").toString
    // target: 8000 keys, range-clustered into 8 files, version column
    VersionedTable.overwrite(spark, root,
      (0 until 8000).map(i => (i.toLong, 1, s"t$i")).toDF("id", "rev", "v")
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"))
    val v0Files = VersionedTable.dataFiles(root)
    def diskState(rel: String) = {
      val f = new java.io.File(s"$root/$rel")
      (f.lastModified(), f.length())
    }
    val before = v0Files.map(f => f -> diskState(f)).toMap
    // source confined to [2000, 2999] plus inserts at 9000+:
    //   2000..2099 rev=2  -> update fires (s.rev > t.rev)
    //   2100..2199 rev=0  -> update does NOT fire; delete fires (s.rev = 0)
    //   2200..2299 rev=1  -> neither clause fires: target carries
    //   9000..9099 rev=5  -> no match: insert
    val source = ((2000 until 2100).map(i => (i.toLong, 2, s"s$i")) ++
        (2100 until 2200).map(i => (i.toLong, 0, s"s$i")) ++
        (2200 until 2300).map(i => (i.toLong, 1, s"s$i")) ++
        (9000 until 9100).map(i => (i.toLong, 5, s"s$i")))
      .toDF("id", "rev", "v")
    val (v1, rewritten, carried) = VersionedTable.mergeInto(spark, root, source,
      Seq("id"),
      updateWhen = Some(expr("s.rev > t.rev")),
      deleteWhen = Some(expr("s.rev = 0")),
      insertWhen = Some(lit(true)))
    assert(rewritten >= 1 && carried >= 6,
      s"source-derived boxes must prune: rewritten=$rewritten carried=$carried")
    val rows = VersionedTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(rows.size == 8000 - 100 + 100) // 100 deleted, 100 inserted
    (2000 until 2100).foreach(i => assert(rows(i.toLong) == (2, s"s$i"), s"update $i"))
    (2100 until 2200).foreach(i => assert(!rows.contains(i.toLong), s"delete $i"))
    (2200 until 2300).foreach(i => assert(rows(i.toLong) == (1, s"t$i"), s"carry $i"))
    (9000 until 9100).foreach(i => assert(rows(i.toLong) == (5, s"s$i"), s"insert $i"))
    assert(rows(0L) == (1, "t0") && rows(7999L) == (1, "t7999"))
    // carried files byte-identical; pre-merge snapshot still travels
    val carriedRel = v0Files.toSet.intersect(VersionedTable.dataFiles(root).toSet)
    assert(carriedRel.size == carried)
    carriedRel.foreach(f => assert(diskState(f) == before(f)))
    assert(VersionedTable.read(spark, root, Some(v1 - 1)).count() == 8000)
    assert(VersionedTable.commitMeta(root, v1).map(_._2).contains("MERGE"))
    // insert-only merge whose keys match NO file: zero files rewritten
    val (_, rw2, c2) = VersionedTable.mergeInto(spark, root,
      Seq((20000L, 1, "x")).toDF("id", "rev", "v"), Seq("id"),
      updateWhen = None, insertWhen = Some(lit(true)))
    assert(rw2 == 0, s"out-of-range insert must touch no target file, got $rw2")
    assert(c2 > 0 && VersionedTable.read(spark, root).count() == 8001)
    // duplicate source keys matching a target row are refused whole
    val head = VersionedTable.versions(root).last
    val eDup = intercept[IllegalArgumentException] {
      VersionedTable.mergeInto(spark, root,
        Seq((100L, 9, "a"), (100L, 8, "b")).toDF("id", "rev", "v"), Seq("id"),
        updateWhen = Some(lit(true)))
    }
    assert(eDup.getMessage.contains("multiple source rows"))
    assert(VersionedTable.versions(root).last == head, "nothing committed")
    // the rule is scoped to MATCHED clauses: unmatched dup keys insert
    // twice (Delta's insert-only behavior), and an INSERT-ONLY merge
    // with dup keys that DO match is unambiguous — they simply don't
    // insert, no refusal
    VersionedTable.mergeInto(spark, root,
      Seq((30000L, 1, "x"), (30000L, 2, "y")).toDF("id", "rev", "v"), Seq("id"),
      updateWhen = None, insertWhen = Some(lit(true)))
    assert(VersionedTable.read(spark, root).filter(col("id") === 30000L).count() == 2)
    val before200 = VersionedTable.read(spark, root).filter(col("id") === 200L)
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    VersionedTable.mergeInto(spark, root,
      Seq((200L, 8, "a"), (200L, 9, "b")).toDF("id", "rev", "v"), Seq("id"),
      updateWhen = None, insertWhen = Some(lit(true)))
    assert(VersionedTable.read(spark, root).filter(col("id") === 200L)
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq == before200,
      "insert-only merge: matching dup source rows neither insert nor refuse")
    // an empty source commits nothing
    val h2 = VersionedTable.versions(root).last
    val (v3, rw3, _) = VersionedTable.mergeInto(spark, root,
      Seq.empty[(Long, Int, String)].toDF("id", "rev", "v"), Seq("id"),
      updateWhen = Some(lit(true)), insertWhen = Some(lit(true)))
    assert(v3 == h2 && rw3 == 0 && VersionedTable.versions(root).last == h2)
    // merge addresses the LOGICAL view: rename id -> key, merge on key
    VersionedTable.renameColumn(spark, root, "id", "key")
    VersionedTable.mergeInto(spark, root,
      Seq((0L, 7, "merged")).toDF("key", "rev", "v"), Seq("key"),
      updateWhen = Some(lit(true)))
    assert(VersionedTable.read(spark, root).filter(col("key") === 0L)
      .select("rev", "v").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((7, "merged")))
  }

  test("composite-key merge prunes with per-column point probes: a bimodal 2-key batch rewrites only the files holding its keys") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.expr
    val root = java.nio.file.Files.createTempDirectory("graft_vmrg2k").toString
    val df = (0 until 8000).map(i => (i.toLong, (i % 4).toLong, s"v$i"))
      .toDF("id", "bucket", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
    VersionedTable.overwrite(spark, root, df)
    // bimodal CDC batch: updates for ids 10..19 (one clustered file) +
    // far-away inserts at 1M — the GLOBAL min/max box covers the whole
    // table, so only the per-column point probe keeps the merge bounded
    val srcRows = (10 until 20).map(i => (i.toLong, (i % 4).toLong, "UPD")) ++
      (0 until 10).map(i => (1000000L + i, 0L, "NEW"))
    val (_, rewritten, carried) = VersionedTable.mergeInto(spark, root,
      srcRows.toDF("id", "bucket", "v"), keys = Seq("id", "bucket"),
      updateWhen = Some(expr("true")), insertWhen = Some(expr("true")))
    assert(rewritten == 1 && carried == 7,
      s"the 2-key probe must keep only the file holding ids 10..19: rewritten=$rewritten carried=$carried")
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 8010)
    assert(got.filter(col("v") === "UPD").count() == 10)
    assert(got.filter(col("id") >= 1000000L).count() == 10)
    assert(got.filter(col("id") === 15L).select("v").collect().head.getString(0) == "UPD")
  }

  test("mergeInto evaluates the source plan once: the engine persists it defensively") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_vmrg1x").toString
    VersionedTable.overwrite(spark, root,
      (0 until 100).map(i => (i.toLong, s"t$i")).toDF("id", "v"))
    val acc = spark.sparkContext.longAccumulator("src_evals")
    val rdd = spark.sparkContext
      .parallelize((0 until 50).map(i => org.apache.spark.sql.Row(i.toLong * 2, "s")), 2)
      .mapPartitions { it => acc.add(1); it }
    val src = spark.createDataFrame(rdd,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))))
    val (_, rw, _) = VersionedTable.mergeInto(spark, root, src, Seq("id"),
      updateWhen = Some(expr("true")), insertWhen = Some(expr("true")))
    assert(rw >= 1)
    assert(acc.value == 2L,
      s"each source partition must compute exactly once (stats agg + dup probe + " +
        s"point probe + join all reuse the persisted source), got ${acc.value}")
    assert(VersionedTable.read(spark, root).filter(col("v") === "s").count() == 50)
  }

  test("merge schema evolution: evolveSchema appends source columns, old rows serve NULL, type flips refuse") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import org.apache.spark.sql.functions.expr
    val root = java.nio.file.Files.createTempDirectory("graft_vmrgev").toString
    VersionedTable.overwrite(spark, root,
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    // default: the extra column is CONDITION-ONLY, never lands
    VersionedTable.mergeInto(spark, root,
      Seq((5L, "u5", "x")).toDF("id", "v", "note"), Seq("id"),
      updateWhen = Some(expr("true")))
    assert(!VersionedTable.read(spark, root).columns.contains("note"))
    // evolveSchema: the column joins the target; untouched rows NULL
    val (v1, _, _) = VersionedTable.mergeInto(spark, root,
      Seq((7L, "u7", "n7"), (200L, "new", "n200")).toDF("id", "v", "note"),
      Seq("id"), updateWhen = Some(expr("true")),
      insertWhen = Some(expr("true")), evolveSchema = true)
    val got = VersionedTable.read(spark, root)
    assert(got.columns.contains("note"))
    assert(got.count() == 101)
    assert(got.filter(col("id") === 7L).select("v", "note").collect().head
      .toSeq == Seq("u7", "n7"))
    assert(got.filter(col("id") === 200L).select("note").collect().head.getString(0) == "n200")
    assert(got.filter(col("note").isNull).count() == 99,
      "pre-merge rows (and the condition-only-updated id 5) must serve NULL")
    // the schema header is stamped: a later plain append keeps the column
    VersionedTable.append(spark, root, Seq((300L, "a")).toDF("id", "v"))
    assert(VersionedTable.read(spark, root).filter(col("id") === 300L)
      .select("note").collect().head.isNullAt(0))
    // time travel: the pre-evolution version has no `note`
    assert(!VersionedTable.read(spark, root, Some(v1 - 1)).columns.contains("note"))
    // a type flip on an existing column refuses loudly even with evolveSchema
    val e = intercept[IllegalArgumentException] {
      VersionedTable.mergeInto(spark, root,
        Seq((1L, 99L, "z")).toDF("id", "v", "note"), Seq("id"),
        updateWhen = Some(expr("true")), evolveSchema = true)
    }
    assert(e.getMessage.contains("`v`") || e.getMessage.contains("column `v`"),
      s"got: ${e.getMessage}")
  }

  test("key-list delete: point probe beats the box on scattered lists, NULL keys kept, empty list no-op") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_vdelkeys").toString
    // id 4000 carries a NULL key: NOT-EXISTS semantics must keep it
    val df = (0 until 8000).map(i =>
        (if (i == 4000) None else Some(i.toLong), s"v$i")).toDF("id", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
    VersionedTable.overwrite(spark, root, df)
    // a SCATTERED list: two tight clusters far apart — the global box
    // [2100, 6200] spans half the table, the point probe keeps 2 files
    val doomed = ((2100L to 2150L) ++ (6100L to 6150L)).toDF("key")
    val (v1, rewritten, carried) = VersionedTable.deleteWhereKeys(
      spark, root, "id", doomed)
    assert(rewritten <= 2 && carried >= 6,
      s"the probe must beat the bimodal box: rewritten=$rewritten carried=$carried")
    val ids = VersionedTable.read(spark, root).select("id").collect()
      .map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    assert(ids.contains(-1L), "the NULL-key row survives (NOT EXISTS, not NOT IN)")
    assert(!ids.contains(2100L) && !ids.contains(6150L) && ids.contains(2151L))
    assert(VersionedTable.read(spark, root).count() == 8000 - 102)
    assert(VersionedTable.read(spark, root, Some(v1 - 1)).count() == 8000)
    // a list whose keys match nothing commits nothing
    val head = VersionedTable.versions(root).last
    val (v2, rw2, _) = VersionedTable.deleteWhereKeys(spark, root, "id",
      Seq(900000L, 900001L).toDF("key"))
    assert(v2 == head && rw2 == 0 && VersionedTable.versions(root).last == head)
    // an empty list and an all-null list are no-ops
    val (v3, rw3, _) = VersionedTable.deleteWhereKeys(spark, root, "id",
      Seq.empty[Long].toDF("key"))
    assert(v3 == head && rw3 == 0)
    val (v4, rw4, _) = VersionedTable.deleteWhereKeys(spark, root, "id",
      Seq[Option[Long]](None, None).toDF("key"))
    assert(v4 == head && rw4 == 0)
  }

  test("bounded optimize: only the boxed files recluster; small-file compaction packs only the small trail") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    import SkippingIndex.ColRange
    val root = java.nio.file.Files.createTempDirectory("graft_voptw").toString
    val df = (0 until 8000).map(i => (i.toLong, i % 50, s"v$i")).toDF("id", "qty", "v")
      .repartitionByRange(8, col("id")).sortWithinPartitions("id")
    VersionedTable.overwrite(spark, root, df)
    val v0Files = VersionedTable.dataFiles(root)
    def diskState(rel: String) = {
      val f = new java.io.File(s"$root/$rel")
      (f.lastModified(), f.length())
    }
    val before = v0Files.map(f => f -> diskState(f)).toMap
    // recluster ONLY the hot range [2000, 2999]: one or two files
    val (v1, rewritten, carried) = VersionedTable.optimizeWhere(spark, root,
      Seq("qty"), 2, Seq(ColRange("id", 2000, 2999)))
    assert(rewritten >= 1 && carried >= 6,
      s"bounded optimize must not touch the cold region: rw=$rewritten carried=$carried")
    // content-preserving, carried files byte-identical
    val after = VersionedTable.read(spark, root)
    assert(after.count() == 8000)
    assert(after.exceptAll(VersionedTable.read(spark, root, Some(v1 - 1))).isEmpty)
    val carriedRel = v0Files.toSet.intersect(VersionedTable.dataFiles(root).toSet)
    assert(carriedRel.size == carried)
    carriedRel.foreach(f => assert(diskState(f) == before(f)))
    assert(VersionedTable.commitMeta(root, v1).map(_._2).contains("OPTIMIZE"))
    // a box intersecting nothing commits nothing
    val head = VersionedTable.versions(root).last
    val (v2, rw2, _) = VersionedTable.optimizeWhere(spark, root,
      Seq("qty"), 2, Seq(ColRange("id", 900000, 900001)))
    assert(v2 == head && rw2 == 0)
    // SMALL-FILE COMPACTION: a trail of tiny per-epoch appends packs into
    // one file while the big base files carry
    val croot = java.nio.file.Files.createTempDirectory("graft_vcompact").toString
    VersionedTable.overwrite(spark, croot,
      (0 until 50000).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(2))
    (0 until 5).foreach(e => VersionedTable.append(spark, croot,
      Seq((100000L + e, s"epoch$e")).toDF("id", "v")))
    val bigFiles = VersionedTable.dataFiles(croot).filter { rel =>
      new java.io.File(s"$croot/$rel").length() >= 64 * 1024
    }
    val (_, rwC, carriedC) = VersionedTable.compactSmall(spark, croot,
      minBytes = 64 * 1024, targetBytes = 1024 * 1024)
    assert(carriedC == bigFiles.size,
      s"only the small trail packs: rw=$rwC carried=$carriedC big=${bigFiles.size}")
    assert(rwC >= 5, "the five epoch files (and any other small ones) all packed")
    assert(VersionedTable.read(spark, croot).count() == 50005)
    val packed = VersionedTable.dataFiles(croot).filterNot(bigFiles.contains)
    assert(packed.size == 1, s"five small files pack into one, got ${packed.size}")
    // fewer than two small files: nothing to pack, nothing commits
    val h2 = VersionedTable.versions(croot).last
    val (v3, rw3, _) = VersionedTable.compactSmall(spark, croot, minBytes = 64 * 1024)
    assert(v3 == h2 && rw3 == 0)
  }

  test("incremental clone sync: links only the churn, mirrors divergence away, re-sync no-ops") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    val base = java.nio.file.Files.createTempDirectory("graft_csync").toString
    val src = s"$base/src"; val dst = s"$base/dst"
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    VersionedTable.overwrite(spark, src, df(0, 400)
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"))
    // first sync = clone + marker
    assert(VersionedTable.cloneSync(spark, src, dst) >= 0L)
    assert(VersionedTable.read(spark, dst).count() == 400)
    // re-sync with nothing new: no-op
    assert(VersionedTable.cloneSync(spark, src, dst) == -1L)
    // src churns: an append and a bounded delete
    VersionedTable.append(spark, src, df(400, 500))
    VersionedTable.deleteWhere(spark, src, Seq(SkippingIndex.ColRange("id", 0, 99)))
    def inode(p: String): Object =
      java.nio.file.Files.getAttribute(java.nio.file.Paths.get(p), "unix:ino")
    val beforeFiles = VersionedTable.dataFiles(dst).toSet
    val v = VersionedTable.cloneSync(spark, src, dst)
    assert(v >= 0L)
    // dst head == src head, and ONLY the churned files were linked
    val srcRows = VersionedTable.read(spark, src).collect().map(_.getLong(0)).toSet
    val dstRows = VersionedTable.read(spark, dst).collect().map(_.getLong(0)).toSet
    assert(dstRows == srcRows && srcRows == (100L until 500L).toSet)
    val newFiles = VersionedTable.dataFiles(dst).toSet -- beforeFiles
    assert(newFiles.nonEmpty && newFiles.forall(f =>
      inode(s"$dst/$f") == inode(s"$src/$f")), "churn arrives as hard links")
    // the pre-sync dst snapshot still time-travels
    assert(VersionedTable.read(spark, dst, Some(v - 1)).count() == 400)
    // a DIVERGED mirror: a local append is mirrored away by the next sync
    VersionedTable.append(spark, dst, df(9000, 9010))
    assert(VersionedTable.read(spark, dst).count() == 410)
    VersionedTable.append(spark, src, df(500, 510)) // new src version to sync
    assert(VersionedTable.cloneSync(spark, src, dst) >= 0L)
    val mirrored = VersionedTable.read(spark, dst).collect().map(_.getLong(0)).toSet
    assert(mirrored == (100L until 510L).toSet, "the mirror equals the src head")
  }

  test("row provenance: adding commit per file; a bounded rewrite re-homes only the touched rows") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    import org.apache.spark.sql.functions.lit
    val root = java.nio.file.Files.createTempDirectory("graft_prov").toString
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    VersionedTable.overwrite(spark, root, df(0, 200)
      .repartitionByRange(4, col("id")).sortWithinPartitions("id"))
    VersionedTable.append(spark, root, df(200, 300))
    def prov() = VersionedTable.readWithProvenance(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val p1 = prov()
    assert((0 until 200).forall(i => p1(i.toLong) == 0L))
    assert((200 until 300).forall(i => p1(i.toLong) == 1L))
    // a bounded UPDATE re-homes ONLY the touched file's rows to v2
    VersionedTable.updateWhere(spark, root, col("id") === 10L,
      Map("v" -> lit("X")), Seq(SkippingIndex.ColRange("id", 10, 10)))
    val p2 = prov()
    assert(p2(10L) == 2L)
    assert(p2(199L) <= 2L && p2(250L) == 1L)
    val reHomed = p2.count(_._2 == 2L)
    assert(reHomed < 200, s"only the touched file re-homes, got $reHomed")
    // pinned-version provenance ignores later commits
    val p0 = VersionedTable.readWithProvenance(spark, root, Some(0L)).collect()
      .map(r => r.getLong(2)).toSet
    assert(p0 == Set(0L))
    // a table ROOT containing its own data/ segment still keys the map
    // (the rel-name regex must anchor on the LAST /data/)
    val tricky = java.nio.file.Files.createTempDirectory("graft_prov2")
      .resolve("data").resolve("t").toString
    VersionedTable.overwrite(spark, tricky, df(0, 10))
    val pt = VersionedTable.readWithProvenance(spark, tricky).collect()
      .map(r => r.getLong(2)).toSet
    assert(pt == Set(0L), s"root-with-data/ segment mis-keyed: $pt")
  }

  test("changeFeed across a type-redefining overwrite fails with a feed-specific error") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_cftype").toString
    VersionedTable.overwrite(spark, root,
      (0 until 10).map(i => (i.toLong, i.toLong)).toDF("id", "x"))
    // overwrite legitimately REDEFINES x: long -> string
    VersionedTable.overwrite(spark, root,
      (0 until 10).map(i => (i.toLong, s"s$i")).toDF("id", "x"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.changeFeed(spark, root, 0L, 1L).collect()
    }
    assert(e.getMessage.contains("changeFeed(0, 1)") &&
      e.getMessage.contains("`x`") && e.getMessage.contains("bigint") &&
      e.getMessage.contains("string"),
      s"feed-specific error naming versions and column, got: ${e.getMessage}")
  }

  test("restore of a legacy pre-schema version re-stamps the commit: the table keeps committed schemas") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_rleg").toString
    VersionedTable.overwrite(spark, root,
      (0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    // simulate a legacy pre-schema v0: strip its header lines
    val v0 = java.nio.file.Paths.get(root, "_commits", "v0.list")
    val stripped = new String(java.nio.file.Files.readAllBytes(v0), "UTF-8")
      .split("\n").filterNot(_.startsWith("#")).mkString("\n")
    java.nio.file.Files.write(v0, stripped.getBytes("UTF-8"))
    assert(VersionedTable.schemaOf(root, Some(0L)).isEmpty)
    // a schema-stamped overwrite on top, then restore the legacy version
    VersionedTable.overwrite(spark, root,
      (100 until 120).map(i => (i.toLong, s"b$i")).toDF("id", "v"))
    assert(VersionedTable.schemaOf(root).isDefined)
    VersionedTable.restore(spark, root, 0L)
    // the restored commit carries a re-stamped (footer-inferred) schema,
    // so later appends keep committing schemas instead of degrading
    assert(VersionedTable.schemaOf(root).isDefined,
      "restore must re-stamp a legacy version's schema on a stamped table")
    VersionedTable.append(spark, root,
      (200 until 210).map(i => (i.toLong, s"c$i")).toDF("id", "v"))
    assert(VersionedTable.schemaOf(root).isDefined,
      "the append after the restore must still stamp")
    assert(VersionedTable.read(spark, root).count() == 20)
  }

  test("manifests exist from the first versioned write: pipeline gold tables prune out of the box") {
    pipe // ordered: the full run wrote the gold tables
    import graft.sources.SkippingIndex.ColRange
    val wh = Warehouse(spark, whRoot)
    // no explicit refreshManifest ever ran for fact_orders — the write
    // path itself must have built the manifest peer
    assert(new java.io.File(s"$whRoot/gold_fact_orders__manifest").exists(),
      "first versioned write must create the manifest")
    val ranges = Seq(ColRange("order_year", 2021, 2021))
    val pruned = wh.prunedRead("gold_fact_orders", ranges)
      .filter(col("order_year") === 2021)
    val plain = wh.read("gold_fact_orders").filter(col("order_year") === 2021)
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    // and the listing still hides it
    assert(!wh.list("gold_").exists(_.endsWith("__manifest")))
  }

  test("convert upgrades a flat table in place: bytes moved not rewritten, layout preserved, protocol live") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_conv").toString + "/t"
    // yr as Int: directory-name partition inference types it int, and the
    // committed schema pins exactly what a flat read would have inferred
    val df = (0 until 900).map(i => (i.toLong, i % 3, s"r$i")).toDF("id", "yr", "v")
    df.write.partitionBy("yr").parquet(root) // a plain flat table
    def parquetBytes(dir: java.io.File): Long = {
      val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      kids.map(f => if (f.isDirectory) parquetBytes(f)
                    else if (f.getName.endsWith(".parquet")) f.length() else 0L).sum
    }
    val bytesBefore = parquetBytes(new java.io.File(root))
    VersionedTable.convert(spark, root)
    // zero rows rewritten: the byte total is untouched (files were MOVED)
    assert(parquetBytes(new java.io.File(root)) == bytesBefore)
    assert(VersionedTable.partitionCols(root) == Seq("yr"),
      "the Hive layout must survive the move")
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 900 && got.columns.contains("yr"))
    // the full protocol is live: an append inherits the layout, time
    // travel reaches the converted snapshot, history shows CONVERT
    VersionedTable.append(spark, root,
      (900 until 1000).map(i => (i.toLong, i % 3, s"r$i")).toDF("id", "yr", "v"))
    assert(VersionedTable.read(spark, root).count() == 1000)
    assert(VersionedTable.read(spark, root, Some(0L)).count() == 900)
    val ops = VersionedTable.history(spark, root)
      .orderBy("version").collect().map(_.getAs[String]("operation")).toSeq
    assert(ops == Seq("CONVERT", "APPEND"))
    // converting twice, or converting a versioned table, refuses
    assertThrows[IllegalArgumentException] { VersionedTable.convert(spark, root) }
  }

  test("shallow clone: hard-linked bytes, decoupled lifecycles, txn epochs not carried") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_clone").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    val df = (0 until 500).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    VersionedTable.appendIdempotent(spark, src, df, "w", 7L)
    VersionedTable.clone(spark, src, dst)
    // the clone's v0 references the SAME inodes — zero bytes copied
    VersionedTable.dataFiles(dst).foreach { rel =>
      val srcIno = java.nio.file.Files.getAttribute(
        java.nio.file.Paths.get(src, rel), "unix:ino")
      val dstIno = java.nio.file.Files.getAttribute(
        java.nio.file.Paths.get(dst, rel), "unix:ino")
      assert(srcIno == dstIno, s"$rel must be a hard link, not a copy")
    }
    // the source writer's epochs must NOT be pre-burned in the clone
    assert(VersionedTable.committedEpochs(dst).isEmpty)
    assert(VersionedTable.appendIdempotent(spark, dst, df.limit(10), "w", 7L) >= 0,
      "the clone starts with a clean idempotency slate")
    // diverge, then vacuum the SOURCE hard: the clone's links survive
    VersionedTable.overwrite(spark, src, df.filter(col("id") < 50))
    VersionedTable.vacuum(src, keep = Some(1), minAgeMs = 0L)
    assert(VersionedTable.read(spark, src).count() == 50)
    assert(VersionedTable.read(spark, dst, Some(0L)).count() == 500,
      "the source's vacuum must not reach the clone's linked bytes")
    // and cloning onto an existing table refuses
    assertThrows[IllegalArgumentException] { VersionedTable.clone(spark, src, dst) }
  }

  test("check constraints: committed metadata, SQL null semantics, validated on add, carried by clone") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_chk").toString
    val root = s"$base/t"
    val df = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None)).toDF("id", "x")
    VersionedTable.overwrite(spark, root, df)
    VersionedTable.addCheckConstraint(spark, root, "x_pos", "x > 0")
    assert(VersionedTable.checkConstraints(root) == Map("x_pos" -> "x > 0"))
    // SQL CHECK semantics: NULL is not a violation — the None row passed
    // on add, and a new NULL row appends fine
    VersionedTable.append(spark, root, Seq((4L, None: Option[Long])).toDF("id", "x"))
    // a violating batch is refused WHOLE: nothing committed, no data
    val before = VersionedTable.versions(root)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.append(spark, root,
        Seq((5L, Some(5L)), (6L, Some(-1L))).toDF("id", "x"))
    }
    assert(e.getMessage.contains("x_pos") && e.getMessage.contains("x > 0"))
    assert(VersionedTable.versions(root) == before)
    assert(VersionedTable.read(spark, root).count() == 4)
    // adding a constraint the EXISTING data violates refuses
    assertThrows[IllegalArgumentException] {
      VersionedTable.addCheckConstraint(spark, root, "id_small", "id < 3")
    }
    // duplicate name refuses; drop re-opens the gate
    assertThrows[IllegalArgumentException] {
      VersionedTable.addCheckConstraint(spark, root, "x_pos", "x > 10")
    }
    VersionedTable.dropCheckConstraint(spark, root, "x_pos")
    VersionedTable.append(spark, root, Seq((7L, Some(-5L))).toDF("id", "x"))
    assert(VersionedTable.read(spark, root).count() == 5)
    // a clone carries the constraint metadata (re-add first)
    VersionedTable.deleteWhere(spark, root,
      Seq(graft.sources.SkippingIndex.ColRange("x", -5, -5)))
    VersionedTable.addCheckConstraint(spark, root, "x_pos", "x > 0")
    val dst = s"$base/c"
    VersionedTable.clone(spark, root, dst)
    assert(VersionedTable.checkConstraints(dst) == Map("x_pos" -> "x > 0"))
    assertThrows[IllegalArgumentException] {
      VersionedTable.append(spark, dst, Seq((8L, Some(-2L))).toDF("id", "x"))
    }
    // history names the metadata commits
    val ops = VersionedTable.history(spark, root)
      .orderBy("version").collect().map(_.getAs[String]("operation")).toSeq
    assert(ops.count(_ == "ADD CONSTRAINT") == 2 && ops.contains("DROP CONSTRAINT"))
  }

  test("generated columns: omitted columns derive at the table, partition layout included; wrong values refuse") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_gen").toString + "/t"
    // a fact partitioned by its GENERATED year: writers only ship (id, day)
    val df = (0 until 300).map(i => (i.toLong, (2020 + i % 3).toLong)).toDF("id", "yr")
    VersionedTable.overwrite(spark, root, df, partitionBy = Seq("yr"))
    VersionedTable.addGeneratedColumn(spark, root, "yr", "2020 + id % 3")
    // an append WITHOUT yr derives it and lands in the right directories
    VersionedTable.append(spark, root,
      (300 until 400).map(i => i.toLong).toDF("id"))
    val got = VersionedTable.read(spark, root)
    assert(got.count() == 400)
    assert(got.filter(col("yr") =!= lit(2020L) + col("id") % 3).isEmpty,
      "derived values must satisfy the expression")
    assert(VersionedTable.partitionCols(root) == Seq("yr"))
    assert(VersionedTable.dataFiles(root).forall(_.startsWith("data/yr=")),
      "derived partition values must produce Hive directories")
    // declaring over disagreeing data refuses; wrong carried values refuse
    assertThrows[IllegalArgumentException] {
      VersionedTable.addGeneratedColumn(spark, root, "id", "yr * 2")
    }
    val before = VersionedTable.versions(root)
    assertThrows[IllegalArgumentException] {
      VersionedTable.append(spark, root,
        Seq((400L, 1999L)).toDF("id", "yr"))
    }
    assert(VersionedTable.versions(root) == before, "refused whole: no commit")
    // a CORRECT carried value passes validation; drop re-opens free values
    VersionedTable.append(spark, root, Seq((400L, 2021L)).toDF("id", "yr"))
    VersionedTable.dropGeneratedColumn(spark, root, "yr")
    VersionedTable.append(spark, root, Seq((500L, 1999L)).toDF("id", "yr"))
    assert(VersionedTable.read(spark, root).count() == 402)
    // the metadata carries into a clone
    VersionedTable.addGeneratedColumn(spark, root, "id", "id") // trivial, re-add shape
    val dst = root + "_clone"
    VersionedTable.clone(spark, root, dst)
    assert(VersionedTable.generatedColumns(dst).contains("id"))
  }

  test("files/partitions metadata tables and vacuum dry run report without touching anything") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_meta").toString + "/t"
    val df = (0 until 300).map(i => (i.toLong, (i % 3).toLong)).toDF("id", "yr")
    VersionedTable.overwrite(spark, root, df, partitionBy = Seq("yr"))
    VersionedTable.overwrite(spark, root, df.filter(col("id") < 100),
      partitionBy = Seq("yr"))
    val files = VersionedTable.filesMeta(spark, root).collect()
    assert(files.length == VersionedTable.dataFiles(root).size)
    assert(files.forall(_.getAs[Long]("n_bytes") > 0))
    assert(files.forall(r =>
      r.getAs[Map[String, String]]("partition").keySet == Set("yr")))
    val parts = VersionedTable.partitionsMeta(spark, root).collect()
    assert(parts.map(_.getAs[Map[String, String]]("partition")("yr")).toSet ==
      Set("0", "1", "2"))
    assert(parts.map(_.getAs[Long]("n_files")).sum == files.length.toLong)
    // v0's metadata still serves (time-traveled files table)
    assert(VersionedTable.filesMeta(spark, root, Some(0L)).count() > 0)
    // dry run reports what an age-0 keep-1 vacuum WOULD do — and does it
    val (wouldRetire, wouldDelete) =
      VersionedTable.vacuumDryRun(root, keep = Some(1), minAgeMs = 0L)
    assert(wouldRetire == Seq(0L) && wouldDelete.nonEmpty)
    // ...without doing any of it
    assert(VersionedTable.versions(root) == Seq(0L, 1L))
    assert(wouldDelete.forall(f => new java.io.File(s"$root/$f").exists()))
    // the real vacuum then deletes exactly the reported set
    val gone = VersionedTable.vacuum(root, keep = Some(1), minAgeMs = 0L)
    assert(gone.toSet == wouldDelete.toSet)
    // and under the DEFAULT retention the dry run reports zero deletions
    val (_, spared) = VersionedTable.vacuumDryRun(root)
    assert(spared.isEmpty)
  }

  test("commit lists stamp per-file stats: metadata ops are stat-free, legacy bare lists upgrade on carry") {
    import spark.implicits._
    import graft.sources.VersionedTable
    import java.nio.file.{Files, Paths}
    val root = java.nio.file.Files.createTempDirectory("graft_annot").toString
    VersionedTable.overwrite(spark, root,
      (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(4))
    // (a) the commit list carries `\t<bytes>\t<mtimeMs>` on every data line
    val raw0 = new String(Files.readAllBytes(
      Paths.get(root, "_commits", "v0.list")), "UTF-8").split("\n").toSeq
    val dataLines = raw0.filterNot(_.startsWith("#"))
    assert(dataLines.nonEmpty && dataLines.forall(_.split('\t').length >= 3),
      s"every data line must be annotated, got:\n${dataLines.mkString("\n")}")
    dataLines.foreach { l =>
      val p = l.split('\t')
      assert(p(1).toLong == Files.size(Paths.get(root, p(0))),
        s"stamped bytes must match the file: $l")
    }
    val wantBytes = dataLines.map(_.split('\t')(1).toLong).sum
    // (b) history/filesMeta serve from the annotations — prove it by
    // hiding the data directory: the numbers must still be right
    Files.move(Paths.get(root, "data"), Paths.get(root, "data_hidden"))
    try {
      val h = VersionedTable.history(spark, root)
        .select("version", "n_bytes", "n_files").collect()
      assert(h.length == 1 && h(0).getLong(1) == wantBytes && h(0).getInt(2) == dataLines.size,
        "history must read sizes from the commit list, not the filesystem")
      val fm = VersionedTable.filesMeta(spark, root)
        .agg(org.apache.spark.sql.functions.sum("n_bytes")).collect()(0).getLong(0)
      assert(fm == wantBytes, "filesMeta must read sizes from the commit list")
    } finally Files.move(Paths.get(root, "data_hidden"), Paths.get(root, "data"))
    // (c) LEGACY compatibility: strip v0's annotations in place — reads,
    // history (stat fallback) and DML all still work on bare lines
    Files.write(Paths.get(root, "_commits", "v0.list"),
      raw0.map(_.split('\t')(0)).mkString("\n").getBytes("UTF-8"))
    assert(VersionedTable.read(spark, root).count() == 1000)
    assert(VersionedTable.history(spark, root).select("n_bytes")
      .collect()(0).getLong(0) == wantBytes, "legacy bare lines fall back to one stat each")
    // (d) the first commit that carries the legacy lines forward UPGRADES
    // them: the new head SNAPSHOT is fully annotated again (v1 is a
    // delta list — the upgraded lines ride it as changed-line adds)
    VersionedTable.append(spark, root, Seq((5000L, "x")).toDF("id", "v"))
    val data1 = VersionedTable.snapshotLines(root, 1L).filterNot(_.startsWith("#"))
    assert(data1.size == dataLines.size + 1 && data1.forall(_.split('\t').length >= 3),
      "carried legacy lines must upgrade to annotated form on the next commit")
    // (e) steady state: a further commit reuses the previous snapshot's
    // annotations verbatim for carried files (no re-stat drift) — and
    // its DELTA list now prices the CHANGE, not the table: the carried
    // lines do not re-appear in the raw v2 file
    VersionedTable.append(spark, root, Seq((5001L, "y")).toDF("id", "v"))
    val raw2 = VersionedTable.snapshotLines(root, 2L)
      .filterNot(_.startsWith("#")).toSet
    assert(data1.toSet.subsetOf(raw2), "carried annotations must be stable across commits")
    val rawFile2 = new String(Files.readAllBytes(
      Paths.get(root, "_commits", "v2.list")), "UTF-8").split("\n").toSeq
    assert(rawFile2.head.startsWith("#delta:1"), "v2 should be delta-encoded")
    assert(rawFile2.filterNot(_.startsWith("#")).size == 1,
      "a 1-file append's delta must carry exactly its one new line")
    // (f) bounded maintenance reads sizes from the list too
    val (_, rw, _) = VersionedTable.compactSmall(spark, root, minBytes = 1024L * 1024)
    assert(rw >= 1, "the small-file trail must compact")
    assert(VersionedTable.read(spark, root).count() == 1002)
  }

  test("warehouse constraints guard the medallion write paths: a violating merge batch never lands") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val root = java.nio.file.Files.createTempDirectory("graft_whchk").toString
    val wh = Warehouse(spark, root)
    def batch(lo: Int, hi: Int, q: Long) =
      (lo until hi).map(i => (i.toLong, q, s"r$i")).toDF("id", "qty", "v")
    wh.write("gold_t", batch(0, 100, 5L))
    wh.addCheckConstraint("gold_t", "qty_pos", "qty > 0")
    // the versioned MERGE path (union+window → overwrite commit) enforces
    val e = intercept[IllegalArgumentException] {
      wh.mergeUpsert("gold_t", batch(50, 120, -1L), Seq("id"),
        Seq(col("v").desc))
    }
    assert(e.getMessage.contains("qty_pos"))
    assert(wh.read("gold_t").count() == 100, "nothing landed")
    // a clean merge passes and the constraint still stands after it
    wh.mergeUpsert("gold_t", batch(50, 120, 7L), Seq("id"), Seq(col("v").desc))
    assert(wh.read("gold_t").count() == 120)
    assert(wh.checkConstraintsOf("gold_t") == Map("qty_pos" -> "qty > 0"))
    // appends enforce too
    assertThrows[IllegalArgumentException] {
      wh.write("gold_t", batch(200, 210, 0L), SaveMode.Append)
    }
    wh.dropCheckConstraint("gold_t", "qty_pos")
    wh.write("gold_t", batch(200, 210, 0L), SaveMode.Append)
    assert(wh.read("gold_t").count() == 130)
  }

  test("concurrent protocol soak: appenders, optimizer, deleter, updater, merger, vacuum, readers — every row exactly once") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    import java.util.concurrent.atomic.AtomicBoolean
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val root = java.nio.file.Files.createTempDirectory("graft_csoak").toString + "/t"
    def df(lo: Long, hi: Long) = (lo until hi).map(i => (i, s"r$i")).toDF("id", "v")
    VersionedTable.overwrite(spark, root, df(0, 100))
    val appendersDone = new AtomicBoolean(false)
    // 3 appenders × 8 disjoint batches: content-preserving maintenance
    // must deliver EVERY appended row exactly once, whatever interleaves
    val appenders = (0 until 3).map { t =>
      Future {
        (0 until 8).foreach { b =>
          val lo = 1000L * (t * 8 + b + 1)
          VersionedTable.append(spark, root, df(lo, lo + 100))
        }
      }
    }
    // rewrite-shaped maintenance racing the appends and each other:
    // OPTIMIZE (content-preserving rewrite), a no-match bounded DELETE
    // (its box [900, 950] hits no appended range — conflict path only),
    // and a retention-window vacuum
    val optimizer = Future {
      while (!appendersDone.get()) {
        VersionedTable.optimize(spark, root, Seq("id"), numFiles = 4); ()
      }
    }
    val deleter = Future {
      while (!appendersDone.get()) {
        VersionedTable.deleteWhere(spark, root,
          Seq(SkippingIndex.ColRange("id", 900, 950))); ()
      }
    }
    val vacuumer = Future {
      while (!appendersDone.get()) { VersionedTable.vacuum(root); () }
    }
    // round-11 DML racing everything: a bounded UPDATE over the base
    // range (content-count-preserving) and a MERGE that upserts a fixed
    // key block — its first pass INSERTS [500, 520), every later pass
    // matches and updates, so exactly-once conservation must still hold
    val updater = Future {
      while (!appendersDone.get()) {
        VersionedTable.updateWhere(spark, root, col("id") < 100L,
          Map("v" -> org.apache.spark.sql.functions.lit("u")),
          Seq(SkippingIndex.ColRange("id", 0, 99))); ()
      }
    }
    val mergeSrc = (500L until 520L).map(i => (i, s"m$i")).toDF("id", "v")
    val merger = Future {
      var ran = false
      while (!ran || !appendersDone.get()) {
        VersionedTable.mergeInto(spark, root, mergeSrc, Seq("id"),
          updateWhen = Some(org.apache.spark.sql.functions.lit(true)),
          insertWhen = Some(org.apache.spark.sql.functions.lit(true)))
        ran = true
      }
    }
    // readers race everything: the head and random pinned versions must
    // always serve (the only acceptable refusal is the clean "retired")
    val rnd = new scala.util.Random(7)
    val reader = Future {
      var reads = 0L
      while (!appendersDone.get()) {
        val vs = VersionedTable.versions(root)
        val v = vs(rnd.nextInt(vs.size))
        try { VersionedTable.read(spark, root, Some(v)).count(); reads += 1 }
        catch {
          case e: IllegalStateException
            if e.getMessage.contains("retired") => () // clean refusal
        }
      }
      reads
    }
    Await.result(Future.sequence(appenders), 300.seconds)
    appendersDone.set(true)
    Await.result(Future.sequence(Seq(optimizer, deleter, vacuumer, updater, merger)),
      300.seconds)
    val reads = Await.result(reader, 300.seconds)
    assert(reads > 0, "the racing reader must have completed reads")
    // exactly-once conservation: base + every appended batch + the
    // merged key block, nothing duplicated by a retry, nothing
    // resurrected or lost by a rewrite
    val expected = (0L until 100L) ++ (500L until 520L) ++
      (for (t <- 0 until 3; b <- 0 until 8; lo = 1000L * (t * 8 + b + 1);
            i <- lo until lo + 100) yield i)
    val got = VersionedTable.read(spark, root).select("id").collect().map(_.getLong(0))
    assert(got.length == expected.length, s"${got.length} vs ${expected.length} rows")
    assert(got.toSet == expected.toSet)
    // and the history renders every surviving commit's operation
    assert(VersionedTable.history(spark, root).collect()
      .forall(r => r.getAs[String]("operation") != null || r.getAs[Boolean]("retired")))
  }

  test("versioned append inherits the committed partition layout; a mismatched layout is refused") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val root = java.nio.file.Files.createTempDirectory("graft_apl").toString
    val wh = Warehouse(spark, root)
    def df(lo: Int, hi: Int) = (lo until hi).map(i => (i.toLong, (i % 3).toLong, s"r$i"))
      .toDF("id", "yr", "v")
    wh.write("t", df(0, 90), partitionBy = Seq("yr"))
    // append with partitionBy = Nil: inherits yr, no mixed directory depths
    wh.write("t", df(90, 120), SaveMode.Append)
    assert(wh.partitionColsOf("t") == Seq("yr"))
    val got = wh.read("t")
    assert(got.count() == 120 && got.columns.contains("yr"))
    assert(got.select("id").distinct().count() == 120)
    // a DIFFERENT layout on append is refused loudly, not silently mixed
    val e = intercept[IllegalArgumentException] {
      wh.write("t", df(120, 130), SaveMode.Append, partitionBy = Seq("v"))
    }
    assert(e.getMessage.contains("does not match the committed layout"))
  }
}
