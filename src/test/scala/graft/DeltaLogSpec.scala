package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable
import java.nio.file.{Files, Paths}

/** Delta-encoded commit log + checkpoints (VERDICT r12 #1): a commit
  * writes O(change) metadata — add/changed lines, `#rm:` removes, the
  * small header set, a `#snap` summary — instead of rewriting the full
  * annotated file list; every [[VersionedTable.CheckpointEvery]]-th
  * version is a full-list checkpoint bounding replay chains. Reference
  * shape: Delta Lake's `_delta_log` JSON actions + periodic parquet
  * checkpoint (the store the reference's notebooks commit to,
  * /root/reference Bfull:cell 27 `format("delta")`). */
class DeltaLogSpec extends SparkSpecBase {
  import spark.implicits._

  private def rawList(root: String, v: Long): Seq[String] =
    new String(Files.readAllBytes(Paths.get(root, "_commits", s"v$v.list")),
      "UTF-8").split("\n").toSeq.filter(_.nonEmpty)

  private def fresh(tag: String): String = {
    val p = Files.createTempDirectory(s"graft_dlog_$tag")
    p.toFile.delete(); p.toString
  }

  test("a commit writes O(change) metadata: deltas stay small while the table grows; checkpoints bound the chain") {
    val root = fresh("ochange")
    // v0: 64 files — the full checkpoint pays O(table) once
    VersionedTable.overwrite(spark, root,
      (0 until 6400).map(i => (i.toLong, s"v$i", i % 13)).toDF("id", "v", "grp")
        .repartition(64))
    val v0Bytes = Files.size(Paths.get(root, "_commits", "v0.list"))
    // v1..v15: one-file appends
    (1 to 15).foreach { i =>
      VersionedTable.append(spark, root,
        Seq((100000L + i, s"x$i", i)).toDF("id", "v", "grp"))
    }
    // encoding: EVERY v > 0 commit is a delta (r13 #1 — the checkpoint
    // role moved to parquet); the cadence version carries a complete
    // multi-part parquet checkpoint + a validated _last_checkpoint
    (1 to 15).foreach { v =>
      val head = rawList(root, v).head
      assert(head.startsWith(s"#delta:${v - 1}"), s"v$v must be a delta: $head")
    }
    val ckptFiles = Files.list(Paths.get(root, "_commits")).toArray.toSeq
      .map(_.toString).filter(n => n.contains(".ckpt.") && n.endsWith(".parquet"))
    assert(ckptFiles.nonEmpty && ckptFiles.forall(_.contains("v10.ckpt.")),
      s"the cadence version must carry the parquet checkpoint: $ckptFiles")
    assert(VersionedTable.lastCheckpoint(root).map(_._1).contains(10L))
    // the PRICE: a one-file append's delta is tiny and FLAT as the
    // table grows — each carries exactly 1 data line; the old format
    // re-wrote all 64+ lines (v0Bytes) every commit
    val deltaSizes = (1 to 15)
      .map(v => Files.size(Paths.get(root, "_commits", s"v$v.list")))
    assert(deltaSizes.forall(_ < v0Bytes / 10),
      s"delta commits must price the change, not the table: $deltaSizes vs full $v0Bytes")
    (1 to 15).foreach { v =>
      assert(rawList(root, v).count(l => !l.startsWith("#")) == 1,
        s"a 1-file append's delta must carry 1 data line at v$v")
    }
    // resolution correctness: every version reads the right snapshot
    assert(VersionedTable.read(spark, root).count() == 6400 + 15)
    assert(VersionedTable.read(spark, root, Some(0L)).count() == 6400)
    assert(VersionedTable.read(spark, root, Some(7L)).count() == 6400 + 7)
    assert(VersionedTable.read(spark, root, Some(10L)).count() == 6400 + 10)
    // carried annotations survive replay verbatim: the whole resolved
    // head is annotated, so list-served stats/prunes keep working
    val head15 = VersionedTable.snapshotLines(root, 15L).filterNot(_.startsWith("#"))
    assert(head15.size == 64 + 15 && head15.forall(_.contains("\trows=")),
      "resolved snapshot must keep every line's write-time stats")
    // ... and the stats actually SERVE: zero-task count on the head
    assert(VersionedTable.statsRowCount(root).contains(6400L + 15))
  }

  test("removes ride the delta: DELETE/OPTIMIZE snapshots replay exactly; history serves from #snap with the data hidden") {
    val root = fresh("rm")
    VersionedTable.overwrite(spark, root,
      (0 until 4000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"))
    // v1: bounded delete rewrites 1 file (1 add + 1 rm in the delta).
    // The doomed range sits MID-BUCKET deliberately: range-partition
    // boundaries are sampled (seed = the JVM-global RDD id counter), so
    // a range starting at an ideal boundary multiple (500 = 4000/8)
    // straddles two files depending on how many RDDs earlier suites
    // created — observed as an order-sensitive flake in the full run.
    val (_, rw, _) = VersionedTable.deleteWherePredicate(spark, root,
      col("id").between(600L, 619L))
    assert(rw == 1)
    val v1 = rawList(root, 1L)
    assert(v1.head.startsWith("#delta:0"))
    assert(v1.count(_.startsWith("#rm:")) == 1, s"one replaced file: $v1")
    assert(v1.count(l => !l.startsWith("#")) == 1)
    assert(VersionedTable.read(spark, root).count() == 3980)
    // v2: optimize rewrites everything — the delta prices that change
    VersionedTable.optimize(spark, root, Seq("id"), numFiles = 2)
    assert(VersionedTable.read(spark, root).count() == 3980)
    assert(VersionedTable.read(spark, root, Some(1L)).count() == 3980)
    assert(VersionedTable.read(spark, root, Some(0L)).count() == 4000)
    // history: one read per version, n_files/n_bytes for delta commits
    // come from their #snap summary — prove it with the data dir hidden
    val wantBytes = VersionedTable.snapshotLines(root, 2L)
      .filterNot(_.startsWith("#")).map(_.split('\t')(1).toLong).sum
    Files.move(Paths.get(root, "data"), Paths.get(root, "data_hidden"))
    try {
      val h = VersionedTable.history(spark, root)
        .select("version", "n_files", "n_bytes").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
      assert(h(1)._2 == 8, s"v1 snapshot holds 8 files, got ${h(1)}")
      assert(h(2)._2 <= 2 && h(2)._3 == wantBytes,
        s"v2 history must serve size from #snap: ${h(2)} want $wantBytes")
    } finally Files.move(Paths.get(root, "data_hidden"), Paths.get(root, "data"))
  }

  test("vacuum checkpoints the oldest kept version before retiring: no readable chain crosses the floor") {
    val root = fresh("vac")
    (0 until 15).foreach { i =>
      if (i == 0) VersionedTable.overwrite(spark, root,
        Seq((i.toLong, s"v$i")).toDF("id", "v"))
      else VersionedTable.overwrite(spark, root, Seq((i.toLong, s"v$i")).toDF("id", "v"))
    }
    // v12..v14 kept; v12 is a delta (12 % 10 != 0) whose chain passed
    // through v10 — vacuum must materialize it before tombstoning
    VersionedTable.vacuum(root, keep = Some(3), minAgeMs = 0L)
    assert(VersionedTable.versions(root) == Seq(12L, 13L, 14L))
    assert(!rawList(root, 12L).head.startsWith("#delta:"),
      "the oldest kept version must have been re-encoded as a full checkpoint")
    assert(rawList(root, 13L).head.startsWith("#delta:12"))
    // all kept versions resolve and read correctly after retirement
    assert(VersionedTable.read(spark, root, Some(12L)).as[(Long, String)]
      .collect().toSeq == Seq((12L, "v12")))
    assert(VersionedTable.read(spark, root, Some(14L)).as[(Long, String)]
      .collect().toSeq == Seq((14L, "v14")))
    // retired versions still fail fast as retired
    val e = intercept[IllegalStateException] {
      VersionedTable.read(spark, root, Some(5L))
    }
    assert(e.getMessage.contains("retired"))
  }

  test("parquet checkpoint round-trips byte-exactly; cold resolve serves from it; a torn part set falls back to replay") {
    val root = fresh("ckpt")
    VersionedTable.overwrite(spark, root,
      (0 until 2000).map(i => (i.toLong, s"v$i", i % 5)).toDF("id", "v", "grp")
        .repartition(6))
    (1 to 12).foreach { i =>
      VersionedTable.append(spark, root,
        Seq((50000L + i, s"x$i", i)).toDF("id", "v", "grp"))
    }
    // cold resolve of v10 must equal the pure delta replay, line for line
    val viaCkpt = {
      VersionedTable.clearSnapshotCache()
      VersionedTable.snapshotLines(root, 10L)
    }
    val ckpts = Files.list(Paths.get(root, "_commits")).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.getFileName.toString.startsWith("v10.ckpt."))
    assert(ckpts.nonEmpty, "v10 must carry a parquet checkpoint")
    val stash = Files.createTempDirectory("graft_ckpt_stash")
    ckpts.foreach(p => Files.move(p, stash.resolve(p.getFileName.toString)))
    val viaReplay = {
      VersionedTable.clearSnapshotCache()
      VersionedTable.snapshotLines(root, 10L)
    }
    assert(viaCkpt == viaReplay,
      "checkpoint resolution must be byte-identical to delta replay")
    // an INCOMPLETE part set must be ignored (crash-mid-write recovery):
    // restore only part 0 of the (possibly 1-part) set with a lying name
    Files.copy(stash.resolve(ckpts.head.getFileName.toString),
      Paths.get(root, "_commits", "v10.ckpt.0-of-2.parquet"))
    VersionedTable.clearSnapshotCache()
    assert(VersionedTable.snapshotLines(root, 10L) == viaReplay,
      "a torn checkpoint must fall back to replay, not serve half a table")
    Files.delete(Paths.get(root, "_commits", "v10.ckpt.0-of-2.parquet"))
    // the full pipeline through the checkpoint: reads, stats, history
    ckpts.foreach(p => Files.move(stash.resolve(p.getFileName.toString), p))
    VersionedTable.clearSnapshotCache()
    assert(VersionedTable.read(spark, root, Some(10L)).count() == 2010)
    assert(VersionedTable.statsRowCount(root).contains(2012L))
    // vacuum deletes a retired version's checkpoint parts with it
    VersionedTable.vacuum(root, keep = Some(2), minAgeMs = 0L)
    assert(!Files.list(Paths.get(root, "_commits")).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .exists(_.startsWith("v10.ckpt.")),
      "retired versions must not leave checkpoint parts behind")
    assert(VersionedTable.read(spark, root).count() == 2012)
  }

  test("multi-part checkpoints: parts split at the row bound, read back in order, and a missing part falls back whole") {
    val root = fresh("mpart")
    val saved = VersionedTable.CheckpointPartRows
    VersionedTable.CheckpointPartRows = 16 // test seam: force several parts
    try {
      VersionedTable.overwrite(spark, root,
        (0 until 4000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
          .repartition(40))
      (1 to 10).foreach { i =>
        VersionedTable.append(spark, root,
          Seq((90000L + i, s"x$i")).toDF("id", "v"))
      }
      // 40 + 10 data lines + headers at v10 -> ceil(n/16) >= 4 parts
      val parts = Files.list(Paths.get(root, "_commits")).toArray.toSeq
        .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
        .filter(n => n.startsWith("v10.ckpt.") && n.endsWith(".parquet"))
      assert(parts.size >= 3, s"want a real multi-part set, got $parts")
      assert(parts.forall(_.contains(s"-of-${parts.size}")), s"got $parts")
      assert(VersionedTable.lastCheckpoint(root).contains((10L, parts.size)))
      // resolution through the parts equals the pure replay, line-exact
      VersionedTable.clearSnapshotCache()
      val viaParts = VersionedTable.snapshotLines(root, 10L)
      val one = Paths.get(root, "_commits", parts.sorted.head)
      val stash = Files.createTempDirectory("graft_mpart_stash").resolve("p")
      Files.move(one, stash)
      VersionedTable.clearSnapshotCache()
      val viaReplay = VersionedTable.snapshotLines(root, 10L)
      assert(viaParts == viaReplay,
        "multi-part resolution must equal delta replay line-for-line")
      // ... and with a part missing the INCOMPLETE set never serves
      assert(VersionedTable.lastCheckpoint(root).isEmpty,
        "the pointer must not validate against a torn part set")
      Files.move(stash, one)
      VersionedTable.clearSnapshotCache()
      assert(VersionedTable.read(spark, root, Some(10L)).count() == 4010)
    } finally VersionedTable.CheckpointPartRows = saved
  }

  test("PROPERTY: checkpoint resolution equals pure delta replay across a random op sequence") {
    import graft.sources.SkippingIndex
    val rnd = new scala.util.Random(14L)
    val root = fresh("ckprop")
    VersionedTable.overwrite(spark, root,
      (0 until 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"))
    var nextId = 1000L
    (1 to 14).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 =>
          val n = 1 + rnd.nextInt(20)
          VersionedTable.append(spark, root,
            (0 until n).map(i => (nextId + i, s"a${nextId + i}")).toDF("id", "v"))
          nextId += n
        case 1 =>
          val lo = rnd.nextInt(400).toLong
          VersionedTable.deleteWhere(spark, root,
            Seq(SkippingIndex.ColRange("id", lo.toDouble, (lo + 30).toDouble)))
          ()
        case 2 =>
          VersionedTable.optimize(spark, root, Seq("id"), numFiles = 3)
          ()
        case 3 =>
          val vs = VersionedTable.versions(root)
          VersionedTable.restore(spark, root, vs(rnd.nextInt(vs.size)))
          ()
      }
    }
    val vs = VersionedTable.versions(root)
    assert(vs.last >= 10L, "the sequence must cross the checkpoint cadence")
    val cdir = Paths.get(root, "_commits")
    def parts() = Files.list(cdir).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.matches("v\\d+\\.ckpt\\..*\\.parquet"))
    assert(parts().nonEmpty, "at least one parquet checkpoint must exist")
    // resolve EVERY version cold, checkpoints present
    val withCkpt = vs.map { v =>
      VersionedTable.clearSnapshotCache()
      v -> VersionedTable.snapshotLines(root, v)
    }.toMap
    // stash every checkpoint part and resolve again: PURE delta replay
    val stash = Files.createTempDirectory("graft_ckprop_stash")
    val stashed = parts().map { p =>
      val to = stash.resolve(p.getFileName.toString); Files.move(p, to); (to, p)
    }
    val pure = vs.map { v =>
      VersionedTable.clearSnapshotCache()
      v -> VersionedTable.snapshotLines(root, v)
    }.toMap
    assert(withCkpt == pure,
      "checkpointed and pure-replay resolution must agree on EVERY version, line for line")
    stashed.foreach { case (from, to) => Files.move(from, to) }
    VersionedTable.clearSnapshotCache()
    // ... and content sanity on top of the line equality: the head's
    // stats-served count (from the checkpoint-resolved annotations)
    // equals the actual scan
    val statCount = VersionedTable.statsRowCount(root)
    assert(statCount.isDefined, "an all-annotated snapshot must serve counts")
    assert(statCount.contains(VersionedTable.read(spark, root).count()))
  }

  test("racing idempotent writers cross the checkpoint cadence: no loss, no duplication, no torn checkpoint") {
    import spark.implicits._
    val root = fresh("race")
    VersionedTable.overwrite(spark, root, Seq((-1L, "seed")).toDF("id", "v"))
    val writers = 4; val epochs = 10
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val fs = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit =
            (0 until epochs).foreach { e =>
              VersionedTable.appendIdempotent(spark, root,
                Seq((w * 1000L + e, s"w$w-e$e")).toDF("id", "v"), s"w$w", e)
              ()
            }
        })
      }
      fs.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // the CAS protocol serialized every commit: contiguous versions,
    // one per delivery, every row exactly once
    val vs = VersionedTable.versions(root)
    assert(vs == (0L to (writers * epochs)), s"got $vs")
    val rows = VersionedTable.read(spark, root).as[(Long, String)].collect()
    assert(rows.length == writers * epochs + 1)
    assert(rows.map(_._1).distinct.length == rows.length, "no duplicates")
    assert(VersionedTable.committedEpochs(root) ==
      (0 until writers).map(w => s"w$w" -> (epochs - 1).toLong).toMap)
    // every cadence version carries a COMPLETE checkpoint written by
    // its CAS winner alone, and the pointer validates against the parts
    Seq(10L, 20L, 30L, 40L).foreach { cv =>
      VersionedTable.clearSnapshotCache()
      assert(VersionedTable.snapshotLines(root, cv)
        .count(l => !l.startsWith("#")) == cv + 1, // seed + cv appends
        s"v$cv must resolve to exactly ${cv + 1} data files")
    }
    assert(VersionedTable.lastCheckpoint(root).exists(_._1 == 40L))
    // replays agree with the checkpoints under the race too
    val cdir = Paths.get(root, "_commits")
    val parts = Files.list(cdir).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.contains(".ckpt."))
    val stash = Files.createTempDirectory("graft_race_stash")
    val stashed = parts.map { p =>
      val to = stash.resolve(p.getFileName.toString); Files.move(p, to); (to, p)
    }
    VersionedTable.clearSnapshotCache()
    assert(VersionedTable.read(spark, root).count() == (writers * epochs + 1).toLong)
    stashed.foreach { case (from, to) => Files.move(from, to) }
  }

  test("checkpoint round-trip is byte-exact for hostile annotation shapes: trailing tabs, empty fields, unparsable annotations") {
    val root = fresh("tabs")
    VersionedTable.overwrite(spark, root,
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(2))
    // a legacy/foreign writer's lines the format must carry VERBATIM:
    // trailing tab after the stats slot, empty bytes field, extra empty
    // annotation — `split('\t')` drops trailing empties, so the
    // pre-ADVICE-r14 encode reconstructed "path\t1\t2\t" as "path\t1\t2"
    val hostile = Seq(
      "data/fake-a.parquet\t1\t2\t",
      "data/fake-b.parquet\t\t",
      "data/fake-c.parquet\t7\t8\trows=3\t",
      "data/fake-d.parquet\tnotanumber\tx")
    val v0 = rawList(root, 0L)
    Files.write(Paths.get(root, "_commits", "v0.list"),
      (v0 ++ hostile).mkString("\n").getBytes("UTF-8"))
    VersionedTable.clearSnapshotCache()
    // cross the checkpoint cadence so v10's parquet checkpoint holds the
    // hostile carried lines
    (1 to 10).foreach { i =>
      VersionedTable.append(spark, root, Seq((900L + i, s"x$i")).toDF("id", "v"))
    }
    VersionedTable.clearSnapshotCache()
    val viaCkpt = VersionedTable.snapshotLines(root, 10L)
    val parts = Files.list(Paths.get(root, "_commits")).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.startsWith("v10.ckpt."))
    assert(parts.nonEmpty, "v10 must carry a parquet checkpoint")
    val stash = Files.createTempDirectory("graft_tabs_stash")
    val stashed = parts.map { p =>
      val to = stash.resolve(p.getFileName.toString); Files.move(p, to); (to, p)
    }
    VersionedTable.clearSnapshotCache()
    val viaReplay = VersionedTable.snapshotLines(root, 10L)
    stashed.foreach { case (from, to) => Files.move(from, to) }
    assert(viaCkpt == viaReplay,
      "checkpoint resolution must be byte-exact even for hostile lines")
    // readList trims line-trailing whitespace at ingest (so a trailing
    // tab can never enter a snapshot); what DOES enter must carry
    // verbatim through the checkpoint — including the unparsable
    // annotation that routes through the `r` kind
    hostile.map(_.trim).foreach(h =>
      assert(viaCkpt.contains(h), s"must carry verbatim: $h"))
  }

  test("O(change) append path: warm incremental resolution equals cold replay byte-for-byte across evolution, constraints, txn writers") {
    val root = fresh("fastap")
    VersionedTable.overwrite(spark, root,
      (0 until 200).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(3))
    VersionedTable.addCheckConstraint(spark, root, "pos", "id >= 0")
    (1 to 3).foreach { i =>
      VersionedTable.append(spark, root, Seq((1000L + i, s"a$i")).toDF("id", "v"))
    }
    // schema evolution mid-stream: the fast path re-stamps the evolved header
    VersionedTable.append(spark, root,
      Seq((2000L, "e", 7)).toDF("id", "v", "extra"))
    // two idempotent writers interleave their #txn headers
    VersionedTable.appendIdempotent(spark, root,
      Seq((3000L, "w0", 0)).toDF("id", "v", "extra"), "wA", 0)
    VersionedTable.appendIdempotent(spark, root,
      Seq((3001L, "w1", 1)).toDF("id", "v", "extra"), "wB", 5)
    VersionedTable.appendIdempotent(spark, root,
      Seq((3002L, "w2", 2)).toDF("id", "v", "extra"), "wA", 1)
    val head = VersionedTable.versions(root).last
    val warm = VersionedTable.snapshotLines(root, head)
    VersionedTable.clearSnapshotCache()
    val cold = VersionedTable.snapshotLines(root, head)
    assert(warm == cold,
      "the incrementally-built snapshot must equal the cold replay byte-for-byte")
    // structured content sanity on top of the line equality
    assert(VersionedTable.committedEpochs(root) == Map("wA" -> 1L, "wB" -> 5L))
    assert(VersionedTable.checkConstraints(root) == Map("pos" -> "id >= 0"))
    assert(VersionedTable.schemaOf(root).exists(_.fieldNames.contains("extra")))
    assert(VersionedTable.statsRowCount(root).contains(207L))
    assert(VersionedTable.read(spark, root)
      .filter(col("extra").isNotNull).count() == 4)
    // a redelivery stays a no-op through the fast path
    assert(VersionedTable.appendIdempotent(spark, root,
      Seq((3000L, "dup", 0)).toDF("id", "v", "extra"), "wA", 1) == -1L)
    assert(VersionedTable.read(spark, root).count() == 207)
  }

  test("publish refuses loudly on a linkless mount unless the checked-move fallback is opted in (VERDICT r14 #2)") {
    val root = fresh("logstore")
    VersionedTable.overwrite(spark, root, Seq((1L, "a")).toDF("id", "v"))
    val saved = VersionedTable.logStore
    VersionedTable.logStore = new VersionedTable.LogStore {
      override def publish(dst: java.nio.file.Path,
                           tmp: java.nio.file.Path): Boolean =
        throw new UnsupportedOperationException("no hard links (test mount)")
    }
    try {
      val e = intercept[IllegalStateException] {
        VersionedTable.append(spark, root, Seq((2L, "b")).toDF("id", "v"))
      }
      assert(e.getMessage.contains("allowCheckedMove"), e.getMessage)
      assert(VersionedTable.versions(root) == Seq(0L),
        "a refused publish must leave no commit")
      // explicit opt-in: the checked move lands the commit (loudly)
      System.setProperty("graft.logstore.allowCheckedMove", "true")
      try {
        VersionedTable.append(spark, root, Seq((3L, "c")).toDF("id", "v"))
        assert(VersionedTable.versions(root) == Seq(0L, 1L))
        assert(VersionedTable.read(spark, root).count() == 2)
      } finally System.clearProperty("graft.logstore.allowCheckedMove")
    } finally VersionedTable.logStore = saved
  }

  test("O(1) floor resolution: the earliest-version hint tracks vacuum, a reused-version recreate, and the readable stat") {
    val root = fresh("floorhint")
    assert(VersionedTable.earliestVersion(root).isEmpty)
    (0 until 12).foreach { i =>
      if (i == 0) VersionedTable.overwrite(spark, root,
        Seq((i.toLong, s"v$i")).toDF("id", "v"))
      else VersionedTable.append(spark, root, Seq((i.toLong, s"v$i")).toDF("id", "v"))
      assert(VersionedTable.earliestVersion(root).contains(0L))
    }
    assert(VersionedTable.isReadableVersion(root, 0L))
    assert(!VersionedTable.isReadableVersion(root, 12L))
    // vacuum retires the prefix: the WARM hint must fail its first stat
    // (v0.list became v0.retired) and re-list to the new floor
    VersionedTable.vacuum(root, keep = Some(3), minAgeMs = 0L)
    assert(VersionedTable.earliestVersion(root).contains(9L))
    assert(!VersionedTable.isReadableVersion(root, 8L))
    assert(VersionedTable.isReadableVersion(root, 9L))
    // drop + recreate with MORE commits than the cached floor: the
    // hinted version exists again, but its PREDECESSOR also exists —
    // the two-stat validation must reject the hint and re-list to 0
    def rm(p: java.nio.file.Path): Unit = {
      val f = p.toFile
      Option(f.listFiles()).foreach(_.foreach(c => rm(c.toPath)))
      f.delete(); ()
    }
    rm(Paths.get(root))
    VersionedTable.overwrite(spark, root, Seq((0L, "fresh")).toDF("id", "v"))
    (1 to 10).foreach(i => VersionedTable.append(spark, root,
      Seq((i.toLong, s"n$i")).toDF("id", "v")))
    assert(VersionedTable.earliestVersion(root).contains(0L),
      "a recreated root reusing version numbers must re-list, not serve the stale floor")
  }

  test("O(1) head resolution: the validated hint tracks commits, catches up from staleness, survives vacuum and a dropped root") {
    val root = fresh("headhint")
    assert(VersionedTable.latestVersion(root).isEmpty)
    (0 until 14).foreach { i =>
      if (i == 0) VersionedTable.overwrite(spark, root,
        Seq((i.toLong, s"v$i")).toDF("id", "v"))
      else VersionedTable.append(spark, root, Seq((i.toLong, s"v$i")).toDF("id", "v"))
      assert(VersionedTable.latestVersion(root).contains(i.toLong))
    }
    // a stale hint (another process committed) probes FORWARD: simulate
    // by publishing v14 out-of-band as a raw full list
    val resolved = VersionedTable.snapshotLines(root, 13L)
    Files.write(Paths.get(root, "_commits", "v14.list"),
      resolved.mkString("\n").getBytes("UTF-8"))
    assert(VersionedTable.latestVersion(root).contains(14L),
      "a foreign commit must be found by the forward probe")
    // vacuum retires a prefix: the head stays resolvable without a hint
    VersionedTable.vacuum(root, keep = Some(3), minAgeMs = 0L)
    assert(VersionedTable.latestVersion(root).contains(14L))
    assert(VersionedTable.versions(root) == Seq(12L, 13L, 14L))
    // DROP + recreate at the same root: never a phantom head
    def rm(p: java.nio.file.Path): Unit = {
      val f = p.toFile
      Option(f.listFiles()).foreach(_.foreach(c => rm(c.toPath)))
      f.delete(); ()
    }
    rm(Paths.get(root))
    assert(VersionedTable.latestVersion(root).isEmpty,
      "a dropped root must re-list, not serve the stale hint")
    VersionedTable.overwrite(spark, root, Seq((99L, "fresh")).toDF("id", "v"))
    assert(VersionedTable.latestVersion(root).contains(0L))
    assert(VersionedTable.read(spark, root).count() == 1)
  }

  test("a recreated root reusing version numbers never serves the old incarnation's cached resolution") {
    val root = fresh("incarn")
    val cdir = Paths.get(root, "_commits")
    Files.createDirectories(cdir)
    def writeLists(tag: String): Unit = {
      Files.write(cdir.resolve("v0.list"),
        s"data/$tag-a.parquet\t1\t2".getBytes("UTF-8"))
      Files.write(cdir.resolve("v1.list"),
        (s"#delta:0\n#snap:2:2\ndata/$tag-b.parquet\t1\t2").getBytes("UTF-8"))
    }
    writeLists("old")
    // prime the cache with the OLD incarnation's v1 resolution
    assert(VersionedTable.snapshotLines(root, 1L)
      .exists(_.contains("old-b.parquet")))
    // a foreign process drops and recreates the table, reusing v0/v1
    Files.delete(cdir.resolve("v0.list")); Files.delete(cdir.resolve("v1.list"))
    writeLists("new")
    // the listHash fingerprint must reject the stale cached snapshot
    val lines = VersionedTable.snapshotLines(root, 1L)
    assert(lines.exists(_.contains("new-b.parquet")) &&
      !lines.exists(_.contains("old-")),
      s"stale incarnation served: $lines")
  }

  test("a conditional-put LogStore drop-in: racing writers through a simulated object-store CAS lose no commits") {
    import spark.implicits._
    val root = fresh("condput")
    VersionedTable.overwrite(spark, root, Seq((-1L, "seed")).toDF("id", "v"))
    val saved = VersionedTable.logStore
    // simulated object-store conditional put (S3 If-None-Match: * /
    // GCS ifGenerationMatch=0): an atomic claim over destination names
    // decides every race — exactly the contract PROTOCOL.md states.
    // The winner stages the bytes and moves them in; only ONE writer
    // ever touches a given dst, so no reader can see a torn list.
    val claimed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    VersionedTable.logStore = new VersionedTable.LogStore {
      override def publish(dst: java.nio.file.Path,
                           tmp: java.nio.file.Path): Boolean =
        if (!claimed.add(dst.toString)) false // 412 Precondition Failed
        else {
          val stage = dst.resolveSibling(dst.getFileName.toString + ".staged")
          Files.copy(tmp, stage) // tmp must survive (publishList owns it)
          Files.move(stage, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          true
        }
    }
    try {
      val writers = 4; val epochs = 8
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      try {
        val fs = (0 until writers).map { w =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit =
              (0 until epochs).foreach { e =>
                VersionedTable.appendIdempotent(spark, root,
                  Seq((w * 1000L + e, s"w$w-e$e")).toDF("id", "v"), s"cw$w", e)
                ()
              }
          })
        }
        fs.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdown()
      // every protocol guarantee derives from the publish contract
      // alone: swap the CAS primitive, nothing else changes
      assert(VersionedTable.versions(root) == (0L to (writers * epochs)))
      val rows = VersionedTable.read(spark, root).as[(Long, String)].collect()
      assert(rows.length == writers * epochs + 1)
      assert(rows.map(_._1).distinct.length == rows.length, "no duplicates")
      assert(VersionedTable.committedEpochs(root) ==
        (0 until writers).map(w => s"cw$w" -> (epochs - 1).toLong).toMap)
    } finally VersionedTable.logStore = saved
  }

  test("a failing parquet checkpoint falls back to a TEXT checkpoint that serves: the replay bound stays unconditional (ADVICE r14)") {
    val root = fresh("txtfb")
    VersionedTable.overwrite(spark, root,
      (0 until 300).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(3))
    VersionedTable.checkpointPartHook =
      () => throw new RuntimeException("injected parquet-layer failure")
    try {
      (1 to 10).foreach { i =>
        VersionedTable.append(spark, root, Seq((500L + i, s"x$i")).toDF("id", "v"))
      }
    } finally VersionedTable.checkpointPartHook = () => ()
    val cdir = Paths.get(root, "_commits")
    assert(!Files.list(cdir).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .exists(n => n.startsWith("v10.ckpt.") && n.endsWith(".parquet")),
      "the injected failure must have stopped every parquet part")
    val txt = cdir.resolve("v10.ckpt.txt")
    assert(Files.exists(txt), "the text fallback checkpoint must have landed")
    // the txt equals what pure replay computes...
    val stash = Files.createTempDirectory("graft_txtfb").resolve("t")
    Files.move(txt, stash)
    VersionedTable.clearSnapshotCache()
    val viaReplay = VersionedTable.snapshotLines(root, 10L)
    Files.move(stash, txt)
    VersionedTable.clearSnapshotCache()
    assert(VersionedTable.snapshotLines(root, 10L) == viaReplay)
    // ...and it actually SERVES: with a mid-chain delta hidden, replay
    // would die — resolution of v10 must ride the text checkpoint
    val v5 = cdir.resolve("v5.list")
    val stash5 = Files.createTempDirectory("graft_txtfb5").resolve("t")
    Files.move(v5, stash5)
    try {
      VersionedTable.clearSnapshotCache()
      assert(VersionedTable.snapshotLines(root, 10L) == viaReplay,
        "the text checkpoint must bound the replay chain")
    } finally Files.move(stash5, v5)
  }

  test("vacuum reclaims torn checkpoint parts, text checkpoints, and stale commit temps (ADVICE r14)") {
    val root = fresh("sweep")
    (0 until 13).foreach { i =>
      if (i == 0) VersionedTable.overwrite(spark, root,
        Seq((i.toLong, s"v$i")).toDF("id", "v"))
      else VersionedTable.append(spark, root, Seq((i.toLong, s"v$i")).toDF("id", "v"))
    }
    val cdir = Paths.get(root, "_commits")
    // plant what crashes leave behind: a TORN part set on a soon-retired
    // version, orphaned dot-prefixed temps of every kind
    Files.write(cdir.resolve("v3.ckpt.0-of-5.parquet"), "junk".getBytes)
    Files.write(cdir.resolve(".v99.deadbeef.tmp"), "junk".getBytes)
    Files.write(cdir.resolve(".v99.ckpt.0-of-2.x.tmp.parquet"), "junk".getBytes)
    Files.write(cdir.resolve("._last_checkpoint.x.tmp"), "junk".getBytes)
    VersionedTable.vacuum(root, keep = Some(2), minAgeMs = 0L)
    val left = Files.list(cdir).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
    assert(!left.contains("v3.ckpt.0-of-5.parquet"),
      s"torn parts of a retired version must be reclaimed: $left")
    assert(!left.exists(n => n.startsWith(".") && n.contains(".tmp")),
      s"stale temps must be swept: $left")
    assert(!left.exists(_.startsWith("v10.ckpt.")),
      s"the retired cadence version's checkpoint must be gone whole: $left")
    // the kept versions still read
    assert(VersionedTable.read(spark, root).count() == 13)
    assert(VersionedTable.versions(root) == Seq(11L, 12L))
  }

  test("legacy all-full-list tables interleave with delta commits: resolution, stats, and time travel agree") {
    val root = fresh("legacy")
    VersionedTable.overwrite(spark, root,
      (0 until 300).map(i => (i.toLong, s"a$i")).toDF("id", "v").repartition(3))
    VersionedTable.append(spark, root, Seq((1000L, "b")).toDF("id", "v"))
    // simulate a legacy table: rewrite the delta v1 as its resolved full
    // list (exactly the pre-r13 format) — readers must not care
    val resolved = VersionedTable.snapshotLines(root, 1L)
    Files.write(Paths.get(root, "_commits", "v1.list"),
      resolved.mkString("\n").getBytes("UTF-8"))
    VersionedTable.append(spark, root, Seq((1001L, "c")).toDF("id", "v"))
    assert(rawList(root, 2L).head.startsWith("#delta:1"),
      "a delta may stack on a legacy full list")
    assert(VersionedTable.read(spark, root).count() == 302)
    assert(VersionedTable.read(spark, root, Some(1L)).count() == 301)
    assert(VersionedTable.statsRowCount(root).contains(302L))
    // schema/constraint headers replay from the delta's own header set
    assert(VersionedTable.schemaOf(root).isDefined)
  }
}
