package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.SkippingIndex
import graft.sources.SkippingIndex.ColRange

/** Z-order layout + footer-stats file skipping: arithmetic correctness,
  * index fidelity, pruning soundness on random boxes, and the actual
  * skipping EFFECTIVENESS claim (a Z-ordered layout prunes on every
  * clustered dimension; a linear sort only on its own key). */
class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  /** Slow bit-by-bit reference for the Morton interleave. */
  private def mortonRef(vals: Seq[Long]): Long = {
    var z = 0L
    val n = vals.size
    for (i <- vals.indices; b <- 0 until Layout.Bits)
      z |= ((vals(i) >> b) & 1L) << (b * n + i)
    z
  }

  test("zValue matches the bit-by-bit Morton reference on random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong))
    val df = pts.toDF("a", "b", "c")
    val got = df.select(col("a"), col("b"), col("c"),
        Layout.zValue(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    pts.foreach { case p @ (a, b, c) =>
      assert(got(p) == mortonRef(Seq(a, b, c)), s"morton mismatch at $p")
    }
  }

  test("scaleTo is exact integer bucketing: full range onto [0, 65535]") {
    val df = Seq(0L, 1L, 999999L, 1000000L).toDF("v")
    val r = df.select(Layout.scaleTo(col("v"), lit(0L), lit(1000000L)).as("s"))
      .as[Long].collect().sorted
    assert(r.head == 0L && r.last == 65535L && r.forall(s => s >= 0 && s < 65536))
    // constant column degenerates to bucket 0, not a division blowup
    val const = Seq(5L, 5L).toDF("v")
      .select(Layout.scaleTo(col("v"), lit(5L), lit(5L)).as("s")).as[Long].collect()
    assert(const.forall(_ == 0L))
  }

  private def writeLayouts(): (String, String) = {
    val li = sources.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
    val zDir = Files.createTempDirectory("layout_z").toString
    val lDir = Files.createTempDirectory("layout_lin").toString
    Layout.zorder(li, Seq("l_orderkey", "l_partkey"), numFiles = 16)
      .write.mode("overwrite").parquet(zDir)
    Layout.linear(li, "l_orderkey", numFiles = 16)
      .write.mode("overwrite").parquet(lDir)
    (zDir, lDir)
  }

  test("footer stats equal scan-computed per-file stats (no data pages read)") {
    val (zDir, _) = writeLayouts()
    val footer = SkippingIndex.footerStats(spark, zDir, Seq("l_orderkey", "l_partkey"))
      .select("file", "column", "min_v", "max_v", "n_rows")
      .as[(String, String, Option[Double], Option[Double], Long)].collect().toSet
    val scan = spark.read.parquet(zDir)
      .withColumn("file", regexp_extract(input_file_name(), "([^/]+)$", 1))
      .groupBy("file")
      .agg(min("l_orderkey").as("mn0"), max("l_orderkey").as("mx0"),
        min("l_partkey").as("mn1"), max("l_partkey").as("mx1"),
        count(lit(1)).as("n"))
      .collect().flatMap { r =>
        Seq((r.getString(0), "l_orderkey", Some(r.getLong(1).toDouble),
              Some(r.getLong(2).toDouble), r.getLong(5)),
          (r.getString(0), "l_partkey", Some(r.getLong(3).toDouble),
            Some(r.getLong(4).toDouble), r.getLong(5)))
      }.toSet
    assert(footer == scan, "footer-derived stats must equal scan-derived stats")
  }

  test("prunedRead equals the plain filtered read on random boxes") {
    val (zDir, _) = writeLayouts()
    val full = spark.read.parquet(zDir)
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val lo0 = rnd.nextInt(5000).toLong; val hi0 = lo0 + rnd.nextInt(3000)
      val lo1 = rnd.nextInt(150).toLong; val hi1 = lo1 + rnd.nextInt(100)
      val ranges = Seq(ColRange("l_orderkey", lo0.toDouble, hi0.toDouble),
        ColRange("l_partkey", lo1.toDouble, hi1.toDouble))
      val pruned = SkippingIndex.prunedRead(spark, zDir, ranges)
      val expect = full.filter(col("l_orderkey").between(lo0, hi0) &&
        col("l_partkey").between(lo1, hi1))
      assert(pruned.count() == expect.count(),
        s"row count drift on box ($lo0-$hi0, $lo1-$hi1)")
      assert(pruned.exceptAll(expect).isEmpty && expect.exceptAll(pruned).isEmpty,
        s"content drift on box ($lo0-$hi0, $lo1-$hi1)")
    }
  }

  test("Z layout skips files on BOTH dimensions; linear only on its own key") {
    val (zDir, lDir) = writeLayouts()
    // a narrow box on the SECOND dimension: the linear (orderkey-sorted)
    // layout has every file spanning ~the full partkey range, so it can
    // prune (almost) nothing; the Z layout keeps a contiguous band
    val box = Seq(ColRange("l_partkey", 10, 40))
    val (zKept, zTotal) = SkippingIndex.skipRatio(spark, zDir, box)
    val (lKept, lTotal) = SkippingIndex.skipRatio(spark, lDir, box)
    assert(zTotal == 16 && lTotal == 16)
    assert(lKept >= 15, s"linear layout should be unprunable on partkey, kept $lKept")
    assert(zKept <= zTotal / 2,
      s"z layout should skip at least half the files on the partkey box, kept $zKept")
    // and on its own first dimension both layouts prune
    val box0 = Seq(ColRange("l_orderkey", 0, 350))
    val (zk0, _) = SkippingIndex.skipRatio(spark, zDir, box0)
    val (lk0, _) = SkippingIndex.skipRatio(spark, lDir, box0)
    assert(zk0 < 16 && lk0 < 16)
  }

  test("pruning is conservative: unknown column or missing stats keep every file") {
    val (zDir, _) = writeLayouts()
    // l_returnflag is a string column — footer stats carry no numeric
    // bound for it, so a range on it must not prune anything
    val stats = SkippingIndex.footerStats(spark, zDir, Seq("l_returnflag"))
    assert(stats.filter(col("min_v").isNotNull).count() == 0)
    val kept = SkippingIndex.pruneFiles(stats, Seq(ColRange("l_returnflag", 0, 1))).count()
    assert(kept == 16, s"non-numeric stats must keep all files, kept $kept")
    // and an empty range list is "no pruning", not a crash
    assert(SkippingIndex.pruneFiles(stats, Seq.empty).count() == 16)
  }

  test("hive-partitioned layout: manifest recurses, partition values prune, read keeps partition cols") {
    val dir = Files.createTempDirectory("graft_part").toString
    // 4 year partitions × 2 files each, k clustered within partition
    (0L until 8000L).map(i => (2020 + (i % 4), i, i * 3))
      .toDF("year", "k", "v")
      .repartitionByRange(2, col("k"))
      .write.mode("overwrite").partitionBy("year").parquet(dir)
    val m = SkippingIndex.manifest(spark, dir, Seq("year", "k"))
    assert(m.files.size == 8, s"expected 8 files across partitions: ${m.files}")
    assert(m.files.forall(_.contains("year=")), s"relative paths: ${m.files}")
    // partition-value bounds: a year range keeps exactly that partition's files
    val oneYear = m.survivors(Seq(ColRange("year", 2021, 2021)))
    assert(oneYear.size == 2 && oneYear.forall(_.startsWith("year=2021/")),
      s"partition pruning must isolate year=2021: $oneYear")
    // stacked partition + data-column pruning, and the read equality
    val ranges = Seq(ColRange("year", 2021, 2022), ColRange("k", 0, 1500))
    val pruned = SkippingIndex.prunedRead(spark, dir, ranges, Some(m))
    val expect = spark.read.parquet(dir)
      .filter(col("year").between(2021, 2022) && col("k").between(0, 1500))
    assert(pruned.columns.sorted.sameElements(Array("k", "v", "year")),
      s"partition column must survive the subset read: ${pruned.columns.toSeq}")
    assert(pruned.exceptAll(expect).isEmpty && expect.exceptAll(pruned).isEmpty,
      "partitioned pruned read must equal the plain filtered read")
    val (kept, total) = SkippingIndex.skipRatio(spark, dir, ranges, Some(m))
    assert(total == 8 && kept <= 2,
      s"2 partitions x the low-k file only: kept $kept of $total")
    // the plan-level lock: the scan RELATION itself holds only the
    // surviving files — pruning happened before the scan, not as a filter
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = pruned.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scanFiles = plan.collect { case f: FileSourceScanExec => f }
      .head.relation.location.inputFiles.length
    assert(scanFiles == kept,
      s"the scan must be built over exactly the $kept surviving files, saw $scanFiles")
  }

  test("string bounds: truncated footer stats prune soundly, 17+ char values stay conservative") {
    import graft.sources.SkippingIndex.StrRange
    val dir = Files.createTempDirectory("graft_str").toString
    // prefix-clustered long strings (> 16 chars) so every bound is truncated
    (0L until 4000L).map { i =>
      val bucket = ('a' + (i % 4)).toChar
      (s"$bucket-0123456789abcdef-suffix-$i", i)
    }.toDF("name", "v")
      .repartitionByRange(4, col("name"))
      .write.mode("overwrite").parquet(dir)
    val m = SkippingIndex.manifest(spark, dir, Seq("name"))
    assert(m.stats.forall(s => s.min_s.isDefined && s.max_s.isDefined),
      s"ascii string columns must carry bounds: ${m.stats}")
    assert(m.stats.forall(s => s.min_s.get.length <= 16 && s.max_s.get.length <= 16))
    val r = Seq(StrRange("name", "b", "b~"))
    val kept = m.survivors(Nil, r)
    // range-partition boundaries are sampled, so the "b" bucket spans at
    // most 2 of the 4 files — half the table is still provably skipped
    assert(kept.size <= 2, s"the b prefix bucket spans at most 2 files: $kept")
    val pruned = SkippingIndex.prunedRead(spark, dir, Nil, Some(m), r)
    val expect = spark.read.parquet(dir)
      .filter(col("name") >= "b" && col("name") <= "b~")
    assert(pruned.exceptAll(expect).isEmpty && expect.exceptAll(pruned).isEmpty,
      "string-pruned read must equal the plain filtered read")
    assert(expect.count() == 1000)
  }

  test("null partition (__HIVE_DEFAULT_PARTITION__) is conservatively kept") {
    val dir = Files.createTempDirectory("graft_nullpart").toString
    Seq((Some("x"), 1L), (Some("y"), 2L), (None, 3L))
      .toDF("p", "v").repartition(1)
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    val m = SkippingIndex.manifest(spark, dir, Seq("p"))
    assert(m.files.size == 3)
    import graft.sources.SkippingIndex.StrRange
    // a range excluding x and y must still keep the null partition's file
    val kept = m.survivors(Nil, Seq(StrRange("p", "z", "zz")))
    assert(kept.size == 1 && kept.head.contains("__HIVE_DEFAULT_PARTITION__"),
      s"null partition must never be pruned: $kept")
  }

  test("a persisted manifest round-trips and prunes identically") {
    val (zDir, _) = writeLayouts()
    val mPath = Files.createTempDirectory("graft_manifest").toString + "/m"
    val m = SkippingIndex.manifest(spark, zDir, Seq("l_orderkey", "l_partkey"))
    SkippingIndex.writeManifest(spark, m, mPath)
    val loaded = SkippingIndex.readManifest(spark, mPath)
    assert(loaded.stats.toSet == m.stats.toSet, "stats must round-trip exactly")
    val box = Seq(ColRange("l_orderkey", 100, 2000), ColRange("l_partkey", 10, 90))
    assert(loaded.survivors(box) == m.survivors(box))
    val viaLoaded = SkippingIndex.prunedRead(spark, zDir, box, Some(loaded))
    val plain = spark.read.parquet(zDir)
      .filter(col("l_orderkey").between(100, 2000) && col("l_partkey").between(10, 90))
    assert(viaLoaded.exceptAll(plain).isEmpty && plain.exceptAll(viaLoaded).isEmpty)
  }

  test("refreshManifest pays only for new files and equals a from-scratch build") {
    val dir = Files.createTempDirectory("graft_refresh").toString
    (1L to 1000L).map(i => (i, i * 2)).toDF("k", "v")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val m0 = SkippingIndex.manifest(spark, dir, Seq("k"))
    // append two files, delete one original (compaction/retention shape)
    (5001L to 5100L).map(i => (i, i * 2)).toDF("k", "v")
      .repartition(2).write.mode("append").parquet(dir)
    val victim = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") &&
        m0.files.contains(f.getName)).head
    assert(victim.delete())
    val refreshed = SkippingIndex.refreshManifest(spark, dir, m0)
    val scratch = SkippingIndex.manifest(spark, dir, Seq("k"))
    assert(refreshed.stats.toSet == scratch.stats.toSet,
      "incremental refresh must equal the from-scratch manifest")
    assert(refreshed.files.size == 5) // 4 - 1 deleted + 2 appended
    // and the refreshed manifest prunes the appended range correctly
    val kept = refreshed.survivors(Seq(ColRange("k", 5000, 6000)))
    assert(kept.nonEmpty && kept.size <= 2, s"only the appended files match: $kept")
  }

  test("a STALE manifest keeps files it has never seen (appends cannot lose rows)") {
    val dir = Files.createTempDirectory("graft_stale").toString
    (1L to 1000L).map(i => (i, i * 2)).toDF("k", "v")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val m = SkippingIndex.manifest(spark, dir, Seq("k"))
    // the table grows AFTER the index was built
    (5001L to 5100L).map(i => (i, i * 2)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    val ranges = Seq(ColRange("k", 5000, 6000))
    val got = SkippingIndex.prunedRead(spark, dir, ranges, Some(m))
      .agg(count(lit(1))).collect()(0).getLong(0)
    assert(got == 100,
      s"rows in un-indexed appended files must survive a stale-manifest read, got $got")
  }
}
