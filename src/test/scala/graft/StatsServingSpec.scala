package graft

import org.apache.spark.sql.functions._

import graft.sources.{SkippingIndex, VersionedTable}

/** Metadata answered from commit-list stats alone: row counts / non-null
  * counts with the DATA DIRECTORY HIDDEN (the zero-I/O proof), and
  * NOT-NULL pruning — all-null files prune through `readWhere` and the
  * planner path even when no range bound exists. */
class StatsServingSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"stats_$tag").toFile
    d.delete(); d.getPath
  }

  private def hideData[T](root: String)(body: => T): T = {
    val from = java.nio.file.Paths.get(root, "data")
    val to = java.nio.file.Paths.get(root, "data__hidden")
    java.nio.file.Files.move(from, to)
    try body finally java.nio.file.Files.move(to, from)
  }

  test("countRows and statsNonNullCount serve with the data directory hidden") {
    val root = freshRoot("count")
    val df = (0 until 5000).map(i =>
        (i.toLong, if (i % 10 == 0) None else Some(s"g${i % 7}")))
      .toDF("id", "flag")
    VersionedTable.overwrite(spark, root,
      df.repartitionByRange(8, col("id")).sortWithinPartitions("id"))
    VersionedTable.append(spark, root,
      (5000 until 5500).map(i => (i.toLong, Option.empty[String])).toDF("id", "flag"))
    VersionedTable.deleteWhere(spark, root,
      Seq(SkippingIndex.ColRange("id", 100, 199)))
    val (nTotal, nFlag) = hideData(root) {
      (VersionedTable.countRows(spark, root),
        VersionedTable.statsNonNullCount(root, "flag").get)
    }
    assert(nTotal == 5000 + 500 - 100)
    // non-null flags: ids 0..4999 minus multiples of 10, minus the
    // deleted 100..199 non-multiples (90 of them); appended rows all null
    assert(nFlag == (0 until 5000).count(i => i % 10 != 0 && !(i >= 100 && i <= 199)))
    // the scan agrees once the data is back
    assert(VersionedTable.read(spark, root).count() == nTotal)
    assert(VersionedTable.read(spark, root)
      .filter(col("flag").isNotNull).count() == nFlag)
  }

  test("a legacy bare line degrades statsRowCount to None and countRows to a scan") {
    val root = freshRoot("legacy")
    VersionedTable.overwrite(spark, root, (0 until 100).toDF("id"))
    val commits = java.nio.file.Paths.get(root, "_commits")
    val list = java.nio.file.Files.list(commits).toArray.map(_.toString)
      .filter(_.endsWith(".list")).head
    val stripped = scala.io.Source.fromFile(list).getLines()
      .map(l => if (l.startsWith("#")) l else l.takeWhile(_ != '\t')).mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(list), stripped.getBytes("UTF-8"))
    assert(VersionedTable.statsRowCount(root).isEmpty)
    assert(VersionedTable.countRows(spark, root) == 100) // scan fallback
  }

  test("NOT-NULL pruning: all-null files prune where no range bound exists") {
    val root = freshRoot("nn")
    // 4 files clustered by id; doc_key (a hash — useless min/max) is
    // entirely NULL in the upper half. The halves are written as
    // SEPARATE commits so the null/non-null split is guaranteed to fall
    // on file boundaries: repartitionByRange SAMPLES with an RDD-id-
    // derived seed, and a one-row boundary drift at id=1000 flips the
    // survivor count (the in-suite flake this replaces — same class as
    // the r12 planner-scan loosening)
    val df = (0 until 2000).map(i =>
        (i.toLong, if (i < 1000) Some(s"k${i * 2654435761L % 1000000}") else None))
      .toDF("id", "doc_key")
    VersionedTable.overwrite(spark, root,
      df.filter(col("id") < 1000)
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"))
    VersionedTable.append(spark, root,
      df.filter(col("id") >= 1000)
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"))
    // pruneSpec of an isNotNull-implying predicate carries the column
    val (nr, sr, nn) = SkippingIndex.pruneSpecOf(spark, df.schema,
      col("doc_key") === "k42")
    assert(nn.contains("doc_key") && nr.isEmpty && sr.nonEmpty)
    // readWhere prunes the two all-null files
    val got = VersionedTable.readWhere(spark, root, col("doc_key").isNotNull)
    assert(got.count() == 1000)
    val m = VersionedTable.statsManifest(root).get
    assert(m.survivors(Nil, Nil, Seq("doc_key")).size == 2,
      "the two all-null files must prune on the not-null requirement")
    // planner path: a filter on doc_key plants isnotnull — files prune
    val (table, idx) = VersionedTable.tableWithIndex(spark, root)
    assert(table.filter(col("doc_key").isNotNull).count() == 1000)
    assert(idx.lastPlanned.get._1 == 2,
      s"planner should list 2 of 4 files: ${idx.lastPlanned}")
  }

  test("statsMinMax serves exact numeric bounds with the data hidden; strings refuse") {
    val root = freshRoot("minmax")
    val df = (0 until 3000).map(i =>
        (i.toLong, if (i < 10) None else Some(i * 3.5), s"s$i")).toDF("id", "v", "s")
    VersionedTable.overwrite(spark, root,
      df.repartitionByRange(4, col("id")).sortWithinPartitions("id"))
    VersionedTable.deleteWhere(spark, root,
      Seq(SkippingIndex.ColRange("id", 0, 99)))
    val (mm, vv, ss) = hideData(root) {
      (VersionedTable.statsMinMax(root, "id"),
        VersionedTable.statsMinMax(root, "v"),
        VersionedTable.statsMinMax(root, "s"))
    }
    assert(mm.contains((100.0, 2999.0)))
    assert(vv.contains((100 * 3.5, 2999 * 3.5)))
    assert(ss.isEmpty, "truncated string bounds must never serve as exact values")
    // an ALL-NULL column serves SQL's NULL (None) rather than a bound
    val root2 = freshRoot("minmax_null")
    VersionedTable.overwrite(spark, root2,
      (0 until 50).map(i => (i.toLong, Option.empty[Double])).toDF("id", "v"))
    assert(VersionedTable.statsMinMax(root2, "v").isEmpty)
    assert(VersionedTable.statsNonNullCount(root2, "v").contains(0L))
  }

  test("describeDetail summarizes the table from commit lists alone (data hidden)") {
    val root = freshRoot("detail")
    VersionedTable.withClock(() => 5000L) {
      VersionedTable.overwrite(spark, root,
        (0 until 300).map(i => (i.toLong, s"p${i % 3}", i * 1.5)).toDF("id", "part", "v"),
        partitionBy = Seq("part"))
    }
    VersionedTable.addCheckConstraint(spark, root, "v_pos", "v >= 0")
    val row = hideData(root) {
      VersionedTable.describeDetail(spark, root).collect()(0)
    }
    assert(row.getAs[Long]("n_rows") == 300L)
    assert(row.getAs[Long]("n_files") > 0L && row.getAs[Long]("n_bytes") > 0L)
    assert(row.getAs[String]("partition_columns") == "part")
    assert(row.getAs[Boolean]("schema_stamped"))
    assert(row.getAs[Long]("n_constraints") == 1L)
    // head commit = the constraint add (wall clock, its own op label)
    assert(row.getAs[Long]("ts_ms") > 5000L &&
      row.getAs[String]("operation").nonEmpty)
    assert(row.getAs[Long]("version") == VersionedTable.versions(root).last)
  }

  test("OR keeps only not-null requirements common to both sides") {
    val schema = (0 until 0).toDF("a").withColumn("b", lit("x")).schema
    val (_, _, nn1) = SkippingIndex.pruneSpecOf(spark, schema,
      col("a") > 1 || col("b") === "x")
    assert(nn1.isEmpty, s"OR over different columns must drop both: $nn1")
    val (_, _, nn2) = SkippingIndex.pruneSpecOf(spark, schema,
      col("a") > 1 || col("a") < 0)
    assert(nn2 == Seq("a"))
  }
}
