package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{BloomIndex, VersionedTable}

/** Per-file Bloom index: build/refresh/probe semantics, the no-false-
  * negative guarantee under adversarial keys, kind pinning, and the
  * end-to-end claim — a key-list DELETE on a hashed key prunes with the
  * index where min/max stats provably cannot. */
class BloomIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = Files.createTempDirectory(s"bloomspec_$tag").toFile
    d.delete()
    d.getPath
  }

  /** 4 files of 250 md5-hex keys each, clustered by an `id` range so we
    * know exactly which file holds which keys. */
  private def hashedTable(root: String): Unit = {
    val df = (0 until 1000).toDF("id")
      .withColumn("doc_key", md5(col("id").cast("string")))
      .withColumn("v", col("id") * 2)
    VersionedTable.overwrite(spark, root,
      df.repartitionByRange(4, col("id")).sortWithinPartitions("id"))
  }

  private def snap(root: String): Seq[(String, String)] =
    VersionedTable.dataFiles(root).map(r => (s"$root/$r", r))

  test("probe finds every file that truly holds a listed key (no false negatives)") {
    val root = freshDir("nofn")
    hashedTable(root)
    val files = snap(root)
    val idx = BloomIndex.indexFor(spark, files, "doc_key", fpp = 0.01)
    assert(idx.count() == files.size.toLong)
    // every single key must survive to its own file: probe each of 100
    // random keys alone and check the file that holds it is kept
    val rows = VersionedTable.read(spark, root)
      .select(input_file_name().as("f"), col("doc_key")).collect()
    val rnd = new scala.util.Random(11)
    rnd.shuffle(rows.toSeq).take(100).foreach { r =>
      val rel = files.find(f => r.getString(0).endsWith(f._2)).map(_._2)
        .getOrElse(fail(s"no rel for ${r.getString(0)}"))
      val kept = BloomIndex.survivors(spark, idx, files.map(_._2), "doc_key",
        Seq(r.getString(1)).toDF("doc_key"))
      assert(kept.contains(rel), s"file $rel holding key ${r.getString(1)} was pruned")
    }
  }

  test("probe prunes files that cannot hold the keys; absent keys prune everything (mod fp)") {
    val root = freshDir("prune")
    hashedTable(root)
    val files = snap(root)
    val idx = BloomIndex.indexFor(spark, files, "doc_key", fpp = 1e-6)
    // keys of ids 0..9 live in exactly one file (range-clustered)
    val doomed = (0 until 10).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).toDF("doc_key")
    val kept = BloomIndex.survivors(spark, idx, files.map(_._2), "doc_key", doomed)
    assert(kept.size <= 2, s"expected ~1 surviving file, got ${kept.size}")
    // keys that exist nowhere: at fpp 1e-6 nothing should survive
    val ghosts = (0 until 10).map(i => s"not-a-real-key-$i").toDF("doc_key")
    assert(BloomIndex.survivors(spark, idx, files.map(_._2), "doc_key", ghosts).isEmpty)
  }

  test("unindexed candidate files always pass the probe") {
    val root = freshDir("unidx")
    hashedTable(root)
    val files = snap(root)
    val idx = BloomIndex.indexFor(spark, files.take(2), "doc_key", fpp = 0.01)
    val ghosts = Seq("zzzz").toDF("doc_key")
    val kept = BloomIndex.survivors(spark, idx, files.map(_._2), "doc_key", ghosts)
    // the two indexed files prune; the two unindexed ones must stay
    assert(kept.toSet == files.drop(2).map(_._2).toSet)
  }

  test("refreshFor keeps carried rows, drops dead files, builds only the new ones") {
    val root = freshDir("refresh")
    hashedTable(root)
    val idx0 = BloomIndex.indexFor(spark, snap(root), "doc_key", fpp = 0.01)
    val before = idx0.collect().map(b => b.file -> b.n_items).toMap
    // append churns the snapshot: new files appear, old ones carry
    VersionedTable.append(spark, root,
      (1000 until 1200).toDF("id")
        .withColumn("doc_key", md5(col("id").cast("string")))
        .withColumn("v", col("id") * 2))
    val cur = snap(root)
    val idx1 = BloomIndex.refreshFor(spark, cur, idx0)
    val after = idx1.collect().map(b => b.file -> b.n_items).toMap
    assert(after.keySet == cur.map(_._2).toSet)
    before.foreach { case (f, n) =>
      assert(after.get(f).contains(n), s"carried file $f was rebuilt or dropped")
    }
    // the appended keys are findable through the refreshed index
    val k = Seq(java.security.MessageDigest.getInstance("MD5")
      .digest("1100".getBytes("UTF-8")).map("%02x".format(_)).mkString).toDF("doc_key")
    val kept = BloomIndex.survivors(spark, idx1, cur.map(_._2), "doc_key", k)
    assert(kept.nonEmpty)
  }

  test("integral keys build as longs and probe with integral key lists") {
    val root = freshDir("longs")
    val df = (0 until 1000).toDF("id").withColumn("v", col("id") * 3)
    VersionedTable.overwrite(spark, root,
      df.repartitionByRange(4, col("id")).sortWithinPartitions("id"))
    val files = snap(root)
    val idx = BloomIndex.indexFor(spark, files, "id", fpp = 1e-6)
    assert(idx.head().kind == "l")
    val kept = BloomIndex.survivors(spark, idx, files.map(_._2), "id",
      Seq(5, 7).toDF("id"))
    assert(kept.size == 1) // ids 5,7 live in the first range file
    // a string probe against a long-built index refuses loudly
    val e = intercept[IllegalArgumentException] {
      BloomIndex.survivors(spark, idx, files.map(_._2), "id",
        Seq("5").toDF("id"))
    }
    assert(e.getMessage.contains("kind"))
  }

  test("fractional key columns are refused at build time") {
    val root = freshDir("frac")
    VersionedTable.overwrite(spark, root,
      (0 until 10).toDF("id").withColumn("x", col("id") * 1.5))
    val e = intercept[IllegalArgumentException] {
      BloomIndex.indexFor(spark, snap(root), "x")
    }
    assert(e.getMessage.contains("integral/string/binary"))
  }

  test("deleteWhereKeys with a bloom index rewrites only the files holding the keys") {
    val root = freshDir("e2e")
    hashedTable(root)
    val files = snap(root)
    val idx = BloomIndex.indexFor(spark, files, "doc_key", fpp = 1e-6)
    // doomed = keys of ids 100..119 — one range file holds them all
    val doomed = VersionedTable.read(spark, root)
      .filter(col("id").between(100, 119)).select("doc_key")
    val (_, rewritten, carried) = VersionedTable.deleteWhereKeys(
      spark, root, "doc_key", doomed, bloom = Some(idx))
    assert(rewritten == 1, s"bloom should isolate 1 of 4 files, rewrote $rewritten")
    assert(carried == 3)
    val left = VersionedTable.read(spark, root)
    assert(left.count() == 980)
    assert(left.filter(col("id").between(100, 119)).count() == 0)
    // CONTROL: the same delete WITHOUT the index rewrites all files —
    // the md5 min/max boxes span everything, so this proves the index
    // (not the stats) is what bounded the rewrite above
    val root2 = freshDir("e2e_ctl")
    hashedTable(root2)
    val doomed2 = VersionedTable.read(spark, root2)
      .filter(col("id").between(100, 119)).select("doc_key")
    val (_, rw2, _) = VersionedTable.deleteWhereKeys(spark, root2, "doc_key", doomed2)
    assert(rw2 == 4, s"without bloom the hashed key should touch all 4 files, got $rw2")
  }

  test("mergeInto with a bloom index bounds a hashed-key CDC batch") {
    val root = freshDir("merge")
    hashedTable(root)
    val files = snap(root)
    val idx = BloomIndex.indexFor(spark, files, "doc_key", fpp = 1e-6)
    // CDC batch: update the 20 keys of ids 200..219 (one file's range)
    val batch = VersionedTable.read(spark, root)
      .filter(col("id").between(200, 219))
      .select(col("doc_key"), col("id"), (col("v") + 1).as("v"))
    val (_, rewritten, carried) = VersionedTable.mergeInto(
      spark, root, batch, Seq("doc_key"),
      updateWhen = Some(lit(true)),
      bloom = Map("doc_key" -> idx))
    assert(rewritten == 1, s"bloom should isolate 1 of 4 files, rewrote $rewritten")
    assert(carried == 3)
    val got = VersionedTable.read(spark, root)
      .filter(col("id").between(200, 219)).select("v").as[Int].collect()
    assert(got.sorted.toSeq == (200 to 219).map(_ * 2 + 1))
  }

  test("Warehouse: sidecar builds once, refreshes on write, bounds key deletes, hides from list") {
    import graft.run.Warehouse
    val whRoot = freshDir("wh")
    val wh = Warehouse(spark, whRoot)
    val df = (0 until 1000).toDF("id")
      .withColumn("doc_key", md5(col("id").cast("string")))
      .withColumn("v", col("id") * 2)
    wh.write("gold_docs",
      df.repartitionByRange(4, col("id")).sortWithinPartitions("id"))
    wh.buildBloomIndex("gold_docs", "doc_key", fpp = 1e-6)
    assert(new java.io.File(s"$whRoot/gold_docs__bloom_doc_key").exists())
    // the sidecar is metadata: never listed as a table
    assert(!wh.list("gold_").exists(_.contains("__bloom_")))
    // an append refreshes the index at O(new files) — the new keys are
    // findable without a rebuild
    wh.append("gold_docs", (1000 until 1100).toDF("id")
      .withColumn("doc_key", md5(col("id").cast("string")))
      .withColumn("v", col("id") * 2))
    val idx = graft.sources.BloomIndex.readIndex(
      spark, s"$whRoot/gold_docs__bloom_doc_key")
    assert(idx.select("file").as[String].collect().toSet ==
      VersionedTable.dataFiles(s"$whRoot/gold_docs").toSet)
    // a key delete through the Warehouse consults the sidecar: the 20
    // doomed keys live in one of the 4 original range files
    val doomed = wh.read("gold_docs")
      .filter(col("id").between(100, 119)).select("doc_key")
    val (_, rewritten, carried) = wh.deleteWhereKeys("gold_docs", "doc_key", doomed)
    assert(rewritten == 1, s"sidecar should isolate 1 file, rewrote $rewritten")
    assert(carried >= 3)
    assert(wh.read("gold_docs").count() == 1080)
  }

  test("Warehouse: a sidecar built on an empty table backfills at the first write") {
    import graft.run.Warehouse
    val whRoot = freshDir("wh_empty")
    val wh = Warehouse(spark, whRoot)
    wh.write("gold_e", spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      (0 until 0).toDF("id").withColumn("doc_key", md5(col("id").cast("string"))).schema))
    wh.buildBloomIndex("gold_e", "doc_key", fpp = 1e-6)
    // the empty write's zero-row file gets an explicit EMPTY filter (it
    // provably holds no key), not a missing row
    val idx0 = graft.sources.BloomIndex.readIndex(
      spark, s"$whRoot/gold_e__bloom_doc_key").collect()
    assert(idx0.forall(_.n_items == 0L))
    wh.append("gold_e", (0 until 500).toDF("id")
      .withColumn("doc_key", md5(col("id").cast("string"))))
    val idx = graft.sources.BloomIndex.readIndex(
      spark, s"$whRoot/gold_e__bloom_doc_key")
    assert(idx.count() > 0, "the empty sidecar must rebuild at the first real write")
    assert(idx.select("file").as[String].collect().toSet ==
      VersionedTable.dataFiles(s"$whRoot/gold_e").toSet)
  }
}
