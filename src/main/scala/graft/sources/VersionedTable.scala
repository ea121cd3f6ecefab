package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal SNAPSHOT-ISOLATED versioned parquet table — the lakehouse
  * transaction protocol in miniature (the shape Delta/Iceberg implement;
  * cf. the dispatch seam in `operators/Dedup.mergeUpsert`, which targets
  * the real Delta when its jar is present):
  *
  *   - DATA FILES are immutable and uniquely named
  *     (`data/<version>-<uuid>.parquet`); a writer never touches bytes a
  *     reader could be scanning.
  *   - A COMMIT is one file, `_commits/v<N>.list`, holding the snapshot's
  *     COMPLETE relative file list (one per line). Snapshot state is a
  *     single read — no log replay — and the append commit simply lists
  *     the previous snapshot's files plus the new ones.
  *   - Commits become visible ATOMICALLY: the list is written to a temp
  *     name and `ATOMIC_MOVE`d into place, with `REPLACE_EXISTING`
  *     withheld — so two racing writers targeting the same version
  *     cannot both land; the loser's move throws, and [[append]]/
  *     [[overwrite]] retry against the refreshed snapshot (optimistic
  *     concurrency, the Delta protocol's conflict rule for blind
  *     appends).
  *   - READERS never lock: [[read]] resolves a version's file list and
  *     hands Spark exactly those files. A reader holding version N is
  *     untouched by any later commit (time travel is the same code path
  *     with an explicit version).
  *   - A CRASHED writer leaves orphan data files and no commit — invisible
  *     to every reader by construction; [[vacuum]] deletes data files no
  *     commit references.
  *
  * 100 TB notes: per-snapshot complete file lists are O(files) text —
  * the simple trade for log-replay-free reads; at very high commit
  * rates a real format compacts logs into checkpoints, which is
  * exactly what this layout's `.list` already is. Listing `_commits/`
  * is one directory scan; data-file reads are driven by the list, so a
  * reader never globs the data directory (no eventual-consistency
  * hazards on object stores that list slowly). */
object VersionedTable {

  private def commitsDir(root: String): Path = Paths.get(root, "_commits")
  private def dataDir(root: String): Path = Paths.get(root, "data")

  /** Committed versions, ascending (empty for a nonexistent table). */
  def versions(root: String): Seq[Long] = {
    val d = commitsDir(root)
    if (!Files.isDirectory(d)) Seq.empty
    else listNames(d)
      .filter(n => n.startsWith("v") && n.endsWith(".list"))
      .map(n => n.stripPrefix("v").stripSuffix(".list").toLong)
      .sorted
  }

  private def listNames(d: Path): Seq[String] = {
    val it = Files.list(d)
    try it.toArray.toSeq.map(_.asInstanceOf[Path].getFileName.toString)
    finally it.close()
  }

  private def filesOf(root: String, version: Long): Seq[String] = {
    val f = commitsDir(root).resolve(s"v$version.list")
    val s = new String(Files.readAllBytes(f), "UTF-8")
    s.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Read the table at `version` (default: latest). Spark scans exactly
    * the committed files — never a directory glob. */
  def read(spark: SparkSession, root: String,
           version: Option[Long] = None): DataFrame = {
    val vs = versions(root)
    require(vs.nonEmpty, s"no commits at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    // '#'-prefixed lines are commit metadata (txn headers), not files
    val files = filesOf(root, v).filterNot(_.startsWith("#"))
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files.map(f => s"$root/$f"): _*)
  }

  /** Write `df`'s rows as new immutable data files; returns the new
    * files' relative names. No commit yet — invisible to readers. */
  private def writeData(df: DataFrame, root: String, tag: String): Seq[String] = {
    Files.createDirectories(dataDir(root))
    val staging = s"$root/__stage_$tag"
    df.write.mode("overwrite").parquet(staging)
    val stageDir = Paths.get(staging)
    val parts = listNames(stageDir).filter(_.endsWith(".parquet")).sorted
    val named = parts.zipWithIndex.map { case (p, i) =>
      val rel = s"data/$tag-$i.parquet"
      Files.move(stageDir.resolve(p), Paths.get(root, rel),
        StandardCopyOption.ATOMIC_MOVE)
      rel
    }
    // remove the drained staging dir (best-effort; leftovers are inert)
    stageDir.toFile.listFiles().foreach(_.delete())
    Files.deleteIfExists(stageDir)
    named
  }

  /** Atomically publish `files` as version `v`. Returns false if some
    * other writer landed `v` first (caller refreshes and retries). */
  private def tryCommit(root: String, v: Long, files: Seq[String]): Boolean = {
    Files.createDirectories(commitsDir(root))
    val tmp = commitsDir(root).resolve(s".v$v.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, files.mkString("\n").getBytes("UTF-8"))
    try {
      Files.move(tmp, commitsDir(root).resolve(s"v$v.list"),
        StandardCopyOption.ATOMIC_MOVE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); false
    }
  }

  /** APPEND commit: new snapshot = previous snapshot's files + `df`'s new
    * files. Data is written once; only the commit retries on a version
    * race (blind appends never conflict semantically, so the retry is
    * safe — the Delta rule). Returns the committed version. */
  def append(spark: SparkSession, root: String, df: DataFrame): Long = {
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val fresh = writeData(df, root, tag)
    var done = -1L
    while (done < 0) {
      val vs = versions(root)
      val v = if (vs.isEmpty) 0L else vs.last + 1
      val base = if (vs.isEmpty) Seq.empty else filesOf(root, vs.last)
      if (tryCommit(root, v, base ++ fresh)) done = v
    }
    done
  }

  /** OVERWRITE commit: new snapshot = exactly `df`'s new files. */
  def overwrite(spark: SparkSession, root: String, df: DataFrame): Long = {
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val fresh = writeData(df, root, tag)
    var done = -1L
    while (done < 0) {
      val vs = versions(root)
      val v = if (vs.isEmpty) 0L else vs.last + 1
      if (tryCommit(root, v, fresh)) done = v
    }
    done
  }

  /** IDEMPOTENT append — the Delta `txn` (transaction-identifier)
    * pattern that makes an at-least-once producer exactly-once: the
    * commit list carries a `#txn:<writerId>:<epoch>` header line, and
    * a re-delivered (writerId, epoch) is detected against the CURRENT
    * snapshot's committed headers and becomes a NO-OP before any data
    * is written. This is what a Structured Streaming `foreachBatch`
    * sink needs (foreachBatch is at-least-once; the epoch is the
    * batchId) — see `streaming/Streams.versionedSinkStream`. The
    * txn check re-runs inside the optimistic-commit retry loop, so
    * two racing deliveries of the SAME epoch also collapse to one
    * commit. Returns the committed version, or -1 for a skipped
    * redelivery. */
  def appendIdempotent(spark: SparkSession, root: String, df: DataFrame,
                       writerId: String, epoch: Long): Long = {
    require(!writerId.contains(":") && !writerId.contains("\n"),
      s"writerId must not contain ':' or newlines: $writerId")
    val txn = s"#txn:$writerId:$epoch"
    def committed(): Boolean =
      versions(root).exists(v => filesOf(root, v).contains(txn))
    if (committed()) return -1L
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val fresh = writeData(df, root, tag)
    var done = -1L
    var skipped = false
    while (done < 0 && !skipped) {
      if (committed()) skipped = true // racing duplicate landed first
      else {
        val vs = versions(root)
        val v = if (vs.isEmpty) 0L else vs.last + 1
        val base = if (vs.isEmpty) Seq.empty else filesOf(root, vs.last)
        if (tryCommit(root, v, base ++ fresh :+ txn)) done = v
      }
    }
    if (skipped) fresh.foreach(f => Files.deleteIfExists(Paths.get(root, f)))
    done
  }

  /** OPTIMIZE — the Delta `OPTIMIZE ... ZORDER BY` shape on this
    * table: rewrite the CURRENT snapshot's rows as `numFiles`
    * Z-order-clustered files ([[graft.operators.Layout.zorder]], so
    * footer stats prune on every clustered column) and commit them as
    * a NEW version with IDENTICAL logical content. The previous
    * snapshot's files stay on disk for time travel until a keep-N
    * [[vacuum]]; `#txn` headers CARRY OVER into the new list, so a
    * streaming sink's exactly-once guarantee survives an optimize run
    * between its epochs. Returns the committed version. */
  def optimize(spark: SparkSession, root: String, zorderCols: Seq[String],
               numFiles: Int): Long = {
    val vs = versions(root)
    require(vs.nonEmpty, s"no commits at $root")
    val baseV = vs.last
    val baseFiles = filesOf(root, baseV).toSet
    val clustered = graft.operators.Layout.zorder(
      read(spark, root, Some(baseV)), zorderCols, numFiles)
    val tag = java.util.UUID.randomUUID().toString.take(12)
    val fresh = writeData(clustered, root, tag)
    var done = -1L
    while (done < 0) {
      val cur = versions(root)
      val latest = filesOf(root, cur.last)
      // conflict rule: the rewrite replaces exactly the BASE snapshot's
      // files — anything a concurrent append landed since rides along
      // untouched, as do the txn headers
      val since = latest.filterNot(f => baseFiles.contains(f) || f.startsWith("#"))
      val txns = latest.filter(_.startsWith("#"))
      if (tryCommit(root, cur.last + 1, fresh ++ since ++ txns)) done = cur.last + 1
    }
    done
  }

  /** Delete data files no commit references (orphans of crashed writers,
    * or files only old, since-dropped snapshots used — pass `keep` to
    * retain the trailing N versions' files; default keeps them all). */
  def vacuum(root: String, keep: Option[Int] = None): Seq[String] = {
    val vs = versions(root)
    val kept = keep.fold(vs)(n => vs.takeRight(n))
    val live = kept.flatMap(filesOf(root, _)).toSet
    val d = dataDir(root)
    if (!Files.isDirectory(d)) return Seq.empty
    val all = listNames(d).filter(_.endsWith(".parquet"))
    val doomed = all.filterNot(n => live.contains(s"data/$n"))
    doomed.foreach(n => Files.deleteIfExists(d.resolve(n)))
    doomed.map(n => s"data/$n")
  }
}
