package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.VersionedTable

/** STRUCTURED STREAMING SOURCE over a [[graft.sources.VersionedTable]]'s
  * change feed — `spark.readStream.format("versioned-feed")
  * .option("path", root).load()`: the table's commit history becomes a
  * stream of row-level changes, one micro-batch per (range of) commit(s),
  * each row tagged `_change_type` ('insert' | 'delete') and
  * `_commit_version`. This is the Delta CDF streaming-read shape on the
  * engine's own table format, and it composes with the CDC sinks in
  * [[Streams]] so the engine consumes its own feed through the REAL
  * streaming engine — offsets, checkpoint WAL, restarts and all (the
  * driver-loop twin is [[Streams.changeFeedConsume]]).
  *
  * Protocol mapping:
  *   - OFFSET = committed source VERSION (a `LongOffset`): `getOffset`
  *     reports the table's head, `getBatch((a, b])` unions
  *     `changeFeed(v-1, v)` for each version in the range — each slice
  *     reads ONLY the files its commit added/removed, so a batch's scan
  *     is bounded like the commit itself, at any table size.
  *   - The FIRST batch of a fresh stream serves the earliest readable
  *     version as an all-insert snapshot (Delta's initial-snapshot
  *     semantics); after that every batch is a pure diff.
  *   - EXACTLY-ONCE is the engine's own: offsets land in the query's
  *     checkpoint WAL before results commit, and a restart replays
  *     exactly the pending `(start, end]` — `getBatch` is deterministic
  *     in its offsets because commits are immutable.
  *   - RETENTION is the one contract: `changeFeed(v-1, v)` needs v-1
  *     readable, so a keep-N vacuum bounds how far behind a consumer may
  *     fall — a batch past that fails LOUDLY (increase retention or
  *     restart the stream for a fresh snapshot) instead of silently
  *     skipping deletes, exactly Delta's CDF rule.
  *   - `maxVersionsPerTrigger` (option) rate-limits a catch-up: a
  *     consumer resuming after N commits folds them in bounded batches
  *     instead of one giant union.
  *   - `startingVersion` / `startingTimestamp` (options, mutually
  *     exclusive — the Delta CDF start surface): a FRESH stream skips
  *     the initial snapshot and serves changes from the given commit
  *     (inclusive) onward — the "tail the table from now" consumer
  *     stops paying a full-table first batch. `startingTimestamp`
  *     (epoch millis or `yyyy-mm-dd hh:mm:ss[.f...]`) resolves to the
  *     FIRST commit stamped at-or-after it (the dual of
  *     [[graft.sources.VersionedTable.timestampAsOf]], which resolves
  *     states, not changes; legacy pre-meta commits count as ts 0); a
  *     timestamp past the head starts after the current head. A
  *     `startingVersion` whose predecessor was retired by vacuum fails
  *     LOUDLY at stream start (its diff is gone — Delta's rule), except
  *     version 0, whose "changes" are its full content as inserts. A
  *     version past the head is allowed and serves nothing until that
  *     commit lands. Both options are ignored on RESTART from a
  *     checkpoint (the WAL's offsets win), exactly as Delta ignores
  *     them once a stream has state.
  *
  * Schema is pinned at stream start (the committed schema of the head).
  * A slice carrying a column the pinned schema lacks — the table evolved
  * mid-stream — fails loudly (restart the stream to pick up the new
  * schema); columns the slice predates null-fill, like any versioned
  * read. */
class VersionedFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "versioned-feed"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "versioned-feed needs .option(\"path\", <versioned table root>)"))

  /** `readChangeFeed` (Delta's CDF option, default TRUE here for the
    * historical `format("versioned-feed")` surface): false = PLAIN
    * append-stream mode — `spark.readStream.table("wh.t")` through
    * [[graft.sql.GraftSqlRule]]'s StreamingRelationV2 rewrite, which
    * passes `readChangeFeed=false` unless the reader opted in. */
  private def cdfMode(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").forall(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val root = rootOf(parameters)
    val table = schema.orElse(VersionedTable.logicalSchema(root)).getOrElse {
      require(VersionedTable.isVersioned(root),
        s"versioned-feed: no commits at $root and no user schema given")
      VersionedTable.read(sqlContext.sparkSession, root).schema
    }
    (shortName(),
      if (cdfMode(parameters)) VersionedFeedSource.feedSchema(table) else table)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    val table = schema.orElse(VersionedTable.logicalSchema(root)).getOrElse(
      VersionedTable.read(sqlContext.sparkSession, root).schema)
    val sv = parameters.get("startingVersion").map(_.toLong)
    val st = parameters.get("startingTimestamp").map(parseTimestampMs)
    require(sv.isEmpty || st.isEmpty,
      "versioned-feed: set at most one of startingVersion / startingTimestamp")
    sv.foreach(s => require(s >= 0L, s"startingVersion must be >= 0, got $s"))
    // a timestamp resolves to the FIRST commit stamped at-or-after it —
    // "changes committed at or after T" (Delta CDF's inclusive rule);
    // past-the-head timestamps tail from the next commit
    val starting = sv.orElse(st.map { t =>
      val vs = VersionedTable.versions(root)
      vs.find(v => VersionedTable.commitMeta(root, v).map(_._1).getOrElse(0L) >= t)
        .getOrElse(vs.lastOption.map(_ + 1L).getOrElse(0L))
    })
    new VersionedFeedSource(sqlContext, root, table,
      parameters.get("maxVersionsPerTrigger").map(_.toLong), starting,
      cdf = cdfMode(parameters),
      skipChangeCommits =
        parameters.get("skipChangeCommits").exists(_.toBoolean))
  }

  private def parseTimestampMs(s: String): Long =
    s.trim.toLongOption.getOrElse(java.sql.Timestamp.valueOf(s.trim).getTime)
}

object VersionedFeedSource {
  val ChangeType = "_change_type"
  val CommitVersion = "_commit_version"

  /** Data schema + the two feed metadata columns. */
  def feedSchema(table: StructType): StructType =
    StructType(table.fields.toSeq :+
      StructField(ChangeType, StringType, nullable = false) :+
      StructField(CommitVersion, LongType, nullable = false))
}

/** `cdf = true` (default): the change-feed stream documented above.
  * `cdf = false`: PLAIN APPEND-STREAM mode — the table's own schema,
  * each batch the rows new commits appended (initial snapshot first,
  * like Delta's non-CDF streaming read). A commit that REMOVED files
  * (delete/update/overwrite/compaction) cannot be represented as
  * appended rows: it fails LOUDLY at that batch, or is skipped whole
  * with `skipChangeCommits = true` — Delta's exact option, never a
  * silent wrong feed.
  *
  * ADMISSION CONTROL (VERDICT r14 #4): the source implements the
  * engine's native [[SupportsAdmissionControl]] + {{{
  * SupportsTriggerAvailableNow }}} interfaces — exactly how Spark's
  * own FileStreamSource (and Delta's DeltaSource) surface pacing on a
  * V1 `Source`: the engine drives batch sizing through
  * [[latestOffset(start, limit)]] with a [[ReadLimit]] instead of the
  * legacy getOffset probe, and `Trigger.AvailableNow` pins the head at
  * [[prepareForTriggerAvailableNow]] time, drains it in paced batches,
  * then terminates on its own. The admission UNIT here is the COMMIT
  * (a `ReadMaxFiles(n)` limit admits n versions per batch — each
  * version's scan is already bounded by its own commit diff, so
  * versions, not rows, are what cap a micro-batch's work). */
class VersionedFeedSource(sqlContext: SQLContext, root: String,
                          table: StructType,
                          maxVersionsPerTrigger: Option[Long],
                          startingVersion: Option[Long] = None,
                          cdf: Boolean = true,
                          skipChangeCommits: Boolean = false)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import VersionedFeedSource._
  import org.apache.spark.sql.connector.read.streaming.{
    Offset => OffsetV2, ReadLimit, ReadMaxFiles}

  private val spark = sqlContext.sparkSession

  override val schema: StructType = if (cdf) feedSchema(table) else table

  // startingVersion validates on the FIRST FRESH BATCH, and LAZILY
  // (a poisoned frame, not a constructor throw): if the pin points at
  // or before the head, its predecessor's snapshot must still be
  // readable (version 0 excepted — its changes ARE its content), else
  // the requested diffs are gone and the stream must fail at its first
  // batch rather than serve a silently-wrong feed. Deliberately NOT
  // eager: a RESTART from a checkpoint rebuilds this source too — the
  // engine may even call getBatch(None, recoveredEnd) as a DISCARDED
  // prime — but its WAL offset wins over the pin (Delta's rule), so a
  // vacuum that retired the pin's predecessor AFTER the stream had
  // already progressed past it must not brick the restart.
  private def pinError(): Option[String] = startingVersion.flatMap { s =>
    // O(1): head + floor via the validated hints, the pin's
    // predecessor via one stat — no directory listing per batch
    val head = VersionedTable.latestVersion(root)
    val earliest = VersionedTable.earliestVersion(root)
    if (head.exists(s <= _) && !(s == 0L && earliest.contains(0L)) &&
        !VersionedTable.isReadableVersion(root, s - 1))
      Some(
        s"versioned-feed at $root: startingVersion $s needs version ${s - 1} " +
          s"readable for changeFeed(${s - 1}, $s) but the earliest readable " +
          s"version is ${earliest.getOrElse(-1L)} — it was retired by " +
          "vacuum(keep); increase retention or start a fresh snapshot " +
          "stream instead")
    else None
  }

  /** Highest offset handed out so far — only used to pace
    * `maxVersionsPerTrigger`; correctness state lives in the query's own
    * checkpoint (getBatch re-primes this on recovery). */
  @volatile private var lastOffered: Option[Long] = None

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset on recovery
  }

  override def getOffset: Option[Offset] = {
    // the idle-poll path: runs every trigger even with no new commits,
    // so it must not pay an O(versions) directory listing — head and
    // floor both resolve from the validated hints (one stat each)
    val headOpt = VersionedTable.latestVersion(root)
    if (headOpt.isEmpty) None
    else {
      val head = headOpt.get
      val floor = math.max(
        VersionedTable.earliestVersion(root).getOrElse(head) - 1,
        startingVersion.getOrElse(Long.MinValue + 1) - 1)
      val capped = maxVersionsPerTrigger match {
        case Some(m) =>
          val from = lastOffered.getOrElse(floor)
          math.min(head, from + m)
        case None => head
      }
      // read-only: the engine may probe getOffset several times per
      // trigger, and each probe must see the SAME capped offset — the
      // pacing state advances only when getBatch hands a range out
      // (otherwise two probes merge two commits into one micro-batch,
      // defeating maxVersionsPerTrigger)
      Some(LongOffset(capped))
    }
  }

  // ---- native admission control (VERDICT r14 #4) --------------------
  /** `maxVersionsPerTrigger` expressed as the engine's own limit type:
    * versions are this source's admission unit (see class doc). */
  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger
      .map(m => ReadLimit.maxFiles(math.min(m, Int.MaxValue.toLong).toInt))
      .getOrElse(ReadLimit.allAvailable())

  /** The head pinned by `Trigger.AvailableNow` at prepare time: the
    * drain targets exactly this commit — later commits wait for the
    * next run (the engine terminates once offsets reach it). */
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = VersionedTable.latestVersion(root)

  private def verV2(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset on recovery
  }

  /** The engine's admission-control probe: next end offset from
    * `startOffset` (the previous batch's end; null on a fresh stream)
    * under `limit`. A `ReadMaxFiles(n)` admits n VERSIONS; every other
    * limit kind reads all available (rows/bytes cannot bound a commit
    * diff without resolving it — versions already do). Deterministic
    * and read-only, like [[getOffset]]. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val headOpt = VersionedTable.latestVersion(root)
    if (headOpt.isEmpty) return null
    val head = availableNowTarget.fold(headOpt.get)(math.min(_, headOpt.get))
    val floor = math.max(
      VersionedTable.earliestVersion(root).getOrElse(head) - 1,
      startingVersion.getOrElse(Long.MinValue + 1) - 1)
    val from = Option(startOffset).map(verV2)
      .orElse(lastOffered).getOrElse(floor)
    val capped = limit match {
      case m: ReadMaxFiles => math.min(head, from + m.maxFiles())
      case _ => head
    }
    if (capped <= from) startOffset else LongOffset(capped)
  }

  /** A frame shaped like the TABLE schema (pre-align) that throws `msg`
    * the moment any action evaluates it — see the lazy-failure note in
    * getBatch. `raise_error` fires per-row at execution, never at plan
    * construction. */
  private def poisoned(msg: String): DataFrame = {
    import org.apache.spark.sql.functions.{length, raise_error}
    val base = spark.range(1)
      .filter(length(raise_error(lit(msg))) > 0)
      .select(table.fields.toSeq.map(f =>
        lit(null).cast(f.dataType).as(f.name)): _*)
    if (cdf) base.withColumn(ChangeType, lit("insert")) else base
  }

  /** Project a slice onto the stream's pinned schema: missing columns
    * null-fill (older files predate them); EXTRA columns mean the table
    * evolved after the stream pinned its schema — fail loudly rather
    * than silently dropping data (Delta's rule: schema change ⇒ restart
    * the stream). */
  private def align(df: DataFrame, v: Long): DataFrame = {
    val known = schema.fieldNames.toSet
    val extra = df.columns.filterNot(c => known.contains(c) || c == ChangeType)
    if (extra.nonEmpty)
      throw new IllegalStateException(
        s"versioned-feed at $root: commit v$v carries column(s) " +
          s"${extra.mkString(", ")} the stream's schema predates — the table " +
          "evolved mid-stream; restart the stream to adopt the new schema")
    val cols = table.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(
      (if (cdf && df.columns.contains(ChangeType)) cols :+ col(ChangeType)
       else cols): _*)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    val startV = start.map(ver)
    lastOffered = Some(math.max(endV, lastOffered.getOrElse(Long.MinValue)))
    // fresh-looking batch (no checkpointed start): if the pin's
    // predecessor is gone, hand back a LAZILY-failing frame — a real
    // first batch executes it and fails loudly with the pin message; a
    // discarded recovery prime never does (see pinError)
    if (startV.isEmpty) pinError().foreach { msg =>
      // through the same asStreaming wrap as every other batch: a V1
      // Source.getBatch must return an isStreaming plan or the engine's
      // own assertion replaces the pin message before execution
      val p = if (cdf) poisoned(msg).withColumn(CommitVersion, lit(-1L))
              else poisoned(msg)
      return org.apache.spark.sql.graft.StreamingShim.asStreaming(sqlContext, p)
    }
    val readable = VersionedTable.versions(root)
    // a checkpointed start offset WINS over startingVersion (Delta's
    // rule: start options only position a FRESH stream); on the first
    // batch of a pinned stream the floor is startingVersion - 1
    val floor: Option[Long] = startV.orElse(startingVersion.map(_ - 1L))
    val inRange = readable.filter(v => floor.forall(v > _) && v <= endV)
    val slices = inRange.flatMap { v =>
      val isSnapshot =
        (floor.isEmpty && v == readable.min) || // fresh unpinned stream
          (v == 0L && !readable.contains(v - 1)) // startingVersion = 0 replay
      val slice: Option[DataFrame] =
        if (isSnapshot)
          // initial snapshot: the full content as inserts (plain: rows)
          Some(VersionedTable.read(spark, root, Some(v))
            .withColumn(ChangeType, lit("insert")))
        else if (!readable.contains(v - 1))
          // LAZY failure, deliberately: the V1 recovery contract calls
          // getBatch(None, recoveredEnd) as a DISCARDED prime on every
          // restart whose last batch committed — throwing at frame
          // CONSTRUCTION would brick legitimate restarts after a vacuum
          // retired already-consumed diffs. A frame that throws at
          // EXECUTION keeps every real consumer loud (an uncommitted
          // replay and a fresh stream both execute their first batch)
          // while the discarded prime never evaluates it.
          Some(poisoned(
            s"versioned-feed at $root: version ${v - 1} was retired by " +
              s"vacuum(keep) but the stream still needs changeFeed(${v - 1}, $v) " +
              "— increase source retention or restart the stream for a fresh snapshot"))
        else if (cdf)
          Some(VersionedTable.changeFeed(spark, root, v - 1, v))
        else {
          // PLAIN append-stream mode: a commit is representable iff it
          // removed no files — its added files ARE the new rows. A
          // change commit (delete/update/overwrite/compact) refuses
          // loudly or, with skipChangeCommits, skips whole (Delta's
          // option). The file diff comes from two commit-list reads —
          // zero data I/O.
          val removed = VersionedTable.fileStats(root, Some(v - 1)).keySet --
            VersionedTable.fileStats(root, Some(v)).keySet
          if (removed.isEmpty)
            Some(VersionedTable.changeFeed(spark, root, v - 1, v)
              .filter(col(ChangeType) === "insert").drop(ChangeType))
          else if (skipChangeCommits) None
          else Some(poisoned(
            s"versioned-feed at $root: commit v$v removed/rewrote data files — " +
              "an append-only stream cannot represent it; read with " +
              "readChangeFeed=true, or set skipChangeCommits=true to skip " +
              "such commits"))
        }
      slice.map { s =>
        val aligned = align(s, v)
        if (cdf) aligned.withColumn(CommitVersion, lit(v)) else aligned
      }
    }
    val out =
      if (slices.nonEmpty) slices.reduce(_ unionByName _)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    org.apache.spark.sql.graft.StreamingShim.asStreaming(sqlContext, out)
  }

  override def stop(): Unit = ()
}
