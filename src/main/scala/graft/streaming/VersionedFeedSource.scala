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

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val root = rootOf(parameters)
    val table = schema.orElse(VersionedTable.logicalSchema(root)).getOrElse {
      require(VersionedTable.isVersioned(root),
        s"versioned-feed: no commits at $root and no user schema given")
      VersionedTable.read(sqlContext.sparkSession, root).schema
    }
    (shortName(), VersionedFeedSource.feedSchema(table))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val root = rootOf(parameters)
    val table = schema.orElse(VersionedTable.logicalSchema(root)).getOrElse(
      VersionedTable.read(sqlContext.sparkSession, root).schema)
    new VersionedFeedSource(sqlContext, root, table,
      parameters.get("maxVersionsPerTrigger").map(_.toLong))
  }
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

class VersionedFeedSource(sqlContext: SQLContext, root: String,
                          table: StructType,
                          maxVersionsPerTrigger: Option[Long]) extends Source {
  import VersionedFeedSource._

  private val spark = sqlContext.sparkSession

  override val schema: StructType = feedSchema(table)

  /** Highest offset handed out so far — only used to pace
    * `maxVersionsPerTrigger`; correctness state lives in the query's own
    * checkpoint (getBatch re-primes this on recovery). */
  @volatile private var lastOffered: Option[Long] = None

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset on recovery
  }

  override def getOffset: Option[Offset] = {
    val vs = VersionedTable.versions(root)
    if (vs.isEmpty) None
    else {
      val head = vs.last
      val capped = maxVersionsPerTrigger match {
        case Some(m) =>
          val from = lastOffered.getOrElse(vs.head - 1)
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
    df.select(table.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } :+ col(ChangeType): _*)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    val startV = start.map(ver)
    lastOffered = Some(math.max(endV, lastOffered.getOrElse(Long.MinValue)))
    val readable = VersionedTable.versions(root)
    val inRange = readable.filter(v => startV.forall(v > _) && v <= endV)
    val slices = inRange.map { v =>
      val slice =
        if (readable.contains(v - 1))
          VersionedTable.changeFeed(spark, root, v - 1, v)
        else if (startV.isEmpty && v == readable.min)
          // fresh stream's initial snapshot: everything is an insert
          VersionedTable.read(spark, root, Some(v))
            .withColumn(ChangeType, lit("insert"))
        else
          throw new IllegalStateException(
            s"versioned-feed at $root: version ${v - 1} was retired by " +
              s"vacuum(keep) but the stream still needs changeFeed(${v - 1}, $v) " +
              "— increase source retention or restart the stream for a fresh snapshot")
      align(slice, v).withColumn(CommitVersion, lit(v))
    }
    val out =
      if (slices.nonEmpty) slices.reduce(_ unionByName _)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    org.apache.spark.sql.graft.StreamingShim.asStreaming(sqlContext, out)
  }

  override def stop(): Unit = ()
}
