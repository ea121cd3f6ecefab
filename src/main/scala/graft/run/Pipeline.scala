package graft.run

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.ControlTables
import graft.meta.ControlTables.LogEntry
import graft.operators._
import graft.sources.TableSource
import graft.util.Identifiers

/** Medallion pipeline driver (SURVEY §2.11 X1-X4, §3): Bronze → Silver →
  * Gold over a parquet warehouse directory, with layer prefixes
  * (`bronze_*`, `silver_*`, `silver_quarantine_*`, `gold_*`), audit
  * columns, execution logging, quarantine side-outputs, and
  * watermark-incremental re-runs (union+window merge upsert — same
  * observable semantics as Delta MERGE, SURVEY §7.1 fallback).
  *
  * Scale notes: the full-load path is one narrow projection per table
  * (identifier rename + audit) and one shuffle per silver table (the dedup
  * window). Writes repartition by the reference's volume policy to control
  * file counts (§4). Nothing collects to the driver except 1-row log frames
  * and scalar watermarks.
  */
final case class Warehouse(spark: SparkSession, root: String,
                           versioned: Boolean = true) {
  import graft.sources.VersionedTable

  /** Storage strategy, re-derived from the session (SURVEY §7.1): Delta
    * when genuinely available on this session, parquet emulation else.
    * In parquet mode the emulation is the engine's own
    * [[graft.sources.VersionedTable]] (default since round 10): every
    * write is a snapshot-isolated COMMIT, so the medallion's gold tables
    * get time travel ([[readAt]]), exactly-once appends, conflict-safe
    * OPTIMIZE ([[compact]]/[[clusterBy]]/[[zorderBy]] commit rewrites as
    * new versions) and vacuum from ONE code path — the Delta semantics
    * the reference runs, without the Delta jar. `versioned = false`
    * keeps the flat single-snapshot parquet layout; an EXISTING table
    * always keeps its own layout regardless of the flag, so mixed
    * warehouses stay readable. */
  val format: TableFormat = TableFormat.detect(spark)
  private def path(name: String) = s"$root/$name"

  /** True iff table `name` is (or, when absent, should be created as) a
    * versioned-layout table. Existing layout wins over the flag. */
  private def vt(name: String): Boolean =
    format == TableFormat.Parquet && {
      if (VersionedTable.isVersioned(path(name))) true
      else if (exists(name)) false // existing flat table stays flat
      else versioned
    }

  /** The reference's S14-style volume-adaptive file-count policy
    * (>1M rows => clamp(rows/150k, 4, 200) partitions, else rows/50k). */
  private def volumeParts(n: Long): Int =
    if (n > 1000000L) math.min(math.max(n / 150000L, 4L), 200L).toInt
    else math.max(n / 50000L, 1L).toInt

  def write(name: String, df: DataFrame, mode: SaveMode = SaveMode.Overwrite,
            partitionBy: Seq[String] = Nil): Long = {
    val out = df.persist()
    val n = out.count()
    // an APPEND onto an existing versioned table must match its committed
    // partition layout: a caller passing Nil inherits the layout (exactly
    // [[append]]'s guard — unpartitioned files committed into a partitioned
    // snapshot would give readers mixed directory depths), and a caller
    // passing a DIFFERENT layout is refused loudly (ADVICE r10)
    val effParts =
      if (mode == SaveMode.Append && vt(name) && VersionedTable.isVersioned(path(name))) {
        val committed = VersionedTable.partitionCols(path(name))
        if (partitionBy.isEmpty) committed
        else {
          require(partitionBy == committed,
            s"append to versioned table $name: partitionBy $partitionBy does " +
              s"not match the committed layout $committed")
          partitionBy
        }
      } else partitionBy
    val sized =
      if (effParts.nonEmpty)
        // physically cluster by the partition column so each Hive-style
        // directory gets few files (incremental MERGE then prunes by it)
        out.repartition(volumeParts(n), effParts.map(org.apache.spark.sql.functions.col): _*)
      else out.repartition(volumeParts(n))
    if (vt(name)) {
      if (mode == SaveMode.Append)
        VersionedTable.append(spark, path(name), sized, effParts)
      else VersionedTable.overwrite(spark, path(name), sized, effParts)
      ensureManifest(name)
    } else {
      val writer =
        if (effParts.nonEmpty) sized.write.partitionBy(effParts: _*)
        else sized.write
      writer.mode(mode).format(format.name).save(path(name))
    }
    out.unpersist()
    n
  }

  def append(name: String, df: DataFrame): Unit =
    if (vt(name)) {
      // preserve the table's committed partition layout on blind appends
      VersionedTable.append(spark, path(name), df,
        if (VersionedTable.isVersioned(path(name)))
          VersionedTable.partitionCols(path(name))
        else Nil)
      ensureManifest(name)
    } else df.write.mode(SaveMode.Append).format(format.name).save(path(name))

  def read(name: String): DataFrame =
    if (vt(name) && VersionedTable.isVersioned(path(name)))
      VersionedTable.read(spark, path(name))
    else spark.read.format(format.name).load(path(name))

  /** TIME TRAVEL: read table `name` at a pinned commit version — the
    * medallion table's own history, one code path with [[read]]
    * (versioned layout only). */
  def readAt(name: String, version: Long): DataFrame =
    VersionedTable.read(spark, path(name), Some(version))

  /** Committed versions of a versioned-layout table, ascending. */
  def versionsOf(name: String): Seq[Long] =
    VersionedTable.versions(path(name))

  /** Reclaim unreferenced data files; `keep = Some(n)` retires all but
    * the trailing n versions (their commit lists are tombstoned — time
    * travel to them fails fast). Safe by default: files younger than
    * [[graft.sources.VersionedTable.DefaultRetentionMs]] are spared;
    * pass `minAgeMs = 0` for immediate reclamation on a quiesced table. */
  def vacuum(name: String, keep: Option[Int] = None,
             minAgeMs: Long = VersionedTable.DefaultRetentionMs): Seq[String] =
    VersionedTable.vacuum(path(name), keep, minAgeMs)

  /** TIMESTAMP AS OF: read table `name` as of a commit timestamp
    * (newest commit at or before `tsMillis`; ties resolve to the
    * highest version — see
    * [[graft.sources.VersionedTable.timestampAsOf]]). */
  def readAsOfTimestamp(name: String, tsMillis: Long): DataFrame =
    VersionedTable.readAsOf(spark, path(name), tsMillis)

  /** Upgrade an existing FLAT table to the versioned layout in place
    * (files atomically moved under `data/`, committed as v0 — no data
    * rewritten; requires a quiesced table). The manifest peer is built
    * on the spot, so the converted table prunes immediately. */
  def convertToVersioned(name: String): Long = {
    val v = VersionedTable.convert(spark, path(name))
    ensureManifest(name)
    v
  }

  /** Zero-copy SHALLOW CLONE of versioned table `src` (at `version`,
    * default head) as new table `dst` — hard-linked bytes, decoupled
    * lifecycles; see [[graft.sources.VersionedTable.clone]]. */
  def cloneTable(src: String, dst: String, version: Option[Long] = None): Long = {
    val v = VersionedTable.clone(spark, path(src), path(dst), version)
    ensureManifest(dst)
    v
  }

  /** ADD a CHECK constraint to a versioned table (existing rows
    * validated first); every later write refuses a violating batch
    * before any data lands — see
    * [[graft.sources.VersionedTable.addCheckConstraint]]. */
  def addCheckConstraint(name: String, constraint: String, sqlExpr: String): Long =
    VersionedTable.addCheckConstraint(spark, path(name), constraint, sqlExpr)

  /** DROP a CHECK constraint by name. */
  def dropCheckConstraint(name: String, constraint: String): Long =
    VersionedTable.dropCheckConstraint(spark, path(name), constraint)

  /** The table's committed CHECK constraints (name → SQL expression). */
  def checkConstraintsOf(name: String): Map[String, String] =
    VersionedTable.checkConstraints(path(name))

  /** Declare a column GENERATED AS a SQL expression: later batches may
    * omit it (the table derives it — e.g. a fact's partition year from
    * its date); carried wrong values are refused whole. See
    * [[graft.sources.VersionedTable.addGeneratedColumn]]. */
  def addGeneratedColumn(name: String, col: String, sqlExpr: String): Long =
    VersionedTable.addGeneratedColumn(spark, path(name), col, sqlExpr)

  /** Un-declare a generated column (schema and data keep the column). */
  def dropGeneratedColumn(name: String, col: String): Long =
    VersionedTable.dropGeneratedColumn(spark, path(name), col)

  /** DESCRIBE HISTORY of a versioned table: one row per commit
    * (readable and retired) from the protocol's own metadata —
    * timestamp and operation kind included. */
  def historyOf(name: String): DataFrame =
    VersionedTable.history(spark, path(name))

  /** CHANGE FEED between two committed versions of a versioned table —
    * row-level inserts/deletes from the file-level commit diff (only
    * files added or removed between the versions are read); see
    * [[graft.sources.VersionedTable.changeFeed]]. */
  def changeFeed(name: String, fromVersion: Long, toVersion: Long): DataFrame =
    VersionedTable.changeFeed(spark, path(name), fromVersion, toVersion)

  /** RESTORE a versioned table to an old version as a NEW commit (no
    * data copied; history preserved); the manifest re-syncs to the
    * restored snapshot. */
  def restoreVersion(name: String, version: Long): Long = {
    val v = VersionedTable.restore(spark, path(name), version)
    ensureManifest(name)
    v
  }

  /** BOUNDED OPTIMIZE (`OPTIMIZE ... WHERE`): Z-order only the files the
    * boxes may intersect — cluster the hot region without a whole-table
    * rewrite. Reuses and refreshes the persisted manifest. */
  def optimizeWhere(name: String, zorderCols: Seq[String], numFiles: Int,
                    ranges: Seq[graft.sources.SkippingIndex.ColRange],
                    strRanges: Seq[graft.sources.SkippingIndex.StrRange] = Nil)
      : (Long, Int, Int) = {
    import graft.sources.SkippingIndex
    val mPath = path(name + "__manifest")
    val cached =
      if (new java.io.File(mPath).exists())
        Some(SkippingIndex.readManifest(spark, mPath))
      else None
    val r = VersionedTable.optimizeWhere(spark, path(name), zorderCols, numFiles,
      ranges, strRanges, cached)
    ensureManifest(name)
    r
  }

  /** SMALL-FILE COMPACTION: bin-pack only files under `minBytes` toward
    * `targetBytes` outputs — a streaming sink's per-epoch file trail
    * compacts for the cost of the small files alone. */
  def compactSmall(name: String, minBytes: Long,
                   targetBytes: Long = 128L * 1024 * 1024): (Long, Int, Int) = {
    val r = VersionedTable.compactSmall(spark, path(name), minBytes, targetBytes)
    ensureManifest(name)
    r
  }

  /** Read a versioned table with its `_commit_version` provenance
    * column — see [[graft.sources.VersionedTable.readWithProvenance]]. */
  def readWithProvenance(name: String, version: Option[Long] = None): DataFrame =
    VersionedTable.readWithProvenance(spark, path(name), version)

  /** CHANGE FEED between two timestamps (TIMESTAMP AS OF resolution on
    * both bounds) — see [[graft.sources.VersionedTable.changeFeedAsOf]]. */
  def changeFeedAsOf(name: String, fromTsMillis: Long, toTsMillis: Long): DataFrame =
    VersionedTable.changeFeedAsOf(spark, path(name), fromTsMillis, toTsMillis)

  /** INCREMENTAL CLONE SYNC: bring a mirror table up to `name`'s head,
    * hard-linking only the churn — see
    * [[graft.sources.VersionedTable.cloneSync]]. `dstPath` is an
    * absolute root (mirrors usually live outside the warehouse). */
  def cloneSyncTo(name: String, dstPath: String): Long =
    VersionedTable.cloneSync(spark, path(name), dstPath)

  /** METADATA-ONLY RENAME COLUMN on a versioned table — one commit, zero
    * files rewritten; old versions time-travel under their own names.
    * The persisted manifest needs no rebuild: its stats are keyed by the
    * files' PHYSICAL columns, which a rename never changes (pruned reads
    * and bounded DML map logical names through the snapshot mapping). */
  def renameColumn(name: String, from: String, to: String): Long =
    VersionedTable.renameColumn(spark, path(name), from, to)

  /** METADATA-ONLY DROP COLUMN on a versioned table — the bytes stay
    * (RESTORE un-drops); the next OPTIMIZE/compact physically purges the
    * column from the files it rewrites. */
  def dropColumn(name: String, colName: String): Long =
    VersionedTable.dropColumn(spark, path(name), colName)

  /** Bounded DELETE WHERE (range-box predicate) on a versioned table:
    * files whose stats exclude the box carry untouched, only
    * possibly-matching files rewrite — see
    * [[graft.sources.VersionedTable.deleteWhere]]. Reuses the table's
    * persisted `__manifest` when present (no footer re-pass) and
    * refreshes it after the commit. Returns (version, rewrittenFiles,
    * carriedFiles). */
  def deleteWhere(name: String,
                  ranges: Seq[graft.sources.SkippingIndex.ColRange],
                  strRanges: Seq[graft.sources.SkippingIndex.StrRange] = Nil)
      : (Long, Int, Int) = {
    import graft.sources.SkippingIndex
    val mPath = path(name + "__manifest")
    val cached =
      if (new java.io.File(mPath).exists())
        Some(SkippingIndex.readManifest(spark, mPath))
      else None
    val r = VersionedTable.deleteWhere(spark, path(name), ranges, strRanges, cached)
    ensureManifest(name)
    r
  }

  /** GENERAL-PREDICATE DELETE on a versioned table: `predicate` is the
    * exact row filter (IN-lists, LIKE, disjunctions — any `Column`);
    * `pruneRanges`/`pruneStrRanges` are the conservative bounding boxes
    * that decide which files can possibly match (caller contract: the
    * predicate must imply the boxes — see
    * [[graft.sources.VersionedTable.deleteWherePredicate]]). Empty boxes
    * rewrite every file (always correct, never bounded). Reuses and
    * refreshes the table's persisted manifest like [[deleteWhere]]. */
  def deleteWherePredicate(name: String, predicate: Column,
                           pruneRanges: Seq[graft.sources.SkippingIndex.ColRange] = Nil,
                           pruneStrRanges: Seq[graft.sources.SkippingIndex.StrRange] = Nil)
      : (Long, Int, Int) = {
    import graft.sources.SkippingIndex
    val mPath = path(name + "__manifest")
    val cached =
      if (new java.io.File(mPath).exists())
        Some(SkippingIndex.readManifest(spark, mPath))
      else None
    val r = VersionedTable.deleteWherePredicate(spark, path(name), predicate,
      pruneRanges, pruneStrRanges, cached)
    ensureManifest(name)
    r
  }

  /** Bounded UPDATE ... SET on a versioned table — the DML twin of
    * [[deleteWherePredicate]]: `predicate` is the exact row filter,
    * `set` maps column → new-value expression (cast to the committed
    * type; generated columns re-derive, CHECK constraints re-validate),
    * and the boxes are the pruning hint deciding which files can
    * possibly match (predicate ⇒ boxes; empty boxes rewrite every
    * file). Reuses and refreshes the table's persisted manifest like
    * [[deleteWhere]]. Returns (version, rewrittenFiles, carriedFiles). */
  def updateWhere(name: String, predicate: Column, set: Map[String, Column],
                  pruneRanges: Seq[graft.sources.SkippingIndex.ColRange] = Nil,
                  pruneStrRanges: Seq[graft.sources.SkippingIndex.StrRange] = Nil)
      : (Long, Int, Int) = {
    import graft.sources.SkippingIndex
    val mPath = path(name + "__manifest")
    val cached =
      if (new java.io.File(mPath).exists())
        Some(SkippingIndex.readManifest(spark, mPath))
      else None
    val r = VersionedTable.updateWhere(spark, path(name), predicate, set,
      pruneRanges, pruneStrRanges, cached)
    ensureManifest(name)
    r
  }

  /** KEY-LIST DELETE on a versioned table — the redaction-list shape:
    * remove every row whose `keyCol` equals a key in `keys` (a
    * DataFrame; NOT-EXISTS semantics, NULL target keys kept). Pruning
    * derives from the list itself: global box + exact per-file point
    * probe — see [[graft.sources.VersionedTable.deleteWhereKeys]].
    * Reuses and refreshes the persisted manifest. */
  def deleteWhereKeys(name: String, keyCol: String, keys: DataFrame)
      : (Long, Int, Int) = {
    import graft.sources.SkippingIndex
    val mPath = path(name + "__manifest")
    val cached =
      if (new java.io.File(mPath).exists())
        Some(SkippingIndex.readManifest(spark, mPath))
      else None
    // a Bloom sidecar on the key column joins the prune automatically —
    // the stage that bounds a HASHED-key redaction list
    val r = VersionedTable.deleteWhereKeys(spark, path(name), keyCol, keys,
      cached, bloom = bloomIndexesOf(name).get(keyCol))
    ensureManifest(name)
    r
  }

  /** FULL-FORM MERGE INTO on a versioned table (WHEN MATCHED UPDATE /
    * WHEN MATCHED DELETE / WHEN NOT MATCHED INSERT): file pruning comes
    * from the SOURCE batch's own key min/max, so a small CDC batch
    * rewrites only the files its keys can live in. Clause conditions
    * address `t.<col>` / `s.<col>` — see
    * [[graft.sources.VersionedTable.mergeInto]]. Reuses and refreshes
    * the table's persisted manifest. Returns (version, rewrittenFiles,
    * carriedFiles). */
  def mergeInto(name: String, source: DataFrame, keys: Seq[String],
                updateWhen: Option[Column],
                deleteWhen: Option[Column] = None,
                insertWhen: Option[Column] = None): (Long, Int, Int) = {
    import graft.sources.SkippingIndex
    val mPath = path(name + "__manifest")
    val cached =
      if (new java.io.File(mPath).exists())
        Some(SkippingIndex.readManifest(spark, mPath))
      else None
    // Bloom sidecars on merge-key columns join the stage-2 prune — the
    // path that bounds a hashed-key CDC batch
    val r = VersionedTable.mergeInto(spark, path(name), source, keys,
      updateWhen, deleteWhen, insertWhen, cached,
      bloom = bloomIndexesOf(name).filter(kv => keys.contains(kv._1)))
    ensureManifest(name)
    r
  }

  /** S11 — MERGE upsert by business key, incoming side winning under
    * `versionCols`. Delta mode: native `MERGE INTO` (rewrites only matched
    * files; the incoming batch is pre-deduped per key because SQL MERGE
    * rejects duplicate source matches, and schema-aligned to the target
    * because `UPDATE SET * / INSERT *` rejects column drift the parquet
    * emulation tolerates). Parquet mode: the proven union+window emulation,
    * staged to a scratch table before overwriting so the plan never reads
    * the files it is replacing. When `partitionBy` is set, the merge is
    * PARTITION-PRUNED: only the directories whose partition values appear
    * in the incoming batch are read, merged, and rewritten (dynamic
    * partition overwrite) — at 100 TB this is the difference between a
    * bounded nightly job and a full-table rewrite per run. Contract: a
    * business key must never move between partitions (the reference's
    * year columns derive from immutable document dates). Same observable
    * table either way. */
  def mergeUpsert(name: String, incoming: DataFrame, keys: Seq[String],
                  versionCols: Seq[Column], partitionBy: Seq[String] = Nil): Long =
    format match {
      case TableFormat.Delta =>
        // per-call view name: two concurrent merges on one session must
        // not silently swap each other's source rows
        val view = s"__graft_merge_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        graft.operators.Dedup.keepLatest(alignToTarget(name, incoming), keys, versionCols)
          .createOrReplaceTempView(view)
        try {
          spark.sql(TableFormat.mergeSql(path(name), view, keys))
          read(name).count()
        } finally spark.catalog.dropTempView(view)
      case TableFormat.Parquet =>
        val touched = touchedPartitions(incoming, partitionBy)
        touched match {
          case Some(Nil) => read(name).count() // empty batch: no-op merge
          case Some(parts) => prunedMerge(name, incoming, keys, versionCols, partitionBy, parts)
          case None if vt(name) =>
            // versioned merge-as-new-version: the union+window plan READS
            // the current snapshot's immutable files while the commit
            // WRITES fresh ones — no staging table, no checkpoint, no
            // double write; the old snapshot stays time-travelable.
            // DECISION RECORD (r11): this unpartitioned branch stays a
            // full rewrite even though [[VersionedTable.mergeInto]] could
            // bound it — the incoming-wins-under-arbitrary-versionCols
            // tie rule would need a lexicographic clause derived from
            // SortOrder internals, and the medallion's big tables are
            // partitioned (the pruned branch above); callers with a
            // single monotonic version column should use
            // [[mergeInto]] directly for the bounded path.
            val merged = graft.operators.Dedup.mergeUpsert(read(name), incoming, keys, versionCols)
            write(name, merged, partitionBy = partitionBy)
          case None =>
            val merged = graft.operators.Dedup.mergeUpsert(read(name), incoming, keys, versionCols)
            val staged = merged.persist()
            val n = staged.count() // materialize before overwriting the plan's source
            val staging = s"${name}__staging"
            write(staging, staged, partitionBy = partitionBy)
            staged.unpersist()
            write(name, castTo(read(staging), merged.schema), partitionBy = partitionBy)
            delete(staging) // scratch space, not a table: must not linger
            n
        }
    }

  /** Undo partition-column type inference on a staging re-read: directory
    * names carry no types, so a re-read can drift a partition column (an
    * all-null partition even comes back VOID, which cannot be written) —
    * cast every column back to the schema the merge computed. */
  private def castTo(df: DataFrame,
                     schema: org.apache.spark.sql.types.StructType): DataFrame =
    df.select(schema.fields.map(f =>
      org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)

  /** Delta `UPDATE SET * / INSERT *` requires source columns ≡ target
    * columns: project incoming onto the target schema (null-fill missing,
    * drop extras) so schema-drifting batches behave like the parquet
    * emulation's `unionByName(allowMissingColumns = true)`. */
  private[graft] def alignToTarget(name: String, incoming: DataFrame): DataFrame = {
    val have = incoming.columns.toSet
    val cols = read(name).schema.fields.map { f =>
      if (have.contains(f.name)) org.apache.spark.sql.functions.col(f.name)
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }
    incoming.select(cols.toIndexedSeq: _*)
  }

  /** The distinct partition-value rows of the incoming batch, collected so
    * the target scan can prune with LITERAL predicates (a semi join would
    * still list every directory). Cardinality is bounded by the number of
    * touched partitions (years, not rows), so the collect is scale-safe;
    * above `MaxPrunedPartitions` we fall back to the full merge rather
    * than build a degenerate thousand-term predicate. None = pruning not
    * applicable (unpartitioned, missing target, or too many partitions). */
  private def touchedPartitions(incoming: DataFrame,
                                partitionBy: Seq[String]): Option[Seq[org.apache.spark.sql.Row]] = {
    if (partitionBy.isEmpty) return None
    val rows = incoming.select(partitionBy.map(org.apache.spark.sql.functions.col): _*)
      .distinct().limit(Warehouse.MaxPrunedPartitions + 1).collect().toSeq
    if (rows.size > Warehouse.MaxPrunedPartitions) None else Some(rows)
  }

  /** Partition-pruned parquet merge: union+window over ONLY the touched
    * partitions, staged, then committed with dynamic partition overwrite so
    * untouched directories keep their files byte-for-byte. */
  private def prunedMerge(name: String, incoming: DataFrame, keys: Seq[String],
                          versionCols: Seq[Column], partitionBy: Seq[String],
                          parts: Seq[org.apache.spark.sql.Row]): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    // null-safe equality: a NULL partition value (the default-partition
    // directory) must select the target's matching rows too, or dynamic
    // overwrite would replace that directory with only the incoming rows
    val prunePred = parts.map { r =>
      partitionBy.zipWithIndex.map { case (c, i) => col(c) <=> lit(r.get(i)) }
        .reduce(_ && _)
    }.reduce(_ || _)
    val restricted = read(name).filter(prunePred)
    val merged = graft.operators.Dedup.mergeUpsert(restricted, incoming, keys, versionCols)
    if (vt(name)) {
      // versioned dynamic partition overwrite: ONE commit replaces exactly
      // the touched partition directories' files (untouched directories
      // carry their files byte-for-byte into the new snapshot); the plan
      // reads the old immutable files while writing new ones, so the
      // staging/persist dance of the flat path disappears. One output
      // file per touched directory; compaction owns long-term counts.
      VersionedTable.overwritePartitions(spark, path(name),
        merged.repartition(partitionBy.map(col): _*), partitionBy)
      ensureManifest(name)
      return read(name).count()
    }
    val staging = s"${name}__staging"
    val staged = merged.persist()
    staged.count() // materialize before touching the target's files
    write(staging, staged, partitionBy = partitionBy)
    staged.unpersist()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // one output file per touched directory (repartition by the partition
      // cols); compaction owns long-term file counts
      castTo(read(staging), merged.schema).repartition(partitionBy.map(col): _*)
        .write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
        .format(format.name).save(path(name))
    } finally prev.fold(spark.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
      v => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v))
    delete(staging)
    read(name).count()
  }

  /** Recursively remove a table directory (scratch cleanup). */
  private def delete(name: String): Unit =
    deepDelete(new java.io.File(path(name)))

  /** Bucketed write through the session catalog: both fact tables bucketed
    * on the join key join WITHOUT a shuffle (Exchange elided) — the 100 TB
    * answer for the recurring lineitem⋈orders co-location (SURVEY §4). Only
    * `saveAsTable` persists bucket metadata, hence the catalog path.
    *
    * DECISION RECORD (r11): this is the ONE write path deliberately
    * outside [[graft.sources.VersionedTable]], trading time travel for
    * shuffle elision. Bucket metadata lives in the session catalog keyed
    * by TABLE LOCATION, and Spark's scan only honors it when the relation
    * is resolved through the catalog — a versioned read hands Spark an
    * explicit FILE LIST, which drops `outputPartitioning` and the
    * Exchange returns, defeating the only reason to bucket. Versioning
    * the layout underneath (bucket spec as a commit header) would
    * therefore version bytes nobody can exploit: every co-located join
    * would still shuffle unless we also re-implemented catalog
    * resolution over commit lists. Bucketed tables here are REBUILD
    * artifacts (recluster of a fact pair for a recurring join), not
    * systems of record — their history is the upstream versioned table
    * they derive from. If a future Spark exposes bucket metadata on
    * file-list scans, fold this path into the versioned layer then.
    * BucketingSpec pins the no-Exchange plan so the trade keeps paying. */
  def writeBucketed(table: String, df: DataFrame, buckets: Int,
                    bucketCols: Seq[String]): Long = {
    val out = df.persist()
    val n = out.count()
    out.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .option("path", path(table))
      .format("parquet")
      .saveAsTable(table)
    out.unpersist()
    n
  }

  /** Single-pass data-quality metrics: attaches an `Observation` so the
    * metric aggregates ride the SAME job that materializes the write. A
    * separate metrics query re-reads the table it just wrote — at 100 TB
    * that second scan can cost as much as the load; this one is free
    * (per-partition accumulators folded on the driver, no extra job, no
    * shuffle). Returns (rows written, metric name → value). */
  def writeObserved(name: String, df: DataFrame, metrics: Seq[Column],
                    partitionBy: Seq[String] = Nil): (Long, Map[String, Any]) = {
    require(metrics.nonEmpty, "writeObserved needs at least one metric column")
    val obs = org.apache.spark.sql.Observation(
      s"dq_${name}_${System.nanoTime()}") // names must be unique per query
    val n = write(name, df.observe(obs, metrics.head, metrics.tail: _*),
      partitionBy = partitionBy)
    (n, obs.get)
  }

  /** Cost-based-optimizer statistics: register `name` as an external
    * catalog table over its warehouse path and `ANALYZE` it (row count +
    * per-column NDV / min / max / null counts). With
    * `spark.sql.cbo.enabled` (+`joinReorder.enabled`), Catalyst orders
    * multi-way joins and picks broadcast sides from ESTIMATED cardinality
    * after predicates, not raw file size — on a 100 TB star, the
    * difference between broadcasting a filtered dim and shuffling the
    * fact. Bare-path parquet scans only ever expose `sizeInBytes`; the
    * catalog route is how a plain-parquet deployment gets real stats.
    * Re-run after each load; `REFRESH` first so cached file listings
    * never go stale. */
  def analyze(name: String, columns: Seq[String] = Nil): Unit = {
    // A catalog table is LOCATION-addressed — it cannot express a commit's
    // file list. For a versioned table the data dir IS the snapshot right
    // after a write (and again after vacuum(keep=1)); in between, older
    // versions' files would leak into the catalog scan, so refuse loudly
    // rather than register a table that reads resurrected rows.
    val loc =
      if (VersionedTable.isVersioned(path(name))) {
        val snapshot = VersionedTable.dataFiles(path(name)).toSet
        val onDisk = {
          def walk(f: java.io.File, rel: String): Seq[String] =
            Option(f.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap { c =>
              val r = if (rel.isEmpty) c.getName else s"$rel/${c.getName}"
              if (c.isDirectory) walk(c, r)
              else if (c.getName.endsWith(".parquet")) Seq(s"data/$r") else Nil
            }
          walk(new java.io.File(s"${path(name)}/data"), "").toSet
        }
        require(onDisk == snapshot,
          s"analyze($name): data dir holds ${onDisk.size} files but the " +
            s"snapshot lists ${snapshot.size} — run vacuum(\"$name\", keep = Some(1)) " +
            "first so the catalog location equals the snapshot")
        // a raw-location catalog table would expose PHYSICAL names — a
        // renamed/dropped table cannot be registered truthfully this way
        val (ren, dr) = VersionedTable.columnMapping(path(name))
        require(ren.isEmpty && dr.isEmpty,
          s"analyze($name): the table carries a column mapping " +
            s"(renames ${ren.values.mkString(",")} / dropped ${dr.mkString(",")}) " +
            "that a location-addressed catalog table cannot express; " +
            "OPTIMIZE then overwrite to materialize the logical names first")
        s"${path(name)}/data"
      } else path(name)
    // DROP + CREATE, not IF NOT EXISTS: a name registered earlier against
    // a DIFFERENT warehouse root would silently keep its old location and
    // the stats would describe the wrong table. LOCATION makes the table
    // external, so the drop never touches data files.
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"CREATE TABLE `$name` USING ${format.name} " +
      s"LOCATION '$loc'")
    spark.sql(s"REFRESH TABLE `$name`")
    val cols =
      if (columns.nonEmpty) s"FOR COLUMNS ${columns.map(c => s"`$c`").mkString(", ")}"
      else "FOR ALL COLUMNS"
    spark.sql(s"ANALYZE TABLE `$name` COMPUTE STATISTICS $cols")
  }

  /** S14 — compaction: Delta OPTIMIZE when native; versioned parquet
    * commits the rewrite as a NEW version through the conflict-safe
    * [[graft.sources.VersionedTable.rewrite]] (old files stay for time
    * travel until [[vacuum]], txn headers carry over, and a concurrent
    * overwrite aborts-and-restarts the compaction instead of being
    * resurrected); flat parquet rewrites in place. Same observable table
    * in every mode. */
  def compact(name: String): Long = format match {
    case TableFormat.Delta =>
      spark.sql(TableFormat.optimizeSql(path(name)))
      read(name).count()
    case TableFormat.Parquet if vt(name) =>
      val n = read(name).count()
      val pcols = partitionColsOf(name)
      VersionedTable.rewrite(spark, path(name), pcols) { df =>
        // preserve the physical partition layout: compacting a year-
        // partitioned fact into a flat directory would destroy partition
        // pruning for every later merge and date-range scan
        if (pcols.nonEmpty)
          df.repartition(volumeParts(n), pcols.map(org.apache.spark.sql.functions.col): _*)
        else df.repartition(volumeParts(n))
      }
      ensureManifest(name)
      n
    case TableFormat.Parquet =>
      val staged = read(name).localCheckpoint(true) // cut lineage off old files
      write(name, staged, partitionBy = partitionColsOf(name))
  }

  /** Data-layout clustering for scan pruning — the parquet-mode answer to
    * Delta's `OPTIMIZE ... ZORDER BY`: rewrite the table range-partitioned
    * AND sorted by `cols`, so each output file covers a narrow value range
    * and the parquet min/max footer stats let the reader skip whole files /
    * row groups for range predicates (the dominant access pattern on a
    * 100 TB time-series fact). Single-key range clustering — compose with
    * `partitionBy` directories for coarse pruning above it. Preserves the
    * existing partition layout. */
  def clusterBy(name: String, cols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.{col => c}
    val parts = partitionColsOf(name)
    val n = read(name).count()
    val nFiles = math.max(volumeParts(n), 4)
    def cluster(df: DataFrame): DataFrame =
      df.repartitionByRange(nFiles, cols.map(c): _*)
        .sortWithinPartitions(cols.map(c): _*)
    if (vt(name)) {
      // OPTIMIZE-as-a-commit: the clustered rewrite lands as a new
      // version (conflict-safe, time-travelable, txn headers carried)
      VersionedTable.rewrite(spark, path(name), parts)(cluster)
      ensureManifest(name)
    } else {
      val staged = read(name).localCheckpoint(true) // cut lineage off old files
      val writer = cluster(staged).write.mode(SaveMode.Overwrite)
      (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
        .format(format.name).save(path(name))
    }
    n
  }

  /** MULTI-column data-layout clustering: Morton (Z-order) interleave —
    * the parquet-mode analogue of Delta's `OPTIMIZE ... ZORDER BY` proper,
    * where [[clusterBy]] covers the single-key case. Each column is
    * rank-normalized to a `bits`-bit bucket index against its own
    * approximate-quantile cutpoints (a distributed sketch; only the
    * ~2^bits cutpoints reach the driver — rank normalization keeps bucket
    * occupancy uniform under skew, where uniform-width buckets would
    * collapse), the per-column bucket bits are interleaved into one Morton
    * key, and the table is rewritten range-partitioned + sorted by it. A
    * range predicate on ANY of the clustered columns then skips most files
    * on parquet footer min/max stats — the layout for a 100 TB fact probed
    * by several independent dimensions. Numeric columns only (non-numeric
    * and NULL values bucket to 0 and cluster at the low end). Preserves
    * the Hive partition layout above it. */
  def zorderBy(name: String, cols: Seq[String], bits: Int = 8,
               targetFiles: Option[Int] = None): Long = {
    require(cols.size >= 2, "zorderBy wants 2+ columns; use clusterBy for one")
    require(bits * cols.size <= 62, s"bits=$bits over ${cols.size} cols overflows a long")
    val parts = partitionColsOf(name)
    val n = read(name).count()
    val nBuckets = 1 << bits
    val nFiles = targetFiles.getOrElse(math.max(volumeParts(n), 4))
    def cluster(src: DataFrame): DataFrame = {
      val cuts: Seq[Array[Double]] = cols.map { c =>
        src.stat.approxQuantile(c,
          (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.01)
      }
      // bucket = #cutpoints <= value; a NULL value nulls every comparison,
      // the filter drops them all, and the row lands in bucket 0
      def bucket(c: String, cut: Array[Double]): Column =
        size(org.apache.spark.sql.functions.filter(typedlit(cut.toSeq),
          x => col(c).cast("double") >= x)).cast("long")
      val zval = cols.indices.map { i =>
        val bk = bucket(cols(i), cuts(i))
        (0 until bits).map { b =>
          shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)), b * cols.size + i)
        }.reduce(_ bitwiseOR _)
      }.reduce(_ bitwiseOR _)
      src.withColumn("__z", zval)
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
    }
    if (vt(name)) {
      VersionedTable.rewrite(spark, path(name), parts)(cluster)
      ensureManifest(name)
    } else {
      val staged = read(name).localCheckpoint(true) // cut lineage off old files
      val writer = cluster(staged).write.mode(SaveMode.Overwrite)
      (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
        .format(format.name).save(path(name))
    }
    n
  }

  /** Partition columns of an existing table: from the committed file
    * paths for a versioned table (no directory walk — dead files of old
    * versions must not speak for the snapshot), else discovered from the
    * Hive-style directory layout (`col=value` nesting) — the physical
    * partitioning a plain `read` → `write` round-trip would otherwise
    * flatten. */
  def partitionColsOf(name: String): Seq[String] = {
    if (VersionedTable.isVersioned(path(name)))
      return VersionedTable.partitionCols(path(name))
    @annotation.tailrec
    def walk(dir: java.io.File, acc: List[String]): List[String] = {
      val sub = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
        .filter(f => f.isDirectory && f.getName.contains("="))
      sub.headOption match {
        case Some(d) => walk(d, d.getName.takeWhile(_ != '=') :: acc)
        case None => acc
      }
    }
    walk(new java.io.File(path(name)), Nil).reverse
  }
  def exists(name: String): Boolean = new java.io.File(path(name)).exists()
  /** S5 — catalog listing by layer prefix; metadata tables and merge
    * scratch space excluded (`gold_x__staging` starts with `gold_` but is
    * not a table — without the exclusion an incremental run would leak
    * staging dirs into listings and warehouse copies). */
  def list(prefix: String): Seq[String] = {
    val f = new java.io.File(root)
    Option(f.list()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.startsWith(prefix))
      .filterNot(n => n.endsWith("_execution_log") || n.endsWith("_control") ||
        n.endsWith("__staging") || n.endsWith("__manifest") ||
        n.contains("__bloom_"))
      .sorted
  }

  // ---- write-time skipping manifests (SkippingIndex, deployed shape) ----

  /** Build or incrementally refresh the file-skipping manifest for a
    * stored table, persisted as the peer table `<name>__manifest`
    * (outside the data dir, so data readers and the lister see nothing
    * new; excluded from [[list]] like the other metadata tables). Call
    * after [[write]]/[[mergeUpsert]]/[[append]] lands a table — an
    * existing manifest footer-passes ONLY files it has never seen and
    * forgets vanished ones, so the nightly refresh costs O(files the
    * run touched). `cols` is used on first build; refreshes keep the
    * manifest's column set. */
  def refreshManifest(name: String, cols: Seq[String]): Unit = {
    import graft.sources.SkippingIndex
    val mPath = path(name + "__manifest")
    val m =
      if (VersionedTable.isVersioned(path(name))) {
        // snapshot-scoped: the committed file list is the universe, so
        // dead files of older versions are never indexed (and a file
        // carried unchanged across commits is never re-footer-passed)
        val files = snapshotFiles(name)
        if (new java.io.File(mPath).exists())
          SkippingIndex.refreshManifestFor(spark, files,
            SkippingIndex.readManifest(spark, mPath))
        else SkippingIndex.manifestFor(spark, files, cols)
      } else if (new java.io.File(mPath).exists())
        SkippingIndex.refreshManifest(spark, path(name),
          SkippingIndex.readManifest(spark, mPath))
      else SkippingIndex.manifest(spark, path(name), cols)
    SkippingIndex.writeManifest(spark, m, mPath)
  }

  /** `(absolute, relative)` data files of a versioned table's current
    * snapshot; relative names are commit-list names (`data/…`), so a
    * manifest keyed by them survives commits that keep files. */
  private def snapshotFiles(name: String): Seq[(String, String)] =
    VersionedTable.dataFiles(path(name)).map(rel => (s"${path(name)}/$rel", rel))

  // ---- per-file Bloom indexes (hashed-key pruning, deployed shape) ----

  private def bloomPath(name: String, col: String) = path(s"${name}__bloom_$col")

  /** Build (or rebuild from scratch) the per-file Bloom sidecar for
    * `name`.`col` — the prune path for HASHED/RANDOM keys, where min/max
    * stats keep every file ([[graft.sources.BloomIndex]]). Persisted as
    * the peer table `<name>__bloom_<col>` (excluded from [[list]] like
    * the manifest); once present, every versioned write REFRESHES it at
    * O(new files) and [[deleteWhereKeys]]/[[mergeInto]] consult it
    * automatically. Rebuild after a column RENAME (the sidecar is keyed
    * by the logical name at build time). */
  def buildBloomIndex(name: String, col: String, fpp: Double = 1e-4): Unit = {
    import graft.sources.BloomIndex
    require(vt(name), s"bloom indexes live on versioned tables: $name")
    val (ren, _) = VersionedTable.columnMapping(path(name))
    val phys = ren.find(_._2 == col).map(_._1).getOrElse(col)
    BloomIndex.writeIndex(spark,
      BloomIndex.indexFor(spark, snapshotFiles(name), phys, fpp),
      bloomPath(name, col))
  }

  /** The table's Bloom sidecar directories on disk: logical column name
    * (as built) → sidecar path. */
  private def bloomSidecarPaths(name: String): Map[String, String] = {
    val pfx = s"${name}__bloom_"
    Option(new java.io.File(root).list()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(n => n.startsWith(pfx) && !n.endsWith("__tmp") && !n.endsWith("__old"))
      .map(n => n.stripPrefix(pfx) -> path(n))
      .toMap
  }

  /** The table's Bloom sidecars on disk: logical column name (as built)
    * → lazily-read index. */
  private def bloomIndexesOf(name: String)
      : Map[String, org.apache.spark.sql.Dataset[graft.sources.BloomIndex.FileBloom]] =
    bloomSidecarPaths(name).map { case (c, p) =>
      c -> graft.sources.BloomIndex.readIndex(spark, p)
    }

  /** Bloom-on-commit: refresh every existing sidecar against the new
    * snapshot — carried files keep their filters verbatim, only the
    * commit's NEW files pay a build, and an unchanged snapshot skips
    * the rewrite entirely. The refresh writes beside the sidecar and
    * swaps, so a reader never sees a half-written index. */
  private def ensureBloomIndexes(name: String): Unit = {
    import graft.sources.BloomIndex
    import spark.implicits._
    val sidecars = bloomIndexesOf(name)
    if (sidecars.isEmpty) return
    val cur = snapshotFiles(name)
    // a sidecar the new snapshot can no longer SERVE (its column was
    // dropped or retyped by the write that just committed) is dead
    // derived metadata: drop it (unindexed ⇒ verbs keep every candidate
    // — sound) rather than throw post-commit and poison later writes.
    // The check is a cheap schema probe, SEPARATE from refresh failures:
    // a transient refresh error (spilled tmp write, lost executor) must
    // NOT delete a healthy sidecar — a stale one is sound (carried rows
    // drop and new files index on the next successful refresh)
    val schema = VersionedTable.logicalSchema(path(name))
      .orElse(scala.util.Try(read(name).schema).toOption)
    sidecars.foreach { case (col, idx) =>
      val serveable = schema.exists(s => s.fieldNames.contains(col) &&
        scala.util.Try(graft.sources.BloomIndex.kindOf(
          s(s.fieldIndex(col)).dataType)).isSuccess)
      if (!serveable) deepDelete(new java.io.File(bloomPath(name, col)))
      else try {
        val have = idx.select("file").as[String].collect().toSet
        if (have.isEmpty) {
          // an index built over an empty snapshot carries no (column,
          // fpp) row to refresh from — rebuild whole once data exists,
          // so the sidecar starts indexing the moment the table does
          if (cur.nonEmpty) buildBloomIndex(name, col)
        } else if (have != cur.map(_._2).toSet) {
          // write-then-swap, healthy sidecar deleted only AFTER the
          // replacement is in place (ADVICE r12: the old delete-then-
          // rename order silently lost the sidecar when renameTo
          // failed, dropping all bloom pruning with no signal)
          val live = new java.io.File(bloomPath(name, col))
          val tmp = new java.io.File(bloomPath(name, col) + "__tmp")
          val old = new java.io.File(bloomPath(name, col) + "__old")
          BloomIndex.writeIndex(spark, BloomIndex.refreshFor(spark, cur, idx),
            tmp.getPath)
          deepDelete(old) // leftover of a prior crash — inert, clear it
          if (!live.renameTo(old))
            throw new java.io.IOException(s"could not set aside $live")
          if (!tmp.renameTo(live)) {
            old.renameTo(live) // restore the healthy sidecar
            throw new java.io.IOException(s"could not publish $tmp")
          }
          deepDelete(old)
        }
      } catch {
        case _: Exception => // transient: keep the (stale-but-sound) sidecar
          deepDelete(new java.io.File(bloomPath(name, col) + "__tmp"))
          // if the set-aside happened but publish failed AND restore
          // failed, the old sidecar survives under __old — recover it
          val live = new java.io.File(bloomPath(name, col))
          val old = new java.io.File(bloomPath(name, col) + "__old")
          if (!live.exists() && old.exists()) { old.renameTo(live); () }
      }
    }
  }

  /** Recursive delete (files-then-dirs); missing paths are a no-op. */
  private def deepDelete(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deepDelete)); f.delete(); ()
  }

  /** Manifest-on-commit: every versioned write/append/merge/compact
    * refreshes an EXISTING manifest against the new snapshot (cost:
    * footers of the files the commit added — O(new files), the
    * write-time maintenance shape) — and since round 11 CREATES the
    * manifest at the FIRST versioned write (over [[defaultManifestCols]]:
    * every numeric/string column), so a pipeline-written gold table
    * prunes out of the box — `deleteWhere`/`prunedRead` never pay a
    * first-use footer pass. Metadata tables (execution log, control,
    * staging scratch) are exempt: nothing range-scans them.
    * [[refreshManifest]] stays the explicit entry point for choosing a
    * narrower column set. */
  private def ensureManifest(name: String): Unit = {
    import graft.sources.SkippingIndex
    val mPath = path(name + "__manifest")
    // the versioned commit list usually carries write-time column stats
    // for every file — the manifest then refreshes from ONE list read,
    // no footer pass at all (round 12); mixed/legacy snapshots keep the
    // footer path
    val fromList =
      if (VersionedTable.isVersioned(path(name)))
        VersionedTable.statsManifest(path(name))
      else None
    val mExists = new java.io.File(mPath).exists()
    // ONE manifest read serves both the coverage check and the refresh
    lazy val existing = SkippingIndex.readManifest(spark, mPath)
    // an EXISTING manifest may index more columns than the list stats
    // carry (write-time stats cap at 32 columns; refreshManifest lets a
    // caller pick any set) — replacing it from the list would silently
    // stop pruning on the extra columns, so the list only serves when
    // it covers the manifest's column set
    val listCovers = fromList.exists { lm =>
      !mExists || {
        val listCols = lm.stats.map(_.column).toSet
        existing.stats.map(_.column).distinct.forall(listCols.contains)
      }
    }
    if (fromList.isDefined && listCovers &&
        (mExists ||
         (!name.endsWith("_execution_log") && !name.endsWith("_control") &&
          !name.endsWith("__staging"))))
      SkippingIndex.writeManifest(spark, fromList.get, mPath)
    else if (mExists)
      SkippingIndex.writeManifest(spark,
        SkippingIndex.refreshManifestFor(spark, snapshotFiles(name), existing),
        mPath)
    else if (VersionedTable.isVersioned(path(name)) &&
             !name.endsWith("_execution_log") && !name.endsWith("_control") &&
             !name.endsWith("__staging")) {
      val cols = VersionedTable.schemaOf(path(name))
        .map(defaultManifestCols)
        .getOrElse(defaultManifestCols(read(name).schema))
      if (cols.nonEmpty)
        SkippingIndex.writeManifest(spark,
          SkippingIndex.manifestFor(spark, snapshotFiles(name), cols), mPath)
    }
    // Bloom sidecars ride the same write-time maintenance: existing
    // indexes refresh at O(new files); tables without one pay nothing
    if (VersionedTable.isVersioned(path(name))) ensureBloomIndexes(name)
  }

  /** First-build manifest columns: every top-level numeric and string
    * column — the types [[graft.sources.SkippingIndex]] can prune on.
    * Footer min/max for extra columns cost nothing at read time (stats
    * rows are per (file, column) and the manifest is driver-side tiny);
    * indexing them all means any later range predicate prunes. */
  private def defaultManifestCols(schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    import org.apache.spark.sql.types._
    schema.fields.toSeq.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
      case f if f.dataType == StringType => f.name
    }
  }

  /** [[read]] through the table's persisted manifest: files whose
    * bounds (footer or partition-path) exclude every range are never
    * opened; equals `read(name).filter(ranges)` by SkippingIndex's
    * conservative contract (files the manifest has never seen are
    * kept). Requires a prior [[refreshManifest]]. */
  def prunedRead(name: String,
                 ranges: Seq[graft.sources.SkippingIndex.ColRange],
                 strRanges: Seq[graft.sources.SkippingIndex.StrRange] = Nil): DataFrame = {
    import graft.sources.SkippingIndex
    val m = SkippingIndex.readManifest(spark, path(name + "__manifest"))
    if (VersionedTable.isVersioned(path(name)))
      // candidate universe = the SNAPSHOT's committed files: pruning and
      // the conservative unseen-file fallback both stay inside the
      // current version — a dead file can never leak into the scan
      SkippingIndex.prunedReadFiles(spark, s"${path(name)}/data",
        snapshotFiles(name), ranges, Some(m), strRanges)
    else SkippingIndex.prunedRead(spark, path(name), ranges, Some(m), strRanges)
  }

  /** Stats-served metadata on a versioned table
    * ([[graft.sources.VersionedTable.countRows]] family): COUNT(*) /
    * COUNT(col) / numeric MIN-MAX from the commit list alone — zero
    * files opened; `countRows` scans as the fallback, the others return
    * None when the snapshot cannot serve exactly. */
  def countRows(name: String): Long =
    VersionedTable.countRows(spark, path(name))
  def describeDetail(name: String): DataFrame =
    VersionedTable.describeDetail(spark, path(name))
  def statsNonNullCount(name: String, col: String): Option[Long] =
    VersionedTable.statsNonNullCount(path(name), col)
  def statsMinMax(name: String, col: String): Option[(Double, Double)] =
    VersionedTable.statsMinMax(path(name), col)

  /** PLANNER-INTEGRATED scan of a versioned table
    * ([[graft.sources.VersionedTable.table]]): every query filter over
    * the returned frame prunes files through the snapshot's own
    * FileIndex — zero directory listing at plan time. Falls back to the
    * plain reader for non-versioned tables (Spark's own listing). */
  def table(name: String): DataFrame =
    if (VersionedTable.isVersioned(path(name))) {
      // Bloom sidecars ride along: a pushed point lookup on an indexed
      // hashed column prunes through the planner with no engine API.
      // Sidecar names are LOGICAL (as built); the planner's pushed
      // attributes and the index rows are PHYSICAL — translate through
      // the current mapping exactly as buildBloomIndex does
      val (ren, _) = VersionedTable.columnMapping(path(name))
      // PATHS, not loaded Datasets: the planner probes through the
      // driver-side filter cache — a warm point lookup plans job-free
      val bloomPaths = bloomSidecarPaths(name).map { case (c, p) =>
        ren.find(_._2 == c).map(_._1).getOrElse(c) -> p
      }
      VersionedTable.table(spark, path(name), bloomPaths = bloomPaths)
    } else read(name)

  /** FILTERED read with AUTOMATIC file skipping: boxes extract from the
    * predicate itself ([[graft.sources.SkippingIndex.boxesOf]]) — no
    * hand-written range hint. Versioned tables decide from the commit
    * list's write-time stats ([[graft.sources.VersionedTable.readWhere]]);
    * flat tables go through the persisted manifest when one exists. The
    * exact predicate always filters the rows — an unboundable predicate
    * reads everything, never wrongly. */
  def readWhere(name: String, predicate: Column): DataFrame = {
    import graft.sources.SkippingIndex
    if (VersionedTable.isVersioned(path(name)))
      VersionedTable.readWhere(spark, path(name), predicate)
    else {
      val mPath = path(name + "__manifest")
      if (new java.io.File(mPath).exists()) {
        val (nr, sr) = SkippingIndex.boxesOf(spark, read(name).schema, predicate)
        if (nr.isEmpty && sr.isEmpty) read(name).filter(predicate)
        else SkippingIndex.prunedRead(spark, path(name), nr,
          Some(SkippingIndex.readManifest(spark, mPath)), sr).filter(predicate)
      } else read(name).filter(predicate)
    }
  }
}

object Warehouse {
  /** Pruned-merge predicate cap: above this many touched partitions the
    * literal OR-predicate degenerates and a full merge is cheaper anyway. */
  val MaxPrunedPartitions = 256
}

final case class PipelineReport(layer: String, tables: Map[String, Long],
                                quarantined: Map[String, Long])

/** One gold model: the full-build frame, the reference's MERGE key, and the
  * table's partition columns. `atGrain` is the build collapsed to the merge
  * key with a DETERMINISTIC winner (all non-key columns descending,
  * [[graft.operators.Dedup.totalOrder]]) — the same tie-break the
  * incremental merge applies, so both paths pick identical rows. */
final case class GoldModel(name: String, build: DataFrame, keys: Seq[String],
                           partitionBy: Seq[String]) {
  def atGrain: DataFrame =
    if (keys.isEmpty) build
    else graft.operators.Dedup.keepLatest(build, keys,
      graft.operators.Dedup.totalOrder(build, keys, Nil, Nil))
}

object Pipeline {
  /** Business-key discovery patterns (W2): column-name substrings marking
    * join/identity keys. The reference matches its normalized warehouse
    * names ('_key', '_number', …); these cover the fixtures' TPC-H style
    * (`l_orderkey`, `l_linenumber`) as well. */
  val KeyPatterns: Seq[String] = Seq("key", "number", "_id")

  /** Default failure side-channel: stderr (the log table always gets the
    * entry regardless). Deployments inject alerting here — the engine
    * seam for the reference's per-layer on-fail email activities. */
  val defaultOnFailure: LogEntry => Unit = e =>
    System.err.println(s"[graft] pipeline failure: ${e.tableName} (${e.layer}): " +
      e.error.getOrElse("unknown error"))
}

class Pipeline(wh: Warehouse, source: TableSource, executionId: String,
               clock: () => java.sql.Timestamp = () =>
                 new java.sql.Timestamp(System.currentTimeMillis()),
               onFailure: LogEntry => Unit = Pipeline.defaultOnFailure) {

  private val spark = wh.spark
  private val LogTable = "pipeline_execution_log"

  /** Single construction point for log entries: builds, appends, returns. */
  private def log(table: String, layer: String, loadType: String, n: Long,
                  status: String = "success", error: Option[String] = None): LogEntry = {
    val entry = LogEntry(executionId, "graft_etl", table, layer, loadType, n,
      status, error, clock())
    wh.append(LogTable, ControlTables.logRow(spark, entry))
    entry
  }

  def executionLog: DataFrame = wh.read(LogTable)

  /** Per-table failure isolation: a broken table logs `failed`, fires the
    * injected `onFailure` side-channel, and the run continues (the
    * reference's completed_with_errors semantics) — one bad source table
    * must not sink the other 13 at 100 TB. */
  private def perTable[A](table: String, layer: String,
                          loadType: String = "initial")(body: => A): Option[A] =
    try Some(body) catch {
      case e: Exception =>
        val entry = log(table, layer, loadType, 0L, status = "failed",
          error = Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(500)))
        try onFailure(entry) catch { case _: Exception => () } // never mask the run
        None
    }

  /** Bronze: raw ingest + identifier normalization + audit (S1/S4/S9, P1, P4). */
  def runBronze(): PipelineReport = {
    val counts = source.list(spark).flatMap { t =>
      perTable(s"bronze_$t", "bronze") {
        val raw = source.read(spark, t)
        val renamed = raw.toDF(Identifiers.cleanAll(raw.columns.toSeq): _*)
          .withColumn("load_date", lit(clock()))
          .withColumn("source_system", lit("fixtures"))
        val n = wh.write(s"bronze_$t", renamed)
        log(s"bronze_$t", "bronze", "initial", n)
        t -> n
      }
    }
    PipelineReport("bronze", counts.toMap, Map.empty)
  }

  /** Silver: standardize + dedup + quarantine + audit (P2, W1/W2, P6/P7, P4). */
  def runSilver(quarRules: String => Quarantine.Rules = _ => Quarantine.Rules()):
      PipelineReport = {
    val results = wh.list("bronze_").flatMap { bt =>
      val t = bt.stripPrefix("bronze_")
      perTable(s"silver_$t", "silver") { silverOne(bt, t, quarRules) }
    }
    PipelineReport("silver",
      results.map { case (t, (n, _)) => t -> n }.toMap,
      results.collect { case (t, (_, q)) if q > 0 => t -> q }.toMap)
  }

  private def silverOne(bt: String, t: String,
                        quarRules: String => Quarantine.Rules): (String, (Long, Long)) = {
      val std = Standardize.standardizeTypes(wh.read(bt))
      val auditCols = Set("load_date", "source_system")
      // W2 pattern keys if any business keys match, else W1 all-column dedup
      val keyPatterns = Pipeline.KeyPatterns
      val keys = Dedup.patternKeys(std.drop(auditCols.toSeq: _*), keyPatterns)
      val deduped =
        if (keys.nonEmpty)
          Dedup.keepLatest(std, keys,
            Dedup.totalOrder(std, keys, Seq(col("load_date").desc), Seq("load_date")))
        else Dedup.dedupDim(std, "load_date", auditCols)
      val (clean, quar) = Quarantine.split(Quarantine.dropAllNull(deduped), quarRules(t))
      val cleanAudited = Standardize.withAudit(clean, "silver", executionId, lit(clock()))
      val nq = if (!quar.isEmpty) {
        val q = quar.withColumn("quarantine_date", lit(clock()))
          .withColumn("source_table", lit(bt))
        wh.write(s"silver_quarantine_$t", q)
      } else 0L
      val n = wh.write(s"silver_$t", cleanAudited)
      log(s"silver_$t", "silver", "initial", n)
      t -> (n, nq)
  }

  /** The six gold models — build expression, MERGE key, partition columns —
    * shared by the full load and the incremental path so a rebuilt table is
    * equivalent either way. Keys mirror the reference's MERGE conditions
    * (Gold_incremental_load.ipynb:cell 10): customer/product/billing_date/
    * invoice/line for sales, customer/order_date/document for orders,
    * customer/month for budget, surrogate key for the dims. Facts carry a
    * year partition column DERIVED FROM a key column: at 100 TB the
    * incremental MERGE and date-range queries prune whole directories
    * (SURVEY §7.3), and a business key can never move between partitions.
    *
    * Every gold table is KEYED AT ITS MERGE GRAIN from birth: the full load
    * applies the same keep-latest (deterministic total-order tie-break) the
    * merge applies, because a table that carries duplicate merge keys cannot
    * sustain the reference's Delta `MERGE` (duplicate matched rows abort
    * it) — full load and incremental convergence stay exactly equal. */
  private[graft] def goldModels(): Seq[GoldModel] = {
    import graft.gold.Star
    def s(t: String) = wh.read(s"silver_$t")
    val rates = Star.rateDim(s("nation"))
    Seq(
      GoldModel("gold_dim_customer",
        Star.dimCustomer(s("customer"), s("nation"), s("region")),
        Seq("customer_key"), Nil),
      GoldModel("gold_dim_product", Star.dimProduct(s("part")),
        Seq("product_key"), Nil),
      GoldModel("gold_fact_sales",
        Star.factSales(s("lineitem"), s("orders"), s("customer"), rates)
          .withColumn("billing_year", year(col("billing_date"))),
        Seq("customer_key", "product_key", "billing_date",
          "sales_document_number", "sales_document_line"),
        Seq("billing_year")),
      GoldModel("gold_fact_orders",
        Star.factOrders(s("orders"), s("customer"), rates)
          .withColumn("order_year", year(col("order_date"))),
        Seq("customer_key", "order_date", "order_document_number"),
        Seq("order_year")),
      GoldModel("gold_fact_budget", Star.factBudget(s("orders")),
        Seq("customer_key", "budget_month"), Nil),
      GoldModel("gold_dim_date", CalendarDim.fromDomain(s("orders"), "o_orderdate"),
        Nil, Nil))
  }

  /** Gold: star-schema builds + calendar (J1-J8, §2.8 math, X5). */
  def runGold(): PipelineReport = {
    val counts = goldModels().map { m =>
      val n = wh.write(m.name,
        Standardize.withAudit(m.atGrain, "gold", executionId, lit(clock())),
        partitionBy = m.partitionBy)
      log(m.name, "gold", "initial", n)
      m.name -> n
    }
    PipelineReport("gold", counts.toMap, Map.empty)
  }

  /** S13/X2 — final warehouse copies: every gold table copied to a second
    * namespace (`dw_` prefix), all copies submitted in PARALLEL from the
    * driver (Spark schedules concurrent jobs across the executor pool —
    * the reference runs its 5 Lakehouse→Warehouse copies the same way).
    *
    * Each copy is bounded by `timeout` against the WHOLE batch's deadline:
    * a hung source must not hang the driver forever — the stuck table's
    * Spark jobs are cancelled, it logs `failed` through `onFailure`, and
    * the remaining copies complete. `copyFn` is the injectable copy body
    * (tests substitute a slow copy; production substitutes e.g. a JDBC
    * sink writer). */
  def copyToWarehouse(prefix: String = "dw_",
                      timeout: scala.concurrent.duration.Duration =
                        scala.concurrent.duration.Duration(1, java.util.concurrent.TimeUnit.HOURS),
                      copyFn: (String, String) => Long = (t, target) =>
                        // copies keep the source's partition layout — a
                        // flat copy of a year-partitioned fact would lose
                        // pruning on the warehouse side
                        wh.write(target, wh.read(t),
                          partitionBy = wh.partitionColsOf(t))): Map[String, Long] = {
    import scala.concurrent.{Await, Future, TimeoutException}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val tables = wh.list("gold_")
    val copies = tables.map { t =>
      val group = s"graft-copy-$executionId-$t"
      t -> (group, Future {
        // job group is thread-local: set it inside the future so a timeout
        // can cancel exactly this copy's running jobs
        spark.sparkContext.setJobGroup(group, s"warehouse copy $t", interruptOnCancel = true)
        try copyFn(t, prefix + t) finally spark.sparkContext.clearJobGroup()
      })
    }
    val deadline = System.nanoTime() + timeout.toNanos
    val done = copies.flatMap { case (t, (group, f)) =>
      val remaining = math.max(deadline - System.nanoTime(), 0L)
      try Some(t -> Await.result(f, Duration.fromNanos(remaining)))
      catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          val entry = log(prefix + t, "warehouse", "copy", 0L, status = "failed",
            error = Some(s"copy timed out after $timeout"))
          try onFailure(entry) catch { case _: Exception => () }
          None
        case e: Exception =>
          val entry = log(prefix + t, "warehouse", "copy", 0L, status = "failed",
            error = Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(500)))
          try onFailure(entry) catch { case _: Exception => () }
          None
      }
    }.toMap
    // log appends share one parquet dir -> must not race; serialize them
    done.foreach { case (t, n) => log(prefix + t, "warehouse", "copy", n) }
    done
  }

  /** Incremental gold (SURVEY §3.3), all five reference models
    * (Gold_incremental_load.ipynb:cell 10's five MERGEs): dims rebuild only
    * changed keys (J8 semi-join restriction) and merge by business key;
    * facts rebuild rows whose silver audit ts >= watermark and merge by
    * composite key — the MERGE-equivalent union+window upsert in both
    * cases, partition-pruned on the facts' year columns. Bootstrap
    * (SURVEY §2.9): a missing gold table falls back to its full build,
    * exactly the silver behavior.
    *
    * Change detection mirrors the reference: each model re-derives from its
    * PRIMARY source table's changed rows (fact_sales additionally picks up
    * lineitems of changed orders, since its billing columns come from the
    * order side); a dim-only enrichment change (e.g. nation rename) flows
    * in on the next full refresh, as in the reference. */
  def runGoldIncremental(watermark: java.sql.Timestamp): Map[String, Long] = {
    import graft.gold.Star
    def s(t: String) = wh.read(s"silver_$t")
    val wm = lit(watermark)
    val rates = Star.rateDim(s("nation"))
    val models = goldModels().map(m => m.name -> m).toMap

    def upsertInto(target: String, incoming: => DataFrame): Long = {
      val m = models(target)
      if (!wh.exists(target)) {
        // bootstrap: missing target ⇒ the full build, not a zero no-op
        val n = wh.write(target,
          Standardize.withAudit(m.atGrain, "gold", executionId, lit(clock())),
          partitionBy = m.partitionBy)
        log(target, "gold", "bootstrap", n)
        return n
      }
      val audited = Standardize.withAudit(incoming, "gold", executionId, lit(clock()))
      // version order: newest audit ts wins; ties (same batch, fixed clock,
      // or the fixture's planted key collisions) break on the business
      // columns — the SAME deterministic order the full load's atGrain
      // uses, so incremental and full rebuild converge to identical rows
      val tieBreak = Dedup.totalOrder(
        audited.drop("gold_created_date", "gold_execution_id"), m.keys, Nil, Nil)
      val n = wh.mergeUpsert(target, audited, m.keys,
        col("gold_created_date").desc +: tieBreak, m.partitionBy)
      log(target, "gold", "incremental", n)
      n
    }

    // dim_customer: changed customer keys -> restricted rebuild (J8)
    val changedCust = Incremental.changedKeys(s("customer"),
        Seq("c_custkey"), "silver_created_date", wm)
    val nDimCust = upsertInto("gold_dim_customer",
      Star.dimCustomer(
        Incremental.restrictToChanged(s("customer"), changedCust, Seq("c_custkey")),
        s("nation"), s("region")))

    // dim_product: changed part keys -> restricted rebuild
    val changedPart = Incremental.changedKeys(s("part"),
        Seq("p_partkey"), "silver_created_date", wm)
    val nDimProd = upsertInto("gold_dim_product",
      Star.dimProduct(
        Incremental.restrictToChanged(s("part"), changedPart, Seq("p_partkey"))))

    // fact_sales: lineitems changed directly OR belonging to a changed
    // order (order columns feed billing_date/customer_key). One scan of
    // lineitem + one join against the DISTINCT changed-order key set
    // (small ⇒ broadcast), not a union that scans lineitem twice.
    val changedOrderKeys = s("orders").filter(col("silver_created_date") >= wm)
      .select(col("o_orderkey").as("l_orderkey")).distinct()
      .withColumn("__order_changed", lit(1))
    val liChanged = s("lineitem")
      .join(broadcast(changedOrderKeys), Seq("l_orderkey"), "left")
      .filter(col("silver_created_date") >= wm || col("__order_changed").isNotNull)
      .drop("__order_changed")
    val nFactSales = upsertInto("gold_fact_sales",
      Star.factSales(liChanged, s("orders"), s("customer"), rates)
        .withColumn("billing_year", year(col("billing_date"))))

    // fact_orders: changed orders -> merge by document number
    val changedOrders = s("orders").filter(col("silver_created_date") >= wm)
    val nFactOrd = upsertInto("gold_fact_orders",
      Star.factOrders(changedOrders, s("customer"), rates)
        .withColumn("order_year", year(col("order_date"))))

    // fact_budget: the latest-order-per-customer grain needs ALL orders of
    // each changed customer (a changed row may or may not be the latest),
    // merged on the reference's (customer, month) key. As in the
    // reference's MERGE, a customer whose budget moves to a NEW month
    // inserts that month's row; month rows are never deleted incrementally.
    val changedBudgetCust = s("orders").filter(col("silver_created_date") >= wm)
      .select("o_custkey").distinct()
    val nFactBudget = upsertInto("gold_fact_budget",
      Star.factBudget(s("orders").join(broadcast(changedBudgetCust), Seq("o_custkey"), "left_semi")))

    Map("gold_dim_customer" -> nDimCust, "gold_dim_product" -> nDimProd,
      "gold_fact_sales" -> nFactSales, "gold_fact_orders" -> nFactOrd,
      "gold_fact_budget" -> nFactBudget)
  }

  /** Incremental silver for one table: watermark scan over the source with
    * overlap, then union+window merge-upsert into the existing silver table
    * (S3/P9 + W3/S11). Bootstrap: missing watermark/table ⇒ full path. */
  def runSilverIncremental(table: String, tsCol: String,
                           overlapSeconds: Long = 3600): Long = {
    val target = s"silver_$table"
    val wm = ControlTables.lastSuccessWatermark(executionLog, target)
    if (wm.isEmpty || !wh.exists(target)) {
      runBronze(); runSilver()
      return wh.read(target).count()
    }
    val incoming = Incremental.watermarkScan(
      Standardize.standardizeTypes(source.read(spark, table)
        .toDF(Identifiers.cleanAll(source.read(spark, table).columns.toSeq): _*)),
      tsCol, lit(wm.get), overlapSeconds)
      .withColumn("load_date", lit(clock()))
      .withColumn("source_system", lit("fixtures"))
    val audited = Standardize.withAudit(incoming, "silver", executionId, lit(clock()))
    val existing = wh.read(target)
    val keys = Dedup.patternKeys(existing, Pipeline.KeyPatterns)
      .filterNot(k => k.startsWith("silver_") || k == "load_date")
    require(keys.nonEmpty, s"no business keys discovered for $target")
    val n = wh.mergeUpsert(target, audited, keys,
      Dedup.totalOrder(existing, keys, Seq(col(tsCol).desc), Seq(tsCol)))
    log(target, "silver", "incremental", n)
    n
  }
}
