package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** PLANNER-INTEGRATED snapshot scan — a custom
  * [[org.apache.spark.sql.execution.datasources.FileIndex]] over one
  * committed version of a [[VersionedTable]], the integration Delta Lake
  * ships for its own log: Spark's planner hands this index the query's
  * resolved partition + data filters, and the index answers with the
  * file list — so ANY filter in ANY query over the table
  * ([[VersionedTable.table]]) prunes files automatically, with no
  * `readWhere` call and no hand-written ranges.
  *
  * Everything the planner asks for is served from ONE commit-list read:
  *   - the FILE LIST is the snapshot's committed lines — no directory
  *     listing, ever (on a million-file table the listing alone is the
  *     plan-time bottleneck this kills);
  *   - SIZES and MTIMES come from the list's write-time annotations
  *     (`FileStatus` objects are synthesized, zero filesystem stats);
  *   - PRUNING decides [[SkippingIndex.boxesOfResolved]] boxes —
  *     extracted from the pushed filters, partition filters included —
  *     against the list's per-column min/max stats (partition-path
  *     values ride the same stats rows). Files without usable stats are
  *     always kept; a legacy un-annotated snapshot serves partition-only
  *     stats synthesized from its paths (still zero I/O) and simply
  *     prunes less.
  *
  * The snapshot is PINNED at construction (the versioned-table reader
  * contract): concurrent commits never change what a running query
  * scans, and `refresh()` is deliberately a no-op. `lastPlanned` records
  * (listed, total) of the most recent `listFiles` — the evidence surface
  * specs and gates assert pruning on. */
final class SnapshotFileIndex(spark: SparkSession, root: String,
                              version: Option[Long] = None,
                              bloom: Map[String, org.apache.spark.sql.Dataset[BloomIndex.FileBloom]] =
                                Map.empty,
                              bloomPaths: Map[String, String] = Map.empty)
    extends FileIndex {

  private val snapshotVersion: Long = {
    val vs = VersionedTable.versions(root)
    require(vs.nonEmpty, s"no commits at $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs at $root")
    v
  }

  /** (rel path, bytes, mtimeMs) straight off the commit list. */
  private val fileRows: Seq[(String, Long, Long)] = {
    val stats = VersionedTable.fileStats(root, Some(snapshotVersion))
    VersionedTable.dataFiles(root, Some(snapshotVersion)).map { rel =>
      val (b, m) = stats.getOrElse(rel, (0L, 0L))
      (rel, b, m)
    }
  }

  /** Partition columns (from the committed layout) typed by the
    * committed schema; the DATA schema is everything else. */
  private val pcols: Seq[String] = VersionedTable.partitionCols(root)

  private val committedSchema: StructType =
    VersionedTable.schemaOf(root, Some(snapshotVersion)).getOrElse {
      // legacy unstamped table: read() serves the LOGICAL view, but the
      // relation must address the files' PHYSICAL columns (a renamed
      // column read under its logical name would silently serve NULLs)
      // — un-alias through the snapshot's mapping; table() re-aliases
      val logical = VersionedTable.read(spark, root, Some(snapshotVersion)).schema
      val logToPhys = VersionedTable
        .columnMapping(root, Some(snapshotVersion))._1.map(_.swap)
      StructType(logical.fields.map(f =>
        f.copy(name = logToPhys.getOrElse(f.name, f.name))))
    }

  override val partitionSchema: StructType =
    StructType(committedSchema.fields.filter(f => pcols.contains(f.name)))

  /** The parquet-file schema: committed columns minus partition columns
    * (their values live in directory paths, not in the files). */
  val dataSchema: StructType =
    StructType(committedSchema.fields.filterNot(f => pcols.contains(f.name)))

  /** Stats manifest for pruning: the commit list's write-time stats
    * when every file carries them; else partition-path-only stats
    * (synthesized from the rel paths — still zero file I/O, data
    * columns simply unbounded). */
  private val manifest: SkippingIndex.Manifest =
    VersionedTable.statsManifest(root, Some(snapshotVersion)).getOrElse {
      SkippingIndex.Manifest(fileRows.flatMap { case (rel, _, _) =>
        val parts = SkippingIndex.partitionValues(rel)
        if (parts.isEmpty)
          Seq(SkippingIndex.FileColStats(rel, "", None, None, None, None, 0L, 0L))
        else parts.toSeq.map {
          case (c, Some(v)) =>
            val d = v.toDoubleOption
            SkippingIndex.FileColStats(rel, c, d, d,
              if (d.isEmpty) Some(v) else None,
              if (d.isEmpty) Some(v) else None, 0L, 0L)
          case (c, None) =>
            SkippingIndex.FileColStats(rel, c, None, None, None, None, 0L, 0L)
        }
      }.toIndexedSeq)
    }

  /** (files listed, snapshot total) of the most recent listFiles call —
    * the pruning-evidence surface. */
  @volatile var lastPlanned: Option[(Int, Int)] = None

  override def rootPaths: Seq[Path] = Seq(new Path(s"$root/data"))

  override def inputFiles: Array[String] =
    fileRows.map { case (rel, _, _) => s"$root/$rel" }.toArray

  override def refresh(): Unit = () // snapshot-pinned: nothing to refresh

  override def sizeInBytes: Long = fileRows.map(_._2).sum

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // every pushed filter narrows the same prune spec: partition values
    // are stats rows like any other column, so one walk covers both
    // kinds — and the isnotnull guards Spark plants beside every pushed
    // comparison prune all-null files that no range could
    val (nr, sr, nn) = (partitionFilters ++ dataFilters)
      .map(SkippingIndex.pruneSpecOfResolved)
      .foldLeft((Seq.empty[SkippingIndex.ColRange],
        Seq.empty[SkippingIndex.StrRange], Seq.empty[String])) {
        // filters are implicitly ANDed: concatenation intersects (every
        // range must hold), which is exactly survivors' semantics
        case ((n1, s1, a1), (n2, s2, a2)) => (n1 ++ n2, s1 ++ s2, a1 ++ a2)
      }
    val keep0 =
      if (nr.isEmpty && sr.isEmpty && nn.isEmpty) fileRows.map(_._1).toSeq
      else manifest.survivors(nr, sr, nn.distinct)
    // stage 2, per-file BLOOM probe for pushed point lookups: a
    // conjunct that is a PLAIN equality/IN on a bloom-indexed column
    // (each element of the filter seq must hold independently — they
    // are ANDed) probes the sidecar, pruning what min/max never can:
    // a `WHERE doc_key = '<hash>'` in plain SQL plans ~1 file.
    // Path-addressed sidecars probe through the DRIVER-SIDE filter
    // cache first ([[BloomIndex.loadCached]], VERDICT r12 #3): a warm
    // point-lookup plan launches ZERO Spark jobs; an over-bound sidecar
    // falls back to the distributed sweep. Dataset-addressed entries
    // (legacy callers) keep the distributed path.
    val probeSrcs: Seq[(String, Either[String, org.apache.spark.sql.Dataset[BloomIndex.FileBloom]])] =
      bloomPaths.map { case (c, p) => c -> (Left(p): Either[String, org.apache.spark.sql.Dataset[BloomIndex.FileBloom]]) }.toSeq ++
        bloom.filterNot(kv => bloomPaths.contains(kv._1))
          .map { case (c, ds) => c -> (Right(ds): Either[String, org.apache.spark.sql.Dataset[BloomIndex.FileBloom]]) }.toSeq
    val keep = probeSrcs.foldLeft(keep0) { case (cand, (col0, src)) =>
      if (cand.isEmpty) cand
      else {
        val pts = (partitionFilters ++ dataFilters).flatMap(pointValues(col0, _))
        if (pts.isEmpty) cand
        else pts.foldLeft(cand) { (c, vs) =>
          if (c.isEmpty) c
          else {
            def distributed(ix: org.apache.spark.sql.Dataset[BloomIndex.FileBloom]): Seq[String] = {
              import spark.implicits._
              val keys = vs match {
                case Left(ls) => ls.toDF(col0)
                case Right(ss) => ss.toDF(col0)
              }
              BloomIndex.survivors(spark, ix, c, col0, keys)
            }
            src match {
              case Left(path) => BloomIndex.loadCached(spark, path) match {
                case Some(li) => BloomIndex.survivorsLocal(li, c, col0, vs)
                case None if new java.io.File(path).isDirectory =>
                  distributed(BloomIndex.readIndex(spark, path)) // over-bound
                case None => c // sidecar gone — unindexed ⇒ keep
              }
              case Right(ds) => distributed(ds)
            }
          }
        }
      }
    }.toSet
    val kept = fileRows.filter { case (rel, _, _) => keep.contains(rel) }
    lastPlanned = Some((kept.size, fileRows.size))
    // group surviving files by their partition values; the partition row
    // is typed by casting the path string through the committed type
    kept.groupBy { case (rel, _, _) => SkippingIndex.partitionValues(rel) }
      .toSeq
      .map { case (parts, rows) =>
        val values = InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
          parts.get(f.name).flatten match {
            case Some(s) =>
              if (f.dataType == StringType) UTF8String.fromString(s)
              else Cast(Literal(UTF8String.fromString(s), StringType),
                // timezone-needing casts (timestamp partitions) resolve
                // against the session zone — Cast.eval throws without it
                f.dataType,
                Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
            case None => null
          }
        })
        PartitionDirectory(values, rows.map { case (rel, bytes, mtime) =>
          new FileStatus(bytes, false, 1, 128L * 1024 * 1024, mtime,
            new Path(s"$root/$rel"))
        }.toArray)
      }
  }

  /** The EXACT value set of `filter` when the whole conjunct is a plain
    * equality / IN on `column` — the only shapes a Bloom filter can
    * decide. Anything else (OR, ranges, other columns) returns None and
    * the conjunct contributes no bloom probe. Left = integral values
    * (probed as longs, the build kind), Right = strings. */
  private def pointValues(column: String, filter: Expression)
      : Option[Either[Seq[Long], Seq[String]]] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    // only IDENTITY/WIDENING casts unwrap (the box walker's rule): a
    // narrowing cast changes which raw values match, so probing the
    // literal against the raw-value filter would prune unsoundly
    def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (a, b) if a == b => true
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case _ => false
    }
    def attrMatches(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == column
      case c: Cast => widens(c.child.dataType, c.dataType) && attrMatches(c.child)
      case _ => false
    }
    def longLit(e: Expression): Option[Long] = e match {
      case Literal(v, ByteType | ShortType | IntegerType | LongType) if v != null =>
        Some(v.asInstanceOf[Number].longValue())
      case c: Cast if c.foldable =>
        try Option(c.eval(null)).flatMap(v => longLit(Literal(v, c.dataType)))
        catch { case _: Exception => None }
      case _ => None
    }
    def strLit(e: Expression): Option[String] = e match {
      case Literal(v, StringType) if v != null => Some(v.toString)
      case _ => None
    }
    def ofLits(vs: Seq[Expression]): Option[Either[Seq[Long], Seq[String]]] = {
      val ls = vs.flatMap(longLit)
      val ss = vs.flatMap(strLit)
      if (ls.size == vs.size) Some(scala.Left(ls))
      else if (ss.size == vs.size) Some(scala.Right(ss))
      else None // an opaque element: the probe would under-cover
    }
    filter match {
      case EqualTo(a, l) if attrMatches(a) => ofLits(Seq(l))
      case EqualTo(l, a) if attrMatches(a) => ofLits(Seq(l))
      case EqualNullSafe(a, l) if attrMatches(a) => ofLits(Seq(l))
      case EqualNullSafe(l, a) if attrMatches(a) => ofLits(Seq(l))
      case In(a, vs) if attrMatches(a) => ofLits(vs)
      case e: InSet if attrMatches(e.child) =>
        val vs = e.hset.toSeq.filter(_ != null)
        if (vs.isEmpty) None
        else if (vs.forall(_.isInstanceOf[Number]))
          Some(scala.Left(vs.map(_.asInstanceOf[Number].longValue())))
        else if (vs.forall(_.isInstanceOf[org.apache.spark.unsafe.types.UTF8String]))
          Some(scala.Right(vs.map(_.toString)))
        else None
      case _ => None
    }
  }

  override def toString: String =
    s"SnapshotFileIndex($root@v$snapshotVersion, ${fileRows.size} files)"
}
