package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file BLOOM-FILTER index — the pruning path for HIGH-CARDINALITY
  * RANDOM keys, where [[SkippingIndex]]'s min/max stats are useless:
  * every file of a table keyed by a hash/UUID spans essentially the full
  * key range, so range boxes and interval point probes
  * ([[SkippingIndex.probeSurvivors]]) keep every file. A per-file Bloom
  * filter answers the question those stats cannot — "can this FILE
  * contain this exact KEY?" — with a bounded false-positive rate and
  * zero false negatives, so a scattered key-list DELETE (redaction /
  * right-to-be-forgotten) or a CDC MERGE on hash keys rewrites the files
  * that really hold the keys, not the table. This is Delta Lake's Bloom
  * filter index shape (per-file filter, sidecar storage, consulted at
  * skipping time); reference behavior: the incremental screens and
  * redaction deletes of `/root/reference` (e.g. notebooks/bronze
  * ingestion's key-based upserts) assume a key-addressable store — at
  * 100 TB only an index makes that bounded.
  *
  * Design for scale:
  *   - the index is a small DataFrame — ONE row per (file, column),
  *     carrying the serialized filter (~1.2 MB per million keys at 1%
  *     fpp). It lives in parquet sidecars like the skipping manifest and
  *     never needs the data files again once built.
  *   - BUILD is one distributed two-pass job: a map-side-combined
  *     count per file sizes each filter optimally, then one shuffle
  *     groups keys by file and streams them into the filter — no driver
  *     loop over files, no per-file job storm, bounded task memory
  *     (the filter bits, not the keys).
  *   - REFRESH after a commit touches only the files the commit added:
  *     carried files keep their rows verbatim (content-immutable files
  *     make the filter immutable too), dead files drop.
  *   - PROBE broadcasts the (bounded, by the redaction-list contract)
  *     key list and filters the index rows DISTRIBUTED — cost is
  *     index-rows × keys `mightContain` calls, no data file opened.
  *     Files without an index row are KEPT — pruning is never unsound
  *     on a partially-indexed snapshot.
  *
  * Key typing is pinned at build time (`kind`): integral columns probe
  * as longs, strings as UTF-8 strings, binary as bytes — a probe with a
  * mismatched key type refuses loudly rather than silently never
  * matching (fractional/decimal keys are refused at build: their
  * textual/bit representations are not canonical across engines).
  */
object BloomIndex extends Serializable {

  /** One file's filter for one column. `kind` ∈ l/s/b (long/string/
    * binary); `n_items` is the EXACT non-null key count the filter was
    * sized for (fp rate holds at that load). */
  final case class FileBloom(file: String, column: String, kind: String,
                             n_items: Long, fpp: Double, bloom: Array[Byte])

  private def plainPath(s: String): String =
    if (s.indexOf(":/") >= 0)
      try new java.net.URI(s).getPath catch { case _: Exception => s }
    else s

  private[graft] def kindOf(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => "l"
      case StringType => "s"
      case BinaryType => "b"
      case other => throw new IllegalArgumentException(
        s"BloomIndex supports integral/string/binary keys, not $other: " +
          "fractional and decimal keys have no canonical bit/text form " +
          "to hash consistently")
    }
  }

  private def bytesOf(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Build the index for `column` over an explicit `(absolute,
    * relative)` file list (the snapshot-aware entry point, like
    * [[SkippingIndex.manifestFor]]). Two distributed passes over the
    * key column only: a combined per-file count (sizes each filter for
    * its real load), then one shuffle streaming each file's keys into
    * its filter. NULL keys are skipped — NULL never equals a key. */
  def indexFor(spark: SparkSession, files: Seq[(String, String)],
               column: String, fpp: Double = 0.01): Dataset[FileBloom] = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    import spark.implicits._
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    if (files.isEmpty) return spark.emptyDataset[FileBloom]
    val rel = files.map { case (abs, r) => plainPath(abs) -> r }.toMap
    require(rel.size == files.size,
      s"duplicate absolute paths in the file list for $column")
    val df = spark.read.parquet(files.map(_._1): _*)
    require(df.columns.contains(column),
      s"no column `$column` in the files (have ${df.columns.mkString(", ")})")
    val kind = kindOf(df.schema(column).dataType)
    val keyed = df.select(input_file_name().as("__f"), col(column).as("__k"))
      .na.drop(Seq("__k"))
    // pass 1: per-file non-null key counts (map-side combined — tiny)
    val counts = keyed.groupBy("__f").count().as[(String, Long)].collect().toMap
    // Every path Spark's input_file_name() reports MUST resolve through
    // the caller's file list. If even one doesn't (URI scheme /
    // percent-encoding / symlink drift between the listing and the
    // scan), "absent from the counts" no longer proves "key-less", and
    // the empty-filter rows below would turn the documented
    // "unindexed ⇒ keep" guarantee into an unsound prune — silently
    // missing redaction deletes. Refuse LOUDLY at build time instead
    // (ADVICE r12): no index is written, verbs keep every candidate.
    val unresolved = counts.keys.filterNot(f => rel.contains(plainPath(f)))
    require(unresolved.isEmpty,
      s"bloom build for `$column`: ${unresolved.size} scanned path(s) do " +
        s"not resolve through the supplied file list (e.g. " +
        s"${unresolved.take(3).mkString(", ")}) — path roundtrip drift; " +
        "refusing to build an index whose key-less inference would be unsound")
    val bcCounts = spark.sparkContext.broadcast(counts)
    val bcRel = spark.sparkContext.broadcast(rel)
    def emit(f: String, bf: BloomFilter, n: Long): FileBloom = {
      // validated above for every pass-1 path; a pass-2 path that still
      // misses would silently mis-key the row — fail the task instead
      val r = bcRel.value.getOrElse(plainPath(f),
        throw new IllegalStateException(
          s"bloom build for `$column`: scanned path $f missing from the file list"))
      FileBloom(r, column, kind, n, fpp, bytesOf(bf))
    }
    // pass 2: group keys by file, stream into a filter sized for that
    // file's exact load — task memory is the filter bits, not the keys
    val built: Dataset[FileBloom] = kind match {
      case "l" =>
        keyed.select(col("__f"), col("__k").cast("long")).as[(String, Long)]
          .groupByKey(_._1).mapGroups { (f, it) =>
            val n = bcCounts.value.getOrElse(f, 1L)
            val bf = BloomFilter.create(math.max(n, 1L), fpp)
            it.foreach(t => bf.putLong(t._2))
            emit(f, bf, n)
          }
      case "s" =>
        keyed.as[(String, String)]
          .groupByKey(_._1).mapGroups { (f, it) =>
            val n = bcCounts.value.getOrElse(f, 1L)
            val bf = BloomFilter.create(math.max(n, 1L), fpp)
            it.foreach(t => bf.putString(t._2))
            emit(f, bf, n)
          }
      case _ =>
        keyed.as[(String, Array[Byte])]
          .groupByKey(_._1).mapGroups { (f, it) =>
            val n = bcCounts.value.getOrElse(f, 1L)
            val bf = BloomFilter.create(math.max(n, 1L), fpp)
            it.foreach(t => bf.putBinary(t._2))
            emit(f, bf, n)
          }
    }
    // a file with ZERO non-null keys never appears in the shuffle — give
    // it an explicit empty filter, so the probe can PRUNE it (it cannot
    // contain any key; "unindexed ⇒ keep" is for files the index never
    // saw, not for files it knows are key-less)
    val seen = counts.keys.map(plainPath).toSet
    val empties = files.collect { case (abs, r) if !seen.contains(plainPath(abs)) =>
      FileBloom(r, column, kind, 0L, fpp, bytesOf(BloomFilter.create(1L, fpp)))
    }
    if (empties.isEmpty) built
    else built.unionAll(spark.createDataset(empties))
  }

  /** Refresh an existing index against the CURRENT `(absolute,
    * relative)` snapshot: rows for carried files are kept verbatim
    * (immutable files, immutable filters), rows for dead files drop,
    * and ONLY the new files pay a build — the write-time maintenance
    * shape, O(new files) like the skipping manifest's refresh. */
  def refreshFor(spark: SparkSession, files: Seq[(String, String)],
                 existing: Dataset[FileBloom]): Dataset[FileBloom] = {
    import spark.implicits._
    val have = existing.select("file").as[String].collect().toSet
    val cur = files.map(_._2).toSet
    val kept = existing.filter(f => cur.contains(f.file))
    val missing = files.filterNot(f => have.contains(f._2))
    if (missing.isEmpty) kept
    else {
      val head = existing.limit(1).collect()
      require(head.nonEmpty,
        "refreshFor on an empty index: build with indexFor first")
      kept.unionAll(indexFor(spark, missing, head(0).column, head(0).fpp))
    }
  }

  /** Persist / load the index as a parquet sidecar (the
    * [[SkippingIndex.writeManifest]] convention). */
  def writeIndex(spark: SparkSession, idx: Dataset[FileBloom], path: String): Unit =
    idx.write.mode("overwrite").parquet(path)

  def readIndex(spark: SparkSession, path: String): Dataset[FileBloom] = {
    import spark.implicits._
    spark.read.parquet(path).as[FileBloom]
  }

  // ---- driver-side deserialized-filter cache (VERDICT r12 #3) ------
  // Plan-time probes used to launch a distributed filter + collect per
  // PLANNED QUERY ([[survivors]]) and re-read the parquet sidecar per
  // plan — correct and Delta-shaped, but a repeatedly re-planned point-
  // lookup dashboard paid a Spark job per plan. For the common small-
  // index case the deserialized filters live on the driver instead,
  // keyed by the sidecar's (path, parts-fingerprint): a WARM probe is
  // pure driver work — ZERO jobs, zero sidecar I/O. Above the size
  // bound the caller falls back to the distributed sweep (a million-
  // file table's sidecar does not belong on the driver heap).

  /** One sidecar deserialized: file → its filter, plus the pinned key
    * kind. `mightContain*` is read-only on the bit array — safe to
    * probe from concurrent planning threads. */
  final case class LoadedIndex(column: String, kind: String,
                               filters: Map[String, BloomFilter])

  /** Default driver-heap bound per sidecar: 64 MB of serialized filter
    * bytes (~50M keys at 1% fpp) — far above any redaction-scale index,
    * far below executor-scale tables. */
  val DefaultCacheBytes: Long = 64L << 20

  private object FilterCache {
    private val MaxSidecars = 8
    // dir -> (fingerprint, loaded | None-for-too-big)
    private val m = new java.util.LinkedHashMap[String, (String, Option[LoadedIndex])](
        MaxSidecars, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Option[LoadedIndex])]): Boolean =
        size() > MaxSidecars
    }
    def get(dir: String, fp: String): Option[Option[LoadedIndex]] = m.synchronized {
      Option(m.get(dir)).filter(_._1 == fp).map(_._2)
    }
    def put(dir: String, fp: String, v: Option[LoadedIndex]): Unit = m.synchronized {
      m.put(dir, (fp, v)); ()
    }
  }

  /** `(count:bytes:maxMtime)` of the sidecar's parquet parts — changes
    * whenever [[graft.run.Warehouse]]'s refresh swaps the directory, so
    * a stale cache entry can never serve. Also the size pre-check: the
    * serialized blobs dominate the parquet bytes. */
  private def sidecarFingerprint(dir: String): Option[(String, Long)] = {
    val d = new java.io.File(dir)
    val parts = Option(d.listFiles()).map(_.toSeq).getOrElse(return None)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    if (parts.isEmpty) return None
    val bytes = parts.map(_.length()).sum
    Some((s"${parts.size}:$bytes:${parts.map(_.lastModified()).max}", bytes))
  }

  /** The sidecar at `dir` as driver-side filters — cached across plans;
    * `None` when the sidecar is missing/empty or beyond `maxBytes`
    * (fall back to [[survivors]], which is always sound). The FIRST
    * touch after a build/refresh pays one small read job; every later
    * plan is job-free. */
  def loadCached(spark: SparkSession, dir: String,
                 maxBytes: Long = DefaultCacheBytes): Option[LoadedIndex] = {
    val (fp, bytes) = sidecarFingerprint(dir).getOrElse(return None)
    FilterCache.get(dir, fp) match {
      case Some(hit) => hit
      case None =>
        val loaded =
          if (bytes > maxBytes) None
          else {
            val rows = readIndex(spark, dir).collect()
            if (rows.isEmpty) None
            else Some(LoadedIndex(rows.head.column, rows.head.kind,
              rows.iterator.map(r => r.file -> BloomFilter.readFrom(r.bloom)).toMap))
          }
        FilterCache.put(dir, fp, loaded)
        loaded
    }
  }

  /** Driver-side twin of [[survivors]]: same contract (unindexed
    * candidates KEEP — no false negatives, ever; key kind must match
    * the build), zero Spark jobs. */
  def survivorsLocal(idx: LoadedIndex, candidates: Seq[String], column: String,
                     keys: Either[Seq[Long], Seq[String]]): Seq[String] = {
    require(idx.column == column,
      s"bloom index is on `${idx.column}`, probed as `$column`")
    val kind = keys.fold(_ => "l", _ => "s")
    require(idx.kind == kind,
      s"bloom index on `$column` was built for kind '${idx.kind}' but the " +
        s"probe keys are '$kind' — probe with the key type the index was built on")
    candidates.filter { f =>
      idx.filters.get(f) match {
        case Some(bf) => keys match {
          case Left(ls) => ls.exists(bf.mightContainLong)
          case Right(ss) => ss.exists(bf.mightContainString)
        }
        case None => true // unindexed ⇒ keep
      }
    }
  }

  /** The candidate files that MIGHT contain at least one of `keys` —
    * plus every candidate the index has no row for (unindexed files
    * must be kept: no false negatives, ever). The key list is bounded
    * by contract (a redaction / CDC batch, not a table) and broadcasts;
    * the `mightContain` sweep runs distributed over the index rows.
    * Key type must match the index's pinned `kind` — a mismatch refuses
    * loudly. Returns candidates in their input order. */
  def survivors(spark: SparkSession, idx: Dataset[FileBloom],
                candidates: Seq[String], column: String,
                keys: DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    if (candidates.isEmpty) return candidates
    require(keys.columns.length == 1,
      s"bloom probe wants a single-column key list, got ${keys.columns.mkString(", ")}")
    val kind = kindOf(keys.schema.fields.head.dataType)
    val cand = candidates.toSet
    val rows = idx.filter(r => r.column == column && cand.contains(r.file))
    // ONE action over the (possibly lazily-BUILT — [[indexFor]]'s pass 2
    // is a full key-column scan + filter construction) index: each row
    // collapses to (file, kind, mightContain-any-key) in a single
    // collect. The old shape ran TWO actions — a kind-check collect,
    // then the probe collect — which executed the whole index build
    // twice when the caller probes a freshly-built unpersisted index
    // (guide §1.2: fewer passes; measured on s45, see OPTIMIZATION_r16).
    // The kind-mismatch check moves after the collect — same refusal,
    // and a mismatched row never counts as a hit. Driver state stays
    // bounded by the candidate list (3 small fields per file).
    val k = keys.na.drop().distinct()
    val probed: Array[(String, String, Boolean)] = kind match {
      case "l" =>
        val pts = k.select(col(k.columns.head).cast("long")).as[Long].collect()
        val bc = spark.sparkContext.broadcast(pts)
        rows.map { r =>
          (r.file, r.kind, r.kind == "l" && {
            val bf = BloomFilter.readFrom(r.bloom)
            bc.value.exists(bf.mightContainLong)
          })
        }.collect()
      case "s" =>
        val pts = k.as[String].collect()
        val bc = spark.sparkContext.broadcast(pts)
        rows.map { r =>
          (r.file, r.kind, r.kind == "s" && {
            val bf = BloomFilter.readFrom(r.bloom)
            bc.value.exists(bf.mightContainString)
          })
        }.collect()
      case _ =>
        val pts = k.as[Array[Byte]].collect()
        val bc = spark.sparkContext.broadcast(pts)
        rows.map { r =>
          (r.file, r.kind, r.kind == "b" && {
            val bf = BloomFilter.readFrom(r.bloom)
            bc.value.exists(bf.mightContainBinary)
          })
        }.collect()
    }
    if (probed.isEmpty) return candidates
    require(probed.head._2 == kind,
      s"bloom index on `$column` was built for kind '${probed.head._2}' but " +
        s"the probe keys are '$kind' — probe with the key type the index " +
        "was built on")
    val indexed = probed.map(_._1).toSet
    val hits = probed.collect { case (f, _, true) => f }.toSet
    // unindexed candidates pass unconditionally; input order preserved
    candidates.filter(f => !indexed.contains(f) || hits.contains(f))
  }
}
