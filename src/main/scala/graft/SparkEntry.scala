package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables
import graft.operators._
import graft.gold.Star
import graft.util.Identifiers

/** Driver contract — the engine's declared query inventory (SURVEY §2).
  *
  * Every entry has a DuckDB-runnable oracle in [[SparkEntry.oracleSql]]
  * unless the operator is not SQL-expressible (those get rows-only checks).
  * Parity rules used throughout so Spark and DuckDB hash-match:
  *   - monetary aggregates sum exact decimals (order-independent);
  *   - double arithmetic appears only as identical single IEEE expressions;
  *   - every computed column is aliased identically on both sides;
  *   - LIMIT/top-k queries keep a total ORDER BY (semantic); other queries
  *     return unordered — the comparison is row-order-insensitive, and a
  *     final total sort would force a range-partitioning sampling pass that
  *     recomputes the whole plan (measured ~2.5x on the fact builds).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Register a throwaway [[graft.sql.GraftCatalog]] over a fresh
    * scratch warehouse for one SQL-text gate; returns (catalogName,
    * warehouseRoot). The name carries the sf-dir hash because Spark's
    * CatalogManager caches ONE instance per name — a reused name would
    * silently keep serving the first root it saw. */
  private def sqlGateCatalog(s: SparkSession, d: String, gate: String): (String, String) = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_${gate}_wh_${math.abs(d.hashCode)}"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(root))
    new java.io.File(root).mkdirs()
    val cat = s"g${gate}_${math.abs(d.hashCode)}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sql.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Star.factSales(t(spark, dir, "lineitem"), t(spark, dir, "orders"),
      t(spark, dir, "customer"), Star.rateDim(t(spark, dir, "nation")))
  }

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (coreQueries ++ graft.queries.ExtQueries.queries).map { case (n, f) =>
      n -> ((s: SparkSession, d: String) => finalizeOutput(f(s, d)))
    }

  /** Output surface rule: exact decimal math stays internal (sums must be
    * order-independent under parallel aggregation), but every FINAL decimal
    * column is cast to IEEE double. Parquet readers do not agree on decimal
    * scale rendering (`1.50` vs `1.5`), while a double round-trips
    * identically everywhere; the oracle SQL applies the same final cast
    * (see [[asDouble]]) so both engines emit the same bits.
    */
  private def finalizeOutput(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        case _              => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  private val coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.1 scans / §2.6 sorts ----
    "s1_full_scan" -> ((s, d) =>
      t(s, d, "region").orderBy("r_regionkey")),

    "s4_projection_scan" -> ((s, d) =>
      t(s, d, "customer").select("c_custkey", "c_name", "c_mktsegment")),

    "s7_top_sample" -> ((s, d) =>
      t(s, d, "orders").orderBy("o_orderkey").limit(5)),

    // ---- S11/W3 merge-upsert (union + window dedup ≡ MERGE INTO) ----
    "s11_merge_upsert" -> ((s, d) => {
      val ev = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type", "value")
      val target = ev.filter(col("ts") < to_timestamp(lit("2024-01-20 00:00:00")))
      val source = ev.filter(col("ts") >= to_timestamp(lit("2024-01-19 00:00:00")))
        .withColumn("value", col("value") + lit(1.0))
      Dedup.mergeUpsert(target, source, Seq("event_id"), Seq(col("ts").desc))
    }),

    // ---- layout & file skipping (Layout / SkippingIndex) ----
    // Z value arithmetic under the hash gate: exact integer scaling +
    // Morton interleave, replayed bit-for-bit by the DuckDB oracle
    // (same shifts, BIGINT `//` ≡ Spark `div` on non-negative operands)
    "s16_zorder_value" -> ((s, d) => {
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      Layout.zValueAuto(li, Seq("l_orderkey", "l_partkey"))
        .withColumnRenamed("__z", "zval")
    }),

    // end-to-end pruned scan soundness: write a Z-ordered layout, build
    // the footer-stats index, prune files, scan survivors + residual —
    // the oracle is the PLAIN filtered aggregate, so a green hash proves
    // file skipping lost nothing (LayoutSpec additionally asserts the
    // skip ratio and random-box equality)
    "s17_pruned_scan" -> ((s, d) => {
      import graft.sources.SkippingIndex
      import graft.sources.SkippingIndex.ColRange
      val dir = s"${sys.props("java.io.tmpdir")}/graft_s17_${math.abs(d.hashCode)}"
      Layout.zorder(
          t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity"),
          Seq("l_orderkey", "l_partkey"), numFiles = 16)
        .write.mode("overwrite").parquet(dir)
      SkippingIndex.prunedRead(s, dir,
          Seq(ColRange("l_orderkey", 1000, 20000), ColRange("l_partkey", 200, 1200)))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // JSONL interchange round trip: documents → newline-delimited JSON →
    // declared-schema read-back. The oracle is the plain documents
    // table, so a green hash proves the source/sink pair loses nothing
    // (escaping, nulls, longs) — the training-data exchange path
    // snapshot-isolated versioned table (the mini-lakehouse commit
    // protocol in sources/VersionedTable): overwrite v0, append v1,
    // then TIME-TRAVEL both snapshots — green hash proves each version
    // serves exactly its committed row set, immutable under later
    // commits; PipelineSpec covers atomicity/race/vacuum semantics
    "s21_time_travel" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s21_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root)) // idempotent gate: rebuild from scratch
      val docs = t(s, d, "documents")
      VersionedTable.overwrite(s, root, docs.filter(col("doc_id") < 400))
      VersionedTable.append(s, root, docs.filter(col("doc_id") >= 400))
      VersionedTable.read(s, root, Some(0L))
        .select(col("doc_id")).withColumn("version", lit(0L))
        .unionByName(VersionedTable.read(s, root)
          .select(col("doc_id")).withColumn("version", lit(1L)))
    }),

    // exactly-once sink protocol: two committed epochs + one REDELIVERED
    // epoch (the at-least-once case) — the redelivery must be a no-op,
    // so the table still holds exactly two snapshots and the base row
    // set once; n_commits rides in the output so a broken idempotence
    // (3 versions, duplicated rows) breaks the hash
    "s22_idempotent_sink" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s22_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents")
      VersionedTable.appendIdempotent(s, root,
        docs.filter(col("doc_id") < 400), "gate", epoch = 0L)
      VersionedTable.appendIdempotent(s, root,
        docs.filter(col("doc_id") >= 400), "gate", epoch = 1L)
      VersionedTable.appendIdempotent(s, root,
        docs.filter(col("doc_id") >= 400), "gate", epoch = 1L) // redelivery
      VersionedTable.read(s, root).select(col("doc_id"))
        .withColumn("n_commits",
          lit(graft.sources.VersionedTable.versions(root).size.toLong))
    }),

    // OPTIMIZE ZORDER in miniature: the clustered rewrite must preserve
    // the snapshot's logical content EXACTLY (that is the hash) while
    // committing a third version; PipelineSpec checks the physical
    // layout and that sink idempotence survives the rewrite
    "s23_optimize_zorder" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s23_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents")
      VersionedTable.appendIdempotent(s, root,
        docs.filter(col("doc_id") < 400), "gate", epoch = 0L)
      VersionedTable.appendIdempotent(s, root,
        docs.filter(col("doc_id") >= 400), "gate", epoch = 1L)
      VersionedTable.optimize(s, root, Seq("n_chars", "doc_id"), numFiles = 8)
      VersionedTable.read(s, root).select(col("doc_id"))
        .withColumn("n_commits",
          lit(graft.sources.VersionedTable.versions(root).size.toLong))
    }),

    // bounded DELETE WHERE: a range-clustered versioned lineitem loses
    // exactly the (orderkey × returnflag) box — footer stats prove most
    // files cannot match, so they carry untouched and only the rest rewrite
    // with the anti-filter. The hash checks BOTH the surviving content
    // (vs the oracle's NOT-box filter) and, via the `bounded` column,
    // that the delete really carried files instead of rewriting the
    // table; the old snapshot stays time-travelable (PipelineSpec).
    "s24_delete_where" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      import SkippingIndex.{ColRange, StrRange}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s24_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      VersionedTable.overwrite(s, root,
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
          .repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      val (_, rewritten, carried) = VersionedTable.deleteWhere(s, root,
        Seq(ColRange("l_orderkey", 1000, 2000)),
        Seq(StrRange("l_returnflag", "R", "R")))
      VersionedTable.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .withColumn("bounded", lit(carried > 0 && rewritten < carried))
        .orderBy("l_returnflag")
    }),

    // schema evolution in the commit log (Delta mergeSchema shape): the
    // table starts (doc_id, text); an append ARRIVES WITH a new `lang`
    // column, which evolves the committed schema — earlier files serve
    // lang as NULL, and version 0 still time-travels under its own
    // 2-column schema (hash-gated via v0_cols). A type flip on append
    // fails loudly instead (PipelineSpec).
    "s25_schema_evolution" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s25_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents")
      VersionedTable.overwrite(s, root,
        docs.filter(col("doc_id") < 400).select("doc_id", "text"))
      VersionedTable.append(s, root,
        docs.filter(col("doc_id") >= 400).select("doc_id", "text", "lang"))
      VersionedTable.read(s, root).select("doc_id", "text", "lang")
        .withColumn("v0_cols",
          lit(VersionedTable.read(s, root, Some(0L)).columns.length.toLong))
    }),

    // CHANGE FEED derived from the commit diff: step 1 = an append (the
    // feed reads JUST the appended files), step 2 = a bounded delete
    // (the feed reads just the rewritten files, and the surviving rows
    // they carried cancel from the multiset diff exactly) — green hash
    // proves the file-diff feed equals the row-level snapshot diff
    "s26_change_feed" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s26_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents").select("doc_id", "lang")
      VersionedTable.overwrite(s, root,
        docs.filter(col("doc_id") < 400)
          .repartitionByRange(8, col("doc_id")).sortWithinPartitions("doc_id"))
      VersionedTable.append(s, root, docs.filter(col("doc_id") >= 400))
      VersionedTable.deleteWhere(s, root,
        Seq(SkippingIndex.ColRange("doc_id", 100, 199)))
      VersionedTable.changeFeed(s, root, 0L, 1L).withColumn("step", lit(1L))
        .unionByName(
          VersionedTable.changeFeed(s, root, 1L, 2L).withColumn("step", lit(2L)))
    }),

    // RESTORE as a commit: roll the table back to v0 WITHOUT copying
    // data — the rollback is itself a new time-travelable version, so
    // n_commits = 3 while the content equals v0 exactly
    "s27_restore" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s27_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents")
      VersionedTable.overwrite(s, root, docs.filter(col("doc_id") < 400))
      VersionedTable.overwrite(s, root, docs.filter(col("doc_id") >= 400))
      VersionedTable.restore(s, root, 0L)
      VersionedTable.read(s, root).select(col("doc_id"))
        .withColumn("n_commits",
          lit(VersionedTable.versions(root).size.toLong))
    }),

    // DESCRIBE HISTORY from the protocol's own metadata: overwrite (2
    // files) → idempotent append (+1 file, writer 'w') → restore of v0
    // (v0's own 2-file list re-committed, txn header carried) — the
    // whole history table rides into the hash: since r11 that includes
    // each commit's TIMESTAMP (injectable clock, for hash stability)
    // and OPERATION kind from its #meta header, beside file counts,
    // writers, schema stamps and retirement flags
    "s28_describe_history" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s28_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents")
      val tick = new java.util.concurrent.atomic.AtomicLong(0L)
      VersionedTable.withClock(() => 1000L * tick.incrementAndGet()) {
        VersionedTable.overwrite(s, root,
          docs.filter(col("doc_id") < 400).repartition(2))
        VersionedTable.appendIdempotent(s, root,
          docs.filter(col("doc_id") >= 400).repartition(1), "w", 0L)
        VersionedTable.restore(s, root, 0L)
      }
      VersionedTable.history(s, root)
        .select(col("version"), col("ts_ms"), col("operation"), col("n_files"),
          concat_ws(",", col("txn_writers")).as("writers"),
          col("has_schema"), col("retired"),
          (col("n_bytes") > 0).as("has_bytes"))
    }),

    // TIMESTAMP AS OF (the Delta surface the reference's audit-trail
    // culture queries): three commits stamped 1000 / 2000 / 2000 by the
    // injected clock — the probe at 1500 resolves to v0, and the probes
    // at 2000/2500 must BOTH resolve past the tie to v2 (same-instant
    // commits resolve to the HIGHEST version: version numbers are the
    // true commit order). The resolved version rides into the hash
    "s29_time_travel_ts" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s29_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents")
      val times = Array(1000L, 2000L, 2000L)
      val tick = new java.util.concurrent.atomic.AtomicInteger(0)
      VersionedTable.withClock(() => times(math.min(tick.getAndIncrement(), 2))) {
        VersionedTable.overwrite(s, root,
          docs.filter(col("doc_id") < 200).select("doc_id"))
        VersionedTable.append(s, root,
          docs.filter(col("doc_id") >= 200 && col("doc_id") < 400).select("doc_id"))
        VersionedTable.append(s, root,
          docs.filter(col("doc_id") >= 400).select("doc_id"))
      }
      Seq(1500L, 2000L, 2500L).map { ts =>
        VersionedTable.readAsOf(s, root, ts).select(col("doc_id"))
          .withColumn("probe_ts", lit(ts))
          .withColumn("version", lit(VersionedTable.timestampAsOf(root, ts)))
      }.reduce(_ unionByName _)
    }),

    // GENERAL-PREDICATE DELETE: an IN-list (not a range box) is the
    // exact row filter, while its bounding box [1001, 2500] is only the
    // PRUNING hint — footer stats still prove most range-clustered
    // files cannot hold a listed key, so they carry untouched (the
    // `bounded` column hashes that claim) and only the box's files
    // rewrite with the anti-filter
    "s30_delete_where_in" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s30_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      VersionedTable.overwrite(s, root,
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
          .repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      val (_, rewritten, carried) = VersionedTable.deleteWherePredicate(s, root,
        col("l_orderkey").isin(1001L, 1500L, 1999L, 2500L),
        Seq(SkippingIndex.ColRange("l_orderkey", 1001, 2500)))
      VersionedTable.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .withColumn("bounded", lit(carried > 0 && rewritten < carried))
        .orderBy("l_returnflag")
    }),

    // CONVERT TO VERSIONED in place: a flat Hive-partitioned parquet
    // table (written by plain Spark) upgrades by atomically MOVING its
    // files under data/ and committing v0 — zero rows rewritten. The
    // hash checks the converted content (partition column included, so
    // directory-derived values survived the move) and that a
    // POST-convert protocol op works: an evolving append lands v1
    "s31_convert_flat" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s31_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents")
      docs.filter(col("doc_id") < 400).select("doc_id", "n_chars", "lang")
        .write.partitionBy("lang").parquet(root) // a PLAIN flat table
      VersionedTable.convert(s, root)
      VersionedTable.append(s, root,
        docs.filter(col("doc_id") >= 400).select("doc_id", "n_chars", "lang"))
      VersionedTable.read(s, root).select("doc_id", "n_chars", "lang")
        .withColumn("n_commits",
          lit(VersionedTable.versions(root).size.toLong))
    }),

    // SHALLOW CLONE: zero-copy clone of v0 into a NEW table via hard
    // links, then the clone takes its own append while the source takes
    // a delete — the hash proves the two lifecycles fully decoupled
    // (clone = v0 + its own rows; source = head minus the deleted box)
    "s32_shallow_clone" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val src = s"${sys.props("java.io.tmpdir")}/graft_s32src_${math.abs(d.hashCode)}"
      val dst = s"${sys.props("java.io.tmpdir")}/graft_s32dst_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(src)); rm(new java.io.File(dst))
      val docs = t(s, d, "documents").select("doc_id", "lang")
      VersionedTable.overwrite(s, src, docs.filter(col("doc_id") < 400)
        .repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id"))
      VersionedTable.clone(s, src, dst)
      // diverge: source deletes a box, clone appends the tail
      VersionedTable.deleteWhere(s, src,
        Seq(SkippingIndex.ColRange("doc_id", 0, 99)))
      VersionedTable.append(s, dst, docs.filter(col("doc_id") >= 400))
      VersionedTable.read(s, src).withColumn("side", lit("src"))
        .unionByName(VersionedTable.read(s, dst).withColumn("side", lit("clone")))
        .orderBy("side", "doc_id")
    }),

    // CHECK constraints in the commit log (the Delta ALTER TABLE ADD
    // CONSTRAINT surface): the constraint is committed as metadata,
    // survives an overwrite, and every later append validates BEFORE
    // landing — the violating batch here is refused whole (spec-gated),
    // so the final content is exactly the clean rows. n_checks and
    // n_commits ride the hash; refusal semantics live in PipelineSpec
    "s33_check_constraint" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s33_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents").select("doc_id", "n_chars", "lang")
      VersionedTable.overwrite(s, root, docs.filter(col("doc_id") < 300))
      VersionedTable.addCheckConstraint(s, root, "chars_nonneg", "n_chars >= 0")
      // the constraint survives this overwrite (metadata carries)
      VersionedTable.overwrite(s, root, docs.filter(col("doc_id") < 400))
      val refused =
        try { // a violating batch must be refused WHOLE, before any data lands
          VersionedTable.append(s, root, docs.filter(col("doc_id") >= 400)
            .withColumn("n_chars", -col("n_chars") - lit(1))) // type-preserving negation
          false
        } catch { case e: IllegalArgumentException =>
          e.getMessage.contains("chars_nonneg") }
      VersionedTable.append(s, root, docs.filter(col("doc_id") >= 400))
      VersionedTable.read(s, root)
        .withColumn("n_checks",
          lit(VersionedTable.checkConstraints(root).size.toLong))
        .withColumn("refused_bad_batch", lit(refused))
    }),

    // GENERATED COLUMNS in the commit log (the Delta generated-column
    // surface): `bucket` is declared GENERATED AS pmod(doc_id, 10) —
    // the follow-up appends OMIT it and the table derives it (the
    // medallion shape: a fact's partition year derives at the table,
    // not in every writer); a batch carrying a WRONG value is refused
    // whole. Content + derivation correctness + the refusal in the hash
    "s34_generated_column" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s34_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents").select("doc_id", "lang")
      VersionedTable.overwrite(s, root,
        docs.filter(col("doc_id") < 300).withColumn("bucket", pmod(col("doc_id"), lit(10L))))
      VersionedTable.addGeneratedColumn(s, root, "bucket", "pmod(doc_id, 10)")
      // appends OMIT the column: the table derives it
      VersionedTable.append(s, root,
        docs.filter(col("doc_id") >= 300 && col("doc_id") < 400))
      val refused =
        try { // a wrong carried value must be refused whole
          VersionedTable.append(s, root, docs.filter(col("doc_id") >= 400)
            .withColumn("bucket", lit(99L)))
          false
        } catch { case e: IllegalArgumentException =>
          e.getMessage.contains("bucket") }
      VersionedTable.append(s, root, docs.filter(col("doc_id") >= 400))
      VersionedTable.read(s, root)
        .withColumn("refused_bad_value", lit(refused))
    }),

    // Bounded UPDATE ... SET (the DML twin of s30's bounded delete):
    // the exact predicate is a conjunction the box only over-covers
    // ([1001, 2000] plus a quantity cut footer stats don't see), hit
    // rows re-flag to 'U' and double their quantity — CASE WHEN
    // semantics the oracle replays — while files outside the box carry
    // byte-untouched (the `bounded` column hashes that claim)
    "s35_update_where" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s35_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      VersionedTable.overwrite(s, root,
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
          .repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      val (_, rewritten, carried) = VersionedTable.updateWhere(s, root,
        col("l_orderkey") >= 1001L && col("l_orderkey") <= 2000L &&
          col("l_quantity") < 25.0,
        Map("l_returnflag" -> lit("U"),
            "l_quantity" -> (col("l_quantity") * lit(2.0))),
        Seq(SkippingIndex.ColRange("l_orderkey", 1001, 2000)))
      VersionedTable.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .withColumn("bounded", lit(carried > 0 && rewritten < carried))
        .orderBy("l_returnflag")
    }),

    // METADATA-ONLY RENAME/DROP COLUMN (the Delta column-mapping
    // surface): one commit each, zero data files rewritten — v0 still
    // time-travels under its own names (v0_cols rides the hash), the
    // head serves the renamed view without the dropped column, and the
    // follow-up append addresses the NEW names. `metadata_only` hashes
    // the no-rewrite claim: the file list is IDENTICAL across both ops
    "s36_rename_drop_column" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s36_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents").select("doc_id", "n_chars", "lang", "source")
      VersionedTable.overwrite(s, root, docs.filter(col("doc_id") < 400))
      VersionedTable.renameColumn(s, root, "n_chars", "char_count")
      VersionedTable.dropColumn(s, root, "source")
      val untouched =
        VersionedTable.dataFiles(root, Some(0L)) ==
          VersionedTable.dataFiles(root, Some(2L))
      VersionedTable.append(s, root,
        docs.filter(col("doc_id") >= 400)
          .withColumnRenamed("n_chars", "char_count").drop("source"))
      VersionedTable.read(s, root)
        .withColumn("v0_cols",
          lit(VersionedTable.read(s, root, Some(0L)).columns.sorted.mkString(",")))
        .withColumn("metadata_only", lit(untouched))
    }),

    // FULL-FORM MERGE INTO (the three-clause Delta MERGE): one source
    // batch updates (s.price beats t.price), deletes (negative-price
    // sentinel rows — update does not fire, delete does), and inserts
    // (far keys at +1,000,000). File pruning derives from the SOURCE's
    // own keys — the exact point probe keeps the far inserts from
    // inflating the touched set, so `bounded` (carried > rewritten)
    // rides the hash alongside the full merged content
    "s37_merge_full" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s37_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val orders = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      VersionedTable.overwrite(s, root,
        orders.repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"))
      val source =
        orders.filter(col("o_orderkey") >= 1000L && col("o_orderkey") < 2000L)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .unionByName(
          orders.filter(col("o_orderkey") >= 2000L && col("o_orderkey") < 2500L)
            .withColumn("o_totalprice", lit(-1.0)))
        .unionByName(
          orders.filter(col("o_orderkey") < 100L)
            .withColumn("o_orderkey", col("o_orderkey") + lit(1000000L))
            .withColumn("o_orderstatus", lit("NEW")))
      val (_, rewritten, carried) = VersionedTable.mergeInto(s, root, source,
        Seq("o_orderkey"),
        updateWhen = Some(expr("s.o_totalprice > t.o_totalprice")),
        deleteWhen = Some(expr("s.o_totalprice < 0")),
        insertWhen = Some(lit(true)))
      VersionedTable.read(s, root)
        .withColumn("bounded", lit(carried > 0 && rewritten < carried))
    }),

    // KEY-LIST DELETE (the redaction / right-to-be-forgotten shape): the
    // doomed keys are a DATAFRAME — every 97th orderkey in [1000, 3000],
    // a list shape no literal IN fits at production scale — and pruning
    // derives from the list itself (global box + exact point probe), so
    // the range-clustered files outside the list carry byte-untouched
    // (`bounded` hashes that claim); survivors = NOT EXISTS semantics
    "s38_delete_key_list" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s38_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val li = t(s, d, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
      VersionedTable.overwrite(s, root,
        li.repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      val doomed = li.select(col("l_orderkey"))
        .filter(col("l_orderkey") >= 1000L && col("l_orderkey") <= 3000L &&
          col("l_orderkey") % 97 === 0).distinct()
      val (_, rewritten, carried) = VersionedTable.deleteWhereKeys(
        s, root, "l_orderkey", doomed)
      VersionedTable.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .withColumn("bounded", lit(carried > 0 && rewritten < carried))
        .orderBy("l_returnflag")
    }),

    // BOUNDED MAINTENANCE (OPTIMIZE ... WHERE + small-file compaction):
    // a range-clustered table takes a trail of four tiny appends (the
    // streaming-sink shape), then reclusters ONLY the hot box and packs
    // ONLY the small files — both content-preserving, both leaving the
    // cold region byte-untouched (the two bounded flags ride the hash
    // alongside the lossless content summary)
    "s39_bounded_maintenance" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s39_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val li = t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
      VersionedTable.overwrite(s, root,
        li.repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      (0 until 4).foreach { e =>
        VersionedTable.append(s, root, li.filter(col("l_orderkey") <= 20L)
          .select((col("l_orderkey") + lit(8000000L + e * 100000L)).as("l_orderkey"),
            col("l_partkey"), lit("E").as("l_returnflag"), col("l_quantity")))
      }
      val (_, rw1, c1) = VersionedTable.optimizeWhere(s, root,
        Seq("l_partkey"), 2, Seq(SkippingIndex.ColRange("l_orderkey", 1001, 2000)))
      val (_, rwC, cC) = VersionedTable.compactSmall(s, root,
        minBytes = 16L * 1024, targetBytes = 4L * 1024 * 1024)
      VersionedTable.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .withColumn("bounded_opt", lit(rw1 >= 1 && c1 > rw1))
        .withColumn("packed", lit(rwC >= 2 && cC >= 1))
        .orderBy("l_returnflag")
    }),

    // INCREMENTAL CLONE SYNC (the replication shape): a mirror created
    // by the first sync catches up to the source's churned head — an
    // append and a bounded delete — by hard-linking ONLY the new files;
    // a repeat sync with nothing new is a detected no-op (the flag
    // rides the hash), and the mirror's content equals the source head
    "s40_clone_sync" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val base = s"${sys.props("java.io.tmpdir")}/graft_s40_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(base))
      val src = s"$base/src"; val dst = s"$base/dst"
      val docs = t(s, d, "documents").select("doc_id", "lang")
      VersionedTable.overwrite(s, src, docs.filter(col("doc_id") < 400)
        .repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id"))
      VersionedTable.cloneSync(s, src, dst)
      VersionedTable.append(s, src, docs.filter(col("doc_id") >= 400))
      VersionedTable.deleteWhere(s, src, Seq(SkippingIndex.ColRange("doc_id", 0, 99)))
      VersionedTable.cloneSync(s, src, dst)
      val noop = VersionedTable.cloneSync(s, src, dst) == -1L
      VersionedTable.read(s, dst)
        .withColumn("resync_noop", lit(noop))
    }),

    // ROW PROVENANCE (the Iceberg/Delta _metadata shape, derived from
    // the protocol): every row serves with the version whose commit
    // added its file — three commits, three provenance classes, all in
    // the hash; the map rides a broadcast join on the scan's own
    // input_file_name, no extra pass
    "s41_provenance" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s41_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val docs = t(s, d, "documents").select("doc_id", "lang")
      VersionedTable.overwrite(s, root, docs.filter(col("doc_id") < 300))
      VersionedTable.append(s, root,
        docs.filter(col("doc_id") >= 300 && col("doc_id") < 400))
      VersionedTable.append(s, root, docs.filter(col("doc_id") >= 400))
      VersionedTable.readWithProvenance(s, root)
    }),

    // MERGE SCHEMA EVOLUTION (Delta autoMerge): the CDC source carries a
    // column the target lacks — with evolveSchema the column JOINS the
    // target schema (the commit re-stamps it), matched rows take it from
    // the source, inserts land with it, and every pre-merge row serves
    // NULL; a later plain append keeps the evolved schema
    "s42_merge_evolve" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s42_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val orders = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      VersionedTable.overwrite(s, root,
        orders.repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"))
      val source =
        orders.filter(col("o_orderkey") < 500L)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
          .withColumn("note", lit("upd"))
        .unionByName(
          orders.filter(col("o_orderkey") < 100L)
            .withColumn("o_orderkey", col("o_orderkey") + lit(1000000L))
            .withColumn("note", lit("ins")))
      val (_, rewritten, carried) = VersionedTable.mergeInto(s, root, source,
        Seq("o_orderkey"),
        updateWhen = Some(expr("s.o_totalprice > t.o_totalprice")),
        insertWhen = Some(lit(true)), evolveSchema = true)
      VersionedTable.read(s, root)
        .withColumn("bounded", lit(carried > 0 && rewritten < carried))
    }),

    // COMPOSITE-KEY MERGE pruning: a 2-key CDC batch (the reference's
    // multi-column fact merge keys) with a BIMODAL key spread — clustered
    // updates + far-away inserts whose global box covers the whole
    // table. The per-column point probes intersect, so only the files
    // really holding the update keys rewrite (`bounded` rides the hash)
    "s43_merge_composite" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s43_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val orders = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      VersionedTable.overwrite(s, root,
        orders.repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"))
      val source =
        orders.filter(col("o_orderkey") >= 1000L && col("o_orderkey") < 2000L)
          .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .unionByName(
          orders.filter(col("o_orderkey") < 100L)
            .withColumn("o_orderkey", col("o_orderkey") + lit(1000000L))
            .withColumn("o_orderstatus", lit("NEW")))
      val (_, rewritten, carried) = VersionedTable.mergeInto(s, root, source,
        Seq("o_orderkey", "o_custkey"),
        updateWhen = Some(expr("s.o_totalprice > t.o_totalprice")),
        insertWhen = Some(lit(true)))
      VersionedTable.read(s, root)
        .withColumn("bounded", lit(carried > 0 && rewritten < carried))
    }),

    // the FULL Delta CDF vocabulary: an in-place UPDATE surfaces in the
    // keyed feed as update_preimage + update_postimage (paired on the
    // business key), appends as insert, bounded deletes as delete — one
    // feed across the whole 4-commit history, scanning only the diffs
    "s44_change_feed_keyed" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s44_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val orders = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      VersionedTable.overwrite(s, root,
        orders.repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"))
      VersionedTable.updateWhere(s, root,
        col("o_orderkey") >= 1000L && col("o_orderkey") < 2000L,
        Map("o_totalprice" -> (col("o_totalprice") + lit(1000.0))),
        Seq(SkippingIndex.ColRange("o_orderkey", 1000, 1999)))
      VersionedTable.append(s, root,
        orders.filter(col("o_orderkey") < 100L)
          .withColumn("o_orderkey", col("o_orderkey") + lit(1000000L)))
      VersionedTable.deleteWhere(s, root,
        Seq(SkippingIndex.ColRange("o_orderkey", 3000, 3500)))
      VersionedTable.changeFeedKeyed(s, root, 0L, 3L, Seq("o_orderkey"))
        .orderBy("o_orderkey", "_change_type")
    }),

    // BLOOM-INDEXED KEY DELETE — the redaction shape on a HASHED key,
    // where min/max pruning is provably useless: every file's md5-key
    // range spans the table, so boxes and interval probes keep all 16
    // files. The per-file Bloom index answers "can this file hold this
    // exact key?" — the doomed keys belong to rows clustered into one
    // orderkey range, so the delete rewrites ~1 file of 16 and `bounded`
    // (rewritten ≥ 1 AND carried > rewritten) rides the hash. fpp=1e-6
    // keeps the false-positive expectation ≪ 1 file even at 10×
    "s45_bloom_key_delete" -> ((s, d) => {
      import graft.sources.{BloomIndex, VersionedTable}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s45_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val li = t(s, d, "lineitem")
        .select(md5(concat_ws(":", col("l_orderkey"), col("l_linenumber"))).as("doc_key"),
          col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      VersionedTable.overwrite(s, root,
        li.repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      val files = VersionedTable.dataFiles(root).map(r => (s"$root/$r", r))
      val idx = BloomIndex.indexFor(s, files, "doc_key", fpp = 1e-6)
      val doomed = li.filter(col("l_orderkey").between(1000L, 1100L))
        .select("doc_key")
      val (_, rewritten, carried) = VersionedTable.deleteWhereKeys(
        s, root, "doc_key", doomed, bloom = Some(idx))
      VersionedTable.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .withColumn("bounded", lit(rewritten >= 1 && carried > rewritten))
        .orderBy("l_returnflag")
    }),

    // AUTO-PRUNED PREDICATE DELETE — no hand-written box hint: the
    // engine extracts conservative bounding boxes from the predicate's
    // own Catalyst tree (between → range, AND → intersect) and decides
    // them against the commit list's write-time stats, so this delete
    // rewrites ~1 of 16 range-clustered files with ZERO caller hints
    // (`bounded` rides the hash)
    "s46_predicate_auto_prune" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s46_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val li = t(s, d, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
      VersionedTable.overwrite(s, root,
        li.repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      val (_, rewritten, carried) = VersionedTable.deleteWherePredicate(s, root,
        col("l_orderkey").between(1000L, 2000L) && col("l_returnflag") === "R")
      VersionedTable.read(s, root)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .withColumn("bounded", lit(rewritten >= 1 && carried > rewritten))
        .orderBy("l_returnflag")
    }),

    // AUTO-PRUNED FILTERED READ (readWhere) — the query-side twin: boxes
    // extract from a DISJUNCTIVE predicate (OR hulls per column, the
    // status leg drops out) and only surviving files are planned into
    // the scan; the exact predicate still filters rows, so the oracle is
    // the plain filtered aggregate. `pruned` (surviving files < total)
    // rides the hash
    "s47_read_where" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s47_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val orders = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      VersionedTable.overwrite(s, root,
        orders.repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"))
      val pred = (col("o_orderkey").between(500L, 1500L) &&
        col("o_orderstatus") === "F") || col("o_orderkey") === 42L
      val (nr, sr) = SkippingIndex.boxesOf(s,
        VersionedTable.read(s, root).schema, pred)
      val m = VersionedTable.statsManifest(root).get
      val pruned = m.survivors(nr, sr).size < m.files.size
      VersionedTable.readWhere(s, root, pred)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast(DecimalType(38, 2)).as("sum_price"))
        .withColumn("pruned", lit(pruned))
        .orderBy("o_orderstatus")
    }),

    // PLANNER-INTEGRATED SCAN (SnapshotFileIndex): the table served as a
    // HadoopFsRelation over a custom FileIndex — Spark's OWN pushdown
    // hands the WHERE clause to the index, which prunes files from the
    // commit-list stats with zero directory listing and zero fs stats at
    // plan time. No engine read API in the query: a plain filter over
    // the frame. `planned` (files listed < snapshot total) rides the hash
    "s48_planner_scan" -> ((s, d) => {
      import graft.sources.VersionedTable
      val root = s"${sys.props("java.io.tmpdir")}/graft_s48_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val li = t(s, d, "lineitem").select("l_orderkey", "l_returnflag", "l_quantity")
      VersionedTable.overwrite(s, root,
        li.repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      val (table, idx) = VersionedTable.tableWithIndex(s, root)
      val filtered = table.filter(col("l_orderkey").between(1000L, 2000L))
      filtered.count() // drive one planned scan so the index records it
      val planned = idx.lastPlanned.exists { case (p, t0) => p < t0 && p >= 1 }
      filtered.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .withColumn("planned", lit(planned))
        .orderBy("l_returnflag")
    }),

    // METADATA-ONLY COUNTS (Delta's stats-served count(*)): after an
    // overwrite + append + bounded delete, COUNT(*) and COUNT(col) are
    // answered from the commit list's write-time row/null counts — zero
    // files opened, zero tasks (the spec proves it with the data dir
    // hidden). `stats_only` (both served without a scan) rides the hash
    "s49_metadata_count" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s49_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(root))
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").as("k"),
          when(col("l_orderkey") % 10 === 0, lit(null))
            .otherwise(col("l_returnflag")).as("flag_n"))
      VersionedTable.overwrite(s, root,
        li.repartitionByRange(16, col("k")).sortWithinPartitions("k"))
      VersionedTable.append(s, root,
        li.filter(col("k") <= 100L)
          .select((col("k") + lit(10000000L)).as("k"), col("flag_n")))
      VersionedTable.deleteWhere(s, root,
        Seq(SkippingIndex.ColRange("k", 1000, 2000)))
      val nTotal = VersionedTable.statsRowCount(root)
      val nFlag = VersionedTable.statsNonNullCount(root, "flag_n")
      s.range(1).select(
        lit(nTotal.getOrElse(-1L)).as("n_total"),
        lit(nFlag.getOrElse(-1L)).as("n_flag"),
        lit(nTotal.isDefined && nFlag.isDefined).as("stats_only"))
    }),

    // ---- SQL-text DML surface (graft.sql: DSv2 catalog + rule) ----
    // The four storage-verb gates re-entered through vanilla spark.sql
    // text — same DuckDB oracles as their API twins (s24/s35/s11/s21),
    // so a green hash proves the SQL entry point computes EXACTLY what
    // the verb computes. Each gate registers a throwaway catalog over a
    // scratch warehouse; `bounded` rides the hash where the API twin
    // carried it, recomputed from the commit lists (carried files stay
    // byte-identical across the DML commit).
    "s50_sql_delete" -> ((s, d) => {
      import graft.sources.VersionedTable
      val (cat, root) = sqlGateCatalog(s, d, "s50")
      VersionedTable.overwrite(s, s"$root/t",
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
          .repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      s.sql(s"DELETE FROM $cat.t WHERE l_orderkey BETWEEN 1000 AND 2000 " +
        "AND l_returnflag = 'R'")
      val v0 = VersionedTable.fileStats(s"$root/t", Some(0L)).keySet
      val head = VersionedTable.fileStats(s"$root/t").keySet
      val carried = (head & v0).size
      val rewritten = (head -- v0).size
      s.sql(s"""SELECT l_returnflag, count(*) AS n,
               |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
               |  ${carried > 0 && rewritten < carried} AS bounded
               |FROM $cat.t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    "s51_sql_update" -> ((s, d) => {
      import graft.sources.VersionedTable
      val (cat, root) = sqlGateCatalog(s, d, "s51")
      VersionedTable.overwrite(s, s"$root/t",
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
          .repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      s.sql(s"UPDATE $cat.t SET l_returnflag = 'U', l_quantity = l_quantity * 2 " +
        "WHERE l_orderkey BETWEEN 1001 AND 2000 AND l_quantity < 25")
      val v0 = VersionedTable.fileStats(s"$root/t", Some(0L)).keySet
      val head = VersionedTable.fileStats(s"$root/t").keySet
      val carried = (head & v0).size
      val rewritten = (head -- v0).size
      s.sql(s"""SELECT l_returnflag, count(*) AS n,
               |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
               |  ${carried > 0 && rewritten < carried} AS bounded
               |FROM $cat.t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    "s52_sql_merge" -> ((s, d) => {
      import graft.sources.VersionedTable
      val (cat, root) = sqlGateCatalog(s, d, "s52")
      val ev = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type", "value")
      VersionedTable.overwrite(s, s"$root/t",
        ev.filter(col("ts") < to_timestamp(lit("2024-01-20 00:00:00")))
          .repartitionByRange(8, col("event_id")).sortWithinPartitions("event_id"))
      ev.filter(col("ts") >= to_timestamp(lit("2024-01-19 00:00:00")))
        .withColumn("value", col("value") + lit(1.0))
        .createOrReplaceTempView("s52_src")
      s.sql(s"""MERGE INTO $cat.t t USING s52_src s ON t.event_id = s.event_id
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql(s"SELECT event_id, ts, user_id, event_type, value FROM $cat.t")
        .orderBy("event_id")
    }),

    // FULL-FORM SQL MERGE (enrichment-join path): partial assignments,
    // expressions over t.*/s.*, per-clause conditions, delete-listed-
    // first ordering — the oracle replays the exact SQL semantics
    // (update keeps unassigned columns, insert NULLs them)
    "s54_sql_merge_full" -> ((s, d) => {
      import graft.sources.VersionedTable
      val (cat, root) = sqlGateCatalog(s, d, "s54")
      val ev = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type", "value")
      VersionedTable.overwrite(s, s"$root/t",
        ev.filter(col("ts") < to_timestamp(lit("2024-01-20 00:00:00")))
          .repartitionByRange(8, col("event_id")).sortWithinPartitions("event_id"))
      ev.filter(col("ts") >= to_timestamp(lit("2024-01-19 00:00:00")))
        .withColumn("op", when(col("event_id") % 7 === 0, lit("del")).otherwise(lit("inc")))
        .createOrReplaceTempView("s54_src")
      s.sql(s"""MERGE INTO $cat.t t USING s54_src s ON t.event_id = s.event_id
               |WHEN MATCHED AND s.op = 'del' THEN DELETE
               |WHEN MATCHED THEN UPDATE SET value = t.value + s.value,
               |  event_type = concat(t.event_type, '*')
               |WHEN NOT MATCHED AND s.op = 'inc' THEN
               |  INSERT (event_id, ts, value) VALUES (s.event_id, s.ts, s.value)""".stripMargin)
      s.sql(s"SELECT event_id, ts, user_id, event_type, value FROM $cat.t")
        .orderBy("event_id")
    }),

    // NMBS MERGE (VERDICT r13 #3): the full five-clause surface —
    // matched update/delete, conditional insert, and both NOT MATCHED
    // BY SOURCE clauses (delete listed first within its family) —
    // against a literal-semantics oracle (the s54 treatment)
    "s55_sql_merge_not_matched_by_source" -> ((s, d) => {
      import graft.sources.VersionedTable
      val (cat, root) = sqlGateCatalog(s, d, "s55")
      val ev = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type", "value")
      VersionedTable.overwrite(s, s"$root/t",
        ev.filter(col("ts") < to_timestamp(lit("2024-01-20 00:00:00")))
          .repartitionByRange(8, col("event_id")).sortWithinPartitions("event_id"))
      ev.filter(col("ts") >= to_timestamp(lit("2024-01-19 00:00:00")))
        .withColumn("op", when(col("event_id") % 7 === 0, lit("del")).otherwise(lit("inc")))
        .createOrReplaceTempView("s55_src")
      s.sql(s"""MERGE INTO $cat.t t USING s55_src s ON t.event_id = s.event_id
               |WHEN MATCHED AND s.op = 'del' THEN DELETE
               |WHEN MATCHED THEN UPDATE SET value = t.value + s.value
               |WHEN NOT MATCHED AND s.op = 'inc' THEN
               |  INSERT (event_id, ts, value) VALUES (s.event_id, s.ts, s.value)
               |WHEN NOT MATCHED BY SOURCE AND t.event_id % 5 = 0 THEN DELETE
               |WHEN NOT MATCHED BY SOURCE THEN
               |  UPDATE SET event_type = concat(t.event_type, '#')""".stripMargin)
      s.sql(s"SELECT event_id, ts, user_id, event_type, value FROM $cat.t")
        .orderBy("event_id")
    }),

    // SQL RESTORE + SHALLOW CLONE (parser extension): a bounded delete,
    // a metadata-only restore back to v0, a zero-copy clone, then a
    // delete on the CLONE alone — both tables' aggregates prove the
    // restore round-trip and the decoupled lifecycles
    "s56_sql_restore_clone" -> ((s, d) => {
      import graft.sources.VersionedTable
      val (cat, root) = sqlGateCatalog(s, d, "s56")
      VersionedTable.overwrite(s, s"$root/t",
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
          .repartitionByRange(8, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      s.sql(s"DELETE FROM $cat.t WHERE l_orderkey <= 1500")
      s.sql(s"RESTORE TABLE $cat.t TO VERSION AS OF 0")
      s.sql(s"CREATE TABLE $cat.t2 SHALLOW CLONE $cat.t")
      s.sql(s"DELETE FROM $cat.t2 WHERE l_orderkey > 3000")
      s.sql(s"""SELECT l_returnflag, count(*) AS n,
               |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
               |  'restored' AS side
               |FROM $cat.t GROUP BY l_returnflag
               |UNION ALL
               |SELECT l_returnflag, count(*) AS n,
               |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
               |  'clone' AS side
               |FROM $cat.t2 GROUP BY l_returnflag
               |ORDER BY side, l_returnflag""".stripMargin)
    }),

    // ONE-COMMIT filtered overwrite (replaceWhere — the DSv2
    // OverwriteByExpression verb behind INSERT OVERWRITE ... PARTITION
    // and writeTo(...).overwrite(cond)): rows in the key band leave,
    // the replacement rows land, atomically; files outside the band
    // carry byte-untouched (`bounded` rides the hash)
    "s57_replace_where" -> ((s, d) => {
      import graft.sources.VersionedTable
      val (cat, root) = sqlGateCatalog(s, d, "s57")
      VersionedTable.overwrite(s, s"$root/t",
        t(s, d, "lineitem").select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
          .repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
      val repl = t(s, d, "lineitem")
        .filter(col("l_orderkey").between(1000, 2000))
        .select(col("l_orderkey"), col("l_partkey"),
          lit("X").as("l_returnflag"), (col("l_quantity") * 2).as("l_quantity"))
      repl.writeTo(s"$cat.t").overwrite(col("l_orderkey").between(1000, 2000))
      val v0 = VersionedTable.fileStats(s"$root/t", Some(0L)).keySet
      val head = VersionedTable.fileStats(s"$root/t").keySet
      val carried = (head & v0).size
      val rewritten = (head -- v0).size
      s.sql(s"""SELECT l_returnflag, count(*) AS n,
               |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
               |  ${VersionedTable.versions(s"$root/t") == Seq(0L, 1L)} AS one_commit,
               |  ${carried > 0 && rewritten < carried} AS bounded
               |FROM $cat.t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    "s53_sql_time_travel" -> ((s, d) => {
      import graft.sources.VersionedTable
      val (cat, root) = sqlGateCatalog(s, d, "s53")
      val docs = t(s, d, "documents")
      VersionedTable.overwrite(s, s"$root/t", docs.filter(col("doc_id") < 400))
      VersionedTable.append(s, s"$root/t", docs.filter(col("doc_id") >= 400))
      s.sql(s"""SELECT doc_id, CAST(0 AS BIGINT) AS version
               |FROM $cat.t VERSION AS OF 0
               |UNION ALL
               |SELECT doc_id, CAST(1 AS BIGINT) AS version FROM $cat.t
               |ORDER BY version, doc_id""".stripMargin)
    }),

    "s18_jsonl_roundtrip" -> ((s, d) => {
      import graft.sources.JsonLines
      val dir = s"${sys.props("java.io.tmpdir")}/graft_s18_${math.abs(d.hashCode)}"
      val docs = t(s, d, "documents")
      JsonLines.write(docs, dir)
      JsonLines.read(s, dir, docs.schema)
    }),

    // ORC interchange round trip through the generic FileFormatSource —
    // the columnar-format sibling of s18 (same lossless-oracle shape:
    // green hash ⇒ the source/sink pair preserves every value and type)
    "s19_orc_roundtrip" -> ((s, d) => {
      import graft.sources.FileFormatSource
      val dir = s"${sys.props("java.io.tmpdir")}/graft_s19_${math.abs(d.hashCode)}"
      val docs = t(s, d, "documents")
      docs.write.mode("overwrite").format("orc").save(s"$dir/documents.orc")
      FileFormatSource(dir, "orc", Seq("documents"),
        Map("documents" -> docs.schema)).read(s, "documents")
    }),

    // s17 on a HIVE-PARTITIONED layout (the engine's own gold-table
    // shape): the manifest recurses into year=… directories, partition
    // path values give exact bounds for l_year, and the string range on
    // l_returnflag rides the truncated footer bounds — the oracle is the
    // plain filtered aggregate, so a green hash proves recursion +
    // partition-value pruning + basePath reassembly lose nothing
    "s20_partitioned_prune" -> ((s, d) => {
      import graft.sources.SkippingIndex
      import graft.sources.SkippingIndex.{ColRange, StrRange}
      val dir = s"${sys.props("java.io.tmpdir")}/graft_s20_${math.abs(d.hashCode)}"
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
          year(col("l_shipdate")).as("l_year"))
        .write.mode("overwrite").partitionBy("l_year").parquet(dir)
      SkippingIndex.prunedRead(s, dir,
          Seq(ColRange("l_year", 1994, 1995), ColRange("l_orderkey", 0, 30000)),
          strRanges = Seq(StrRange("l_returnflag", "N", "R")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // ---- §2.2 projections / filters ----
    "p1_identifier_normalize" -> ((s, d) => {
      // exercises the normalizer on messy source-style names
      val cleaned = Identifiers.cleanAll(Seq("Región Key!", "Región Name"))
      t(s, d, "region").toDF(cleaned: _*).orderBy("region_key")
    }),

    "p2_standardize_types" -> ((s, d) => {
      // decode from ts_ns, the encoding-normalized epoch-nanos long that
      // Tables.events derives for ANY fixture ts encoding. The DuckDB
      // oracle's epoch_ns(ts) covers the encodings DuckDB itself decodes
      // as timestamps (timestamp[us]/timestamp_ns logical types); a
      // fixture shipping ts as BARE INT64 would error on the oracle side
      // while this path still works — which is why MakeScale re-encodes a
      // LongType ts to timestamp_ntz before writing scaled fixtures
      val ev = Tables.events(s, d)
      val secs = floor(col("ts_ns").cast(DecimalType(38, 0)) / lit(1000000000)).cast("long")
      ev.select(
        col("event_id"),
        Standardize.epochDecode(col("ts_ns")).as("ts_decoded"),
        Standardize.epochDecode(secs).as("ts_from_seconds"),
        Standardize.nullifySentinels(col("event_type")).as("event_type"),
        Standardize.cleanFloat(col("value")).as("value")
      )
    }),

    "p5_segment_filter" -> ((s, d) =>
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey")),

    "p6_quarantine_clean" -> ((s, d) => {
      val (clean, _) = Quarantine.split(t(s, d, "lineitem"), lineitemRules)
      clean.select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
    }),

    "p6_quarantine_rows" -> ((s, d) => {
      val (_, quar) = Quarantine.split(t(s, d, "lineitem"), lineitemRules)
      quar.select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          col("l_extendedprice"), col("quarantine_reason"))
    }),

    // expectations summary: per-rule violation counts in one agg pass
    "p14_dq_report" -> ((s, d) =>
      Quarantine.report(t(s, d, "lineitem"), lineitemRules)),

    "p7_drop_all_null" -> ((s, d) =>
      Quarantine.dropAllNull(t(s, d, "documents"))
        .select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")),

    "p9_watermark_filter" -> ((s, d) =>
      Incremental.watermarkScan(Tables.events(s, d), "ts",
          to_timestamp(lit("2024-01-25 00:00:00")), 3600L)
        .select("event_id", "ts", "event_type")),

    "p10_control_probe" -> ((s, d) =>
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .orderBy(col("ts").desc, col("event_id").desc).limit(1)
        .select("event_id", "ts", "user_id")),

    // ---- §2.3 joins ----
    "j2_filtered_dim_reuse" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val am = c.filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("am_key"), col("c_name").as("am_name"))
      val kam = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("kam_key"), col("c_name").as("kam_name"))
      o.join(broadcast(am), o("o_custkey") === am("am_key"), "left")
        .join(broadcast(kam), o("o_custkey") === kam("kam_key"), "left")
        .select("o_orderkey", "am_name", "kam_name")
    }),

    "j8_changed_keys_semi" -> ((s, d) => {
      val changed = Incremental.changedKeys(t(s, d, "orders"), Seq("o_custkey"),
          "o_orderdate", to_timestamp(lit("2001-06-01 00:00:00")))
        .withColumnRenamed("o_custkey", "c_custkey")
      Incremental.restrictToChanged(t(s, d, "customer"), changed, Seq("c_custkey"))
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "j9_anti_orphans" -> ((s, d) => {
      val o = t(s, d, "orders").select(col("o_custkey").as("c_custkey"))
      t(s, d, "customer").join(o, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // ---- §2.4 aggregations ----
    "a1_max_watermark" -> ((s, d) =>
      Tables.events(s, d).agg(max(col("ts")).as("wm"))),

    "a2_count_rows" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))),

    "a3_distinct_keys" -> ((s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01 00:00:00")))
        .select("o_custkey").distinct().orderBy("o_custkey")),

    "a6_date_range" -> ((s, d) =>
      t(s, d, "orders").agg(min(col("o_orderdate")).as("dmin"),
        max(col("o_orderdate")).as("dmax"))),

    "a7_measures" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer").select("c_custkey", "c_mktsegment")
      val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      val salesOnly = Measures.sumWhere(col("o_orderstatus") === "F", dec2(col("o_totalprice")))
      val total = sum(dec2(col("o_totalprice")))
      joined.groupBy(col("c_mktsegment").as("market_segment"))
        .agg(
          salesOnly.cast(DecimalType(38, 2)).as("sales_only"),
          total.cast(DecimalType(38, 2)).as("total_value"),
          count(lit(1)).as("n_orders"),
          (Measures.divide(salesOnly, total) * lit(100.0)).as("achievement_pct"))
        .orderBy("market_segment")
    }),

    "q1_pricing_summary" -> ((s, d) => {
      val one = lit(1).cast(DecimalType(3, 2))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("sum_base_price"),
          sum(dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2))))
            .cast(DecimalType(38, 4)).as("sum_disc_price"),
          (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- §2.5 windows ----
    "w1_dedup_latest_dim" -> ((s, d) =>
      Dedup.keepLatest(
          Tables.events(s, d).select("user_id", "event_type", "event_id", "ts"),
          Seq("user_id", "event_type"), Seq(col("ts").desc, col("event_id").desc))
        .orderBy("user_id", "event_type")),

    "w2_fact_pattern_dedup" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val order = Dedup.totalOrder(li, Seq("l_orderkey"),
        Seq(col("l_shipdate").desc, col("l_linenumber").desc),
        Seq("l_shipdate", "l_linenumber"))
      Dedup.dedupFactByPattern(li, Seq("orderkey"), order)
    }),

    "w4_running_total" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("running_value",
          sum(dec2(col("value"))).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            .cast(DecimalType(38, 2)))
        .select("event_id", "user_id", "ts", "running_value")),

    "w5_session_gap" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .select("event_id", "user_id", "gap_us")
    }),

    // first-touch attribution: each purchase credits the FIRST event of
    // its 30-minute-gap session (the marketing-analytics classic on top
    // of the w5 sessionization; one user-keyed shuffle feeds all three
    // windows — same sort order, no extra exchange)
    "w12_first_touch" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, d)
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("gap_us").isNull || col("gap_us") > lit(1800000000L), 1L)
            .otherwise(0L))
        .withColumn("sess", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val ws = Window.partitionBy("user_id", "sess")
        .orderBy(col("ts"), col("event_id"))
      ev.withColumn("attributed_event_id", first(col("event_id")).over(ws))
        .withColumn("attributed_type", first(col("event_type")).over(ws))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("sess"),
          col("attributed_event_id"), col("attributed_type"),
          col("value").as("revenue"))
    }),

    // ordered-sequence funnel: users reaching each stage IN timestamp
    // order (first signup → first view after it → first purchase after
    // that). Stage frames are per-user minima — one user-keyed shuffle
    // each, then tiny (≤ |users|) broadcast-able joins; the conversion
    // report is three 1-row counts unioned
    "w10_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val s2 = ev.filter(col("event_type") === "view")
        .join(broadcast(s1), Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(broadcast(s2), Seq("user_id")).filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      s1.agg(count(lit(1)).as("users")).withColumn("stage", lit("signup"))
        .unionByName(s2.agg(count(lit(1)).as("users"))
          .withColumn("stage", lit("view_after_signup")))
        .unionByName(s3.agg(count(lit(1)).as("users"))
          .withColumn("stage", lit("purchase_after_view")))
        .select("stage", "users")
    }),

    // cohort retention matrix: users bucketed by first-seen week, counted
    // distinct in each later activity week. Two user-keyed aggregates and
    // a broadcast of the (≤ |users|) cohort frame — the classic
    // triangle report with no user×week blowup
    "w11_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d).select("user_id", "ts")
      val cohort = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
      val active = ev
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
      active.join(broadcast(cohort), Seq("user_id"))
        .withColumn("weeks_since",
          (datediff(col("week"), col("cohort_week")) / 7).cast("long"))
        .groupBy("cohort_week", "weeks_since")
        .agg(count_distinct(col("user_id")).as("active_users"))
    }),

    "w6_topk_per_group" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      t(s, d, "orders").withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    }),

    // ---- §2.7 set ops ----
    "u2_date_domain" -> ((s, d) =>
      t(s, d, "orders").select(to_date(col("o_orderdate")).as("d"))
        .union(t(s, d, "lineitem").select(to_date(col("l_shipdate")).as("d")))
        .distinct()),

    "u3_set_except" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    "u4_set_intersect" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // CDC snapshot diff: old = orders before 1997-06-01; new = orders
    // before 1998-01-01 minus every 97th key (deletes), every 100th key
    // repriced (updates) -> insert/update/delete classification
    "u5_snapshot_diff" -> ((s, d) => {
      val o = t(s, d, "orders")
      def slice(df: org.apache.spark.sql.DataFrame) = df.select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("o_totalprice"))
      val oldSnap = slice(o.filter(col("o_orderdate") < lit("1997-06-01")))
      val newSnap = slice(
        o.filter(col("o_orderdate") < lit("1998-01-01") &&
            pmod(col("o_orderkey"), lit(97)) =!= 0)
          .withColumn("o_totalprice",
            when(pmod(col("o_orderkey"), lit(100)) === 0,
              col("o_totalprice") + 1).otherwise(col("o_totalprice"))))
      graft.operators.Incremental.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
    }),

    // point-in-interval range join, equi-ized by time binning: every
    // error event opens a 5-minute window; count the same user's events
    // inside it. A naive BETWEEN join is a nested-loop cartesian — the
    // binned form shuffles both sides once on (user, bin) and keeps the
    // BETWEEN as a residual (plan shape locked in OperatorSpec)
    "u6_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val win = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("window_start"),
          (col("ts") + expr("INTERVAL 5 MINUTES")).as("window_end"))
      graft.operators.Joins.intervalJoin(
          ev.select("user_id", "ts", "value"), win,
          Seq("user_id"), "ts", "window_start", "window_end", binSeconds = 300L)
        .groupBy("user_id", "window_start")
        .agg(count(lit(1)).as("n_events"), max(col("value")).as("max_value"))
    }),

    // interval-OVERLAP join (binned, exactly-once in the later start's
    // bin): error windows × purchase windows of the same user — "did a
    // purchase happen near an error" attribution without a cartesian
    "u7_overlap_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      def win(tpe: String, pre: String) = ev.filter(col("event_type") === tpe)
        .select(col("user_id"), col("ts").as(s"${pre}_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as(s"${pre}_end"))
      graft.operators.Joins.overlapJoin(
          win("error", "err"), win("purchase", "buy"), Seq("user_id"),
          "err_start", "err_end", "buy_start", "buy_end", binSeconds = 600L)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_overlaps"),
          max(col("err_start")).as("last_err_start"))
    }),

    // ---- grouping sets / scalar breadth / having ----
    "a10_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "f1_scalar_suite" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("name_masked"),
        length(col("c_name")).as("name_len"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("DEFAULT")).as("seg_or_default"),
        round(col("c_acctbal")).cast("long").as("bal_rounded"),
        abs(col("c_acctbal")).cast(DecimalType(18, 2)).as("bal_abs"))),

    // SQL API surface: the same engine through spark.sql over a temp view
    "f2_sql_surface" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("graft_lineitem")
      s.sql(
        """SELECT l_returnflag,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
          |  COUNT(*) AS n
          |FROM graft_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),

    "q18_large_orders" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val big = li.groupBy("l_orderkey")
        .agg(sum(dec2(col("l_quantity"))).cast(DecimalType(38, 2)).as("total_qty"))
        .filter(col("total_qty") > 150)
      val o = t(s, d, "orders")
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("order_date"), col("total_qty"))
    }),

    // ---- streaming-equivalent batch shapes ----
    "st1_tumbling_window" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("value"))).cast(DecimalType(38, 2)).as("total_value"))
    }),

    "st2_session_window" -> ((s, d) =>
      graft.streaming.Streams.sessionWindows(Tables.events(s, d), "30 minutes")),

    // sliding windows via the real window(ts, 1h, 15m) expression: each
    // event lands in 4 epoch-aligned overlapping windows
    "st3_sliding_window" -> ((s, d) =>
      graft.streaming.Streams.slidingCountsBatch(Tables.events(s, d),
        "1 hour", "15 minutes")),

    // stream-stream interval join, batch shape: each purchase matched to
    // the same user's clicks in the preceding hour. The streaming twin
    // ([[graft.streaming.Streams.joinStreams]], StreamingSpec) runs the
    // SAME join with watermarks on both sides so state expires — this
    // gate pins the join semantics the stream must converge to
    "st4_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("r_event_id"), col("user_id").as("r_user_id"),
          col("ts").as("r_ts"))
      purchases.join(clicks,
          col("user_id") === col("r_user_id") &&
            col("r_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
            col("r_ts") <= col("ts"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("r_event_id"), col("r_ts"))
    }),

    // the OUTER watermarked interval join's batch shape, gating
    // streaming/Streams.joinStreams directly (joinType=left_outer):
    // purchases that never saw a click inside the hour surface
    // null-padded — the semantics the inner st4 cannot express.
    // StreamingSpec proves the streaming run equals this twin.
    "st5_outer_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.streaming.Streams.joinStreams(purchases, clicks, "user_id",
          maxGap = "1 hour", joinType = "left_outer")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("r_event_id"), col("r_ts"))
    }),

    // batch twin of the STATE-STORE streaming dedup (flatMapGroupsWith
    // State seeded with the settled corpus via initial state): per-doc
    // accept/reject decisions for an id-ordered arrival. StreamingSpec
    // proves the multi-micro-batch streaming run emits exactly this set
    "st6_dedup_state" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.streaming.Streams.dedupStateBatch(
        docs.filter(col("doc_id") >= 400), "doc_id", "text",
        docs.filter(col("doc_id") < 400), "text")
    }),

    // batch twin of the streaming CMS monitor: three per-slice sketches
    // merged by counter sums — by mergeability ≡ the whole-corpus grid,
    // which is exactly what the oracle replays (so the hash gate IS the
    // merge-correctness proof); StreamingSpec proves the foreachBatch
    // run converges to the same grid bit-for-bit
    "st7_cms_stream" -> ((s, d) => {
      import graft.operators.Profile
      val docs = t(s, d, "documents")
      def toks(df: DataFrame) = df
        .select(explode(graft.ext.TextStats.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      Seq(docs.filter(col("doc_id") < 400),
          docs.filter(col("doc_id") >= 400 && col("doc_id") < 450),
          docs.filter(col("doc_id") >= 450))
        .map(sl => Profile.countMinSketch(toks(sl), "term", depth = 4,
          width = 256, seed = "cms9"))
        .reduce(_ unionByName _)
        .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    }),

    // batch twin of the streaming weighted reservoir: per-slice A-ES
    // top-k merged and re-cut — deterministic scores make the result
    // bit-equal to the one-shot draw over everything, which is what
    // the oracle replays; StreamingSpec proves the foreachBatch run
    // converges to the same reservoir
    "st8_es_reservoir" -> ((s, d) => {
      import graft.operators.{Ranks, Sampling}
      val docs = t(s, d, "documents")
      // merge re-cut via the two-phase global top-k (VERDICT r15 #3) —
      // same (rounded score, id) order, no single-partition window
      Ranks.topK(
        Seq(docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250))
          .map(sl => Sampling.weightedSampleWithoutReplacement(
            sl, col("doc_id"), "n_chars", k = 25, seed = "res1"))
          .reduce(_ unionByName _),
        Seq(round(col("es_score"), 9), col("doc_id")), 25,
        bucket = col("doc_id"))
        .select(col("doc_id"), round(col("es_score"), 6).as("es_score"))
    }),

    // batch twin of the streaming CDC upsert sink: three change slices
    // folded through the incoming-wins MERGE (slice 2 beats slice 1
    // beats slice 0 per key; within a slice the highest event_id wins).
    // The oracle replays the SAME last-writer-wins order as one window
    // over the whole history — a green hash proves iterated MERGE
    // converges to the one-shot state, out-of-order versions included;
    // StreamingSpec proves the foreachBatch stream equals this fold
    // bit-for-bit and that a replayed stream no-ops
    "st9_cdc_upsert" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select("event_id", "user_id", "event_type", "value")
      graft.streaming.Streams.cdcUpsertBatch(
        Seq(ev.filter(pmod(col("event_id"), lit(3)) === 0),
            ev.filter(pmod(col("event_id"), lit(3)) === 1),
            ev.filter(pmod(col("event_id"), lit(3)) === 2)),
        Seq("user_id"), Seq(col("event_id").desc))
        .orderBy("user_id")
    }),

    // the engine consuming its OWN change feed end-to-end: a versioned
    // source takes an overwrite, an append, and a bounded delete; the
    // micro-batch consumer emits changeFeed(v-1, v) per commit and folds
    // each slice into a keyed target table exactly-once (epoch = source
    // version in the target's #txn header). The hash checks the folded
    // target equals the source's final state row-for-row, `n_folded`
    // that every commit became exactly one slice, and `replay_noop`
    // that a full second drain commits nothing; StreamingSpec proves
    // the fold ≡ batch changeFeed fold ≡ direct merge
    "st10_change_feed_stream" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val src = s"${sys.props("java.io.tmpdir")}/graft_st10src_${math.abs(d.hashCode)}"
      val tgt = s"${sys.props("java.io.tmpdir")}/graft_st10tgt_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(src)); rm(new java.io.File(tgt))
      val ev = t(s, d, "events").select("event_id", "user_id", "event_type", "value")
      VersionedTable.overwrite(s, src, ev.filter(col("event_id") < 600)
        .repartitionByRange(8, col("event_id")).sortWithinPartitions("event_id"))
      VersionedTable.append(s, src, ev.filter(col("event_id") >= 600))
      VersionedTable.deleteWhere(s, src,
        Seq(SkippingIndex.ColRange("event_id", 100, 299)))
      val keys = Seq("event_id")
      val order = Seq(col("event_id").desc)
      val folded = graft.streaming.Streams.changeFeedConsume(
        s, src, tgt, keys, order, "cdc")
      val replay = graft.streaming.Streams.changeFeedConsume(
        s, src, tgt, keys, order, "cdc")
      VersionedTable.read(s, tgt)
        .withColumn("n_folded", lit(folded))
        .withColumn("replay_noop", lit(replay == 0L))
        .orderBy("event_id")
    }),

    // the BOUNDED streaming MERGE sink (st9's successor at scale): three
    // arrival slices fold through epoch-gated mergeIntoIdempotent — per
    // epoch only the files the batch's keys touch rewrite, delete
    // markers ('op' = D, a CONDITION-ONLY extra column) remove their
    // key, and the version guard keeps older changes from regressing
    // state. Slices are ascending event_id ranges, so the fold equals
    // one window: the globally-latest row per user decides (absent if
    // it is a delete). replay_noop hashes exactly-once
    "st12_merge_sink" -> ((s, d) => {
      import graft.sources.VersionedTable
      val tgt = s"${sys.props("java.io.tmpdir")}/graft_st12_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(tgt))
      val ev = t(s, d, "events").select("event_id", "user_id", "event_type", "value")
        .withColumn("op",
          when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
      val m = ev.agg(max("event_id")).collect()(0).getLong(0)
      val slices = Seq(
        ev.filter(col("event_id") <= m / 3),
        ev.filter(col("event_id") > m / 3 && col("event_id") <= 2 * m / 3),
        ev.filter(col("event_id") > 2 * m / 3))
      val n = graft.streaming.Streams.mergeSinkBatch(
        s, slices, tgt, Seq("user_id"), "event_id", "op", "w")
      val replay = graft.streaming.Streams.mergeSinkBatch(
        s, slices, tgt, Seq("user_id"), "event_id", "op", "w")
      VersionedTable.read(s, tgt)
        .withColumn("n_committed", lit(n))
        .withColumn("replay_noop", lit(replay == 0L))
        .orderBy("user_id")
    }),

    // st10 through the REAL streaming engine: readStream over the
    // versioned-feed SOURCE (offset = commit version, one diff slice per
    // micro-batch via maxVersionsPerTrigger=1) → foreachBatch CDC fold →
    // idempotent versioned target. Same oracle as st10 — a green hash
    // proves the engine-driven feed equals the direct state; the
    // replay_noop column proves a fresh query over the same history
    // (batchIds restart at 0) re-commits nothing
    "st11_feed_source_stream" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val src = s"${sys.props("java.io.tmpdir")}/graft_st11src_${math.abs(d.hashCode)}"
      val tgt = s"${sys.props("java.io.tmpdir")}/graft_st11tgt_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(src)); rm(new java.io.File(tgt))
      val ev = t(s, d, "events").select("event_id", "user_id", "event_type", "value")
      VersionedTable.overwrite(s, src, ev.filter(col("event_id") < 600)
        .repartitionByRange(8, col("event_id")).sortWithinPartitions("event_id"))
      VersionedTable.append(s, src, ev.filter(col("event_id") >= 600))
      VersionedTable.deleteWhere(s, src,
        Seq(SkippingIndex.ColRange("event_id", 100, 299)))
      val keys = Seq("event_id")
      val order = Seq(col("event_id").desc)
      graft.streaming.Streams.changeFeedStream(s, src, tgt, keys, order,
        "cdcs", maxVersionsPerTrigger = Some(1L))
      val nAfter = VersionedTable.versions(tgt).size
      graft.streaming.Streams.changeFeedStream(s, src, tgt, keys, order, "cdcs")
      VersionedTable.read(s, tgt)
        .withColumn("n_folded", lit(nAfter.toLong))
        .withColumn("replay_noop",
          lit(VersionedTable.versions(tgt).size == nAfter))
        .orderBy("event_id")
    }),

    // `spark.readStream.table("wh.t")` (VERDICT r13 #6): the PLAIN
    // append stream through the DSv2 catalog — initial snapshot, then
    // only new commits' rows, in the table's own schema; a DELETE
    // commit is unrepresentable and SKIPS whole under skipChangeCommits
    // (the refusal twin is spec-gated); a later append still flows
    "st14_readstream_table" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val (cat, root) = sqlGateCatalog(s, d, "st14")
      val out = s"${sys.props("java.io.tmpdir")}/graft_st14out_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(out))
      val ev = t(s, d, "events").select("event_id", "user_id", "event_type", "value")
      VersionedTable.overwrite(s, s"$root/t", ev.filter(col("event_id") < 600)
        .repartitionByRange(8, col("event_id")).sortWithinPartitions("event_id"))
      VersionedTable.append(s, s"$root/t", ev.filter(col("event_id") >= 600))
      def run(skip: Boolean): Long = {
        var r = s.readStream
        if (skip) r = r.option("skipChangeCommits", "true")
        val q = r.table(s"$cat.t").writeStream
          .option("checkpointLocation", s"$out/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            // isEmpty + write = two executions of the batch plan without
            // a persist (r16, guide §1.2: fewer passes)
            b.persist()
            try if (!b.isEmpty) b.write.mode("append").parquet(s"$out/rows")
            finally b.unpersist()
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
        s.read.parquet(s"$out/rows").count()
      }
      val n1 = run(skip = false) // snapshot + the append commit
      VersionedTable.deleteWhere(s, s"$root/t",
        Seq(SkippingIndex.ColRange("event_id", 0, 99)))
      val n2 = run(skip = true) // the delete commit skips whole
      VersionedTable.append(s, s"$root/t",
        ev.filter(col("event_id") < 50)
          .select((col("event_id") + lit(1000000L)).as("event_id"),
            col("user_id"), col("event_type"), col("value")))
      run(skip = true) // ... and the next append still flows
      s.read.parquet(s"$out/rows")
        .withColumn("skip_noop", lit(n2 == n1))
        .orderBy("event_id")
    }),

    // the Delta CDF start surface on the feed source: a stream pinned
    // to startingVersion=1 SKIPS the initial snapshot and serves
    // exactly the later commits' diffs (insert slice of the append,
    // delete slice of the bounded delete) — the "tail the table from
    // now" consumer never pays a full-table first batch. The refusal
    // twin rides the hash: after a keep-1 vacuum the same pin fails
    // loudly at stream START (its diff is gone), not mid-flight
    "st13_feed_starting_version" -> ((s, d) => {
      import graft.sources.{SkippingIndex, VersionedTable}
      val src = s"${sys.props("java.io.tmpdir")}/graft_st13src_${math.abs(d.hashCode)}"
      val out = s"${sys.props("java.io.tmpdir")}/graft_st13out_${math.abs(d.hashCode)}"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(src)); rm(new java.io.File(out)); rm(new java.io.File(out + "_x"))
      val ev = t(s, d, "events").select("event_id", "user_id", "event_type", "value")
      VersionedTable.overwrite(s, src, ev.filter(col("event_id") < 600)
        .repartitionByRange(8, col("event_id")).sortWithinPartitions("event_id"))
      VersionedTable.append(s, src, ev.filter(col("event_id") >= 600))
      VersionedTable.deleteWhere(s, src,
        Seq(SkippingIndex.ColRange("event_id", 100, 299)))
      val feed = graft.streaming.Streams.feedDump(s, src, out,
        startingVersion = Some(1L), maxVersionsPerTrigger = Some(1L))
      val tooOldRefused = {
        VersionedTable.vacuum(src, keep = Some(1), minAgeMs = 0L)
        def mentionsPin(e: Throwable): Boolean =
          e != null && (Option(e.getMessage).exists(_.contains("startingVersion")) ||
            mentionsPin(e.getCause))
        try {
          graft.streaming.Streams.feedDump(s, src, out + "_x",
            startingVersion = Some(1L))
          false
        } catch { case e: Throwable => mentionsPin(e) }
      }
      feed.select(col("event_id"),
          col(graft.streaming.VersionedFeedSource.ChangeType).as("change_type"),
          col(graft.streaming.VersionedFeedSource.CommitVersion).as("commit_version"))
        .withColumn("too_old_refused", lit(tooOldRefused))
        .orderBy("event_id", "change_type")
    }),

    // approximate distinct (HLL++) — scale substitute for exact COUNT
    // DISTINCT; engine-specific sketch, rows-only (ExtSpec bounds the error)
    "a9_approx_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy("l_returnflag")),

    // approximate percentiles (t-digest-style sketch) — the 100 TB answer
    // to a11's exact sort-based quantiles; engine-specific, rows-only
    // (OperatorSpec bounds the error against the exact percentile)
    "a13_approx_percentiles" -> ((s, d) =>
      t(s, d, "orders").groupBy("o_orderstatus")
        .agg(approx_percentile(col("o_totalprice"), lit(0.5), lit(1000)).as("p50_approx"))
        .orderBy("o_orderstatus")),

    // ---- as-of (point-in-time) join ----
    "j10_asof_purchase" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // right side: purchases, deduped to one row per (user, ts)
      val purchases = Dedup.keepLatest(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("p_event"), col("value").as("p_value")),
        Seq("user_id", "ts"), Seq(col("p_event").desc))
      AsOfJoin.asOf(
        ev.select("event_id", "user_id", "ts"), purchases,
        keys = Seq("user_id"), timeCol = "ts",
        valueCols = Seq("p_event", "p_value"), rightTiebreak = Seq("p_event"))
        .select("event_id", "user_id", "asof_p_event", "asof_p_value")
    }),

    // mean imputation: null/NaN values filled with the user's mean
    // (window aggregate — no second scan, no join)
    "p13_impute_mean" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val clean = Standardize.cleanFloat(col("value"))
      Tables.events(s, d)
        .withColumn("user_mean",
          sum(dec2(clean)).over(w).cast("double") / count(clean).over(w))
        .select(col("event_id"), col("user_id"),
          coalesce(clean, col("user_mean")).as("value_imputed"))
    }),

    "f3_regex_extract" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
        regexp_extract(col("c_mktsegment"), "^([A-Z]+)", 1).as("seg_word"))),

    // ---- deterministic sampling ----
    "p11_hash_sample" -> ((s, d) =>
      Sampling.hashSample(t(s, d, "orders"), col("o_orderkey"), Seq("0", "1", "2", "3"))
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    "p12_stratified_sample" -> ((s, d) =>
      Sampling.stratifiedHashSample(t(s, d, "orders"), col("o_orderkey"),
          col("o_orderstatus"),
          Map("F" -> Seq("0"), "O" -> Seq("0", "1", "2", "3"), "P" -> (0 to 15).map(_.toHexString)))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")),

    // training-mix construction: recipe-weighted sources via the same
    // deterministic md5 gate at 1/65536 granularity — src0 kept whole,
    // src1 half, src2 a quarter, src3 at 1%, the rest dropped
    "p15_weighted_mix" -> ((s, d) =>
      Sampling.weightedMix(t(s, d, "documents"), col("doc_id"), col("source"),
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.01))
        .select("doc_id", "source")),

    // exact-N eval split: exactly 20 docs per source, deterministically —
    // md5-ordered rank per stratum behind the skew-safe hash-threshold
    // prefilter (which saturates to keep-all at fixture sizes)
    "p16_exact_stratified" -> ((s, d) =>
      Sampling.exactStratifiedSample(t(s, d, "documents"),
          col("doc_id"), "source", n = 20)
        .select("doc_id", "source")),

    // temperature mix: data-derived recipe weights (kept ∝ n^α) over the
    // skewed lang distribution — α=0.5 up-samples tail languages; the
    // whole construction (count agg → α-shares → broadcast gate) replays
    // in SQL, so the oracle covers the derivation, not just the gate
    "p17_temperature_mix" -> ((s, d) =>
      Sampling.temperatureMix(t(s, d, "documents"), col("doc_id"), "lang",
          alpha = 0.5, target = 300L)
        .select("doc_id", "lang")),

    // deterministic global shuffle + sharding — the training-export step:
    // every order gets a reproducible (shard, pos); workers read shards
    // independently in pos order. Seeded md5, no RNG — the oracle replays
    // the shard byte and the per-shard rank verbatim
    "p18_global_shuffle" -> ((s, d) =>
      Sampling.globalShuffle(t(s, d, "orders").select("o_orderkey"),
          col("o_orderkey"), seed = "r8", nShards = 8)
        .select("o_orderkey", "shard", "pos")),

    // curriculum export: hash-stratified shards, easy→hard within each
    // (n_chars as the difficulty proxy), hash tiebreak on equal scores
    "p21_curriculum_shards" -> ((s, d) =>
      Sampling.curriculumShards(t(s, d, "documents").select("doc_id", "n_chars"),
          col("doc_id"), col("n_chars"), seed = "r8c", nShards = 4)
        .select("doc_id", "n_chars", "shard", "pos")),

    // COMPOSED export: epoch-expanded recipe → global shuffle keyed on
    // (doc, epoch), so the copies of an upsampled doc land in
    // independent shards instead of colocating (a trainer never sees
    // the same text twice in one shard pass)
    "p22_epoch_shards" -> ((s, d) =>
      Sampling.globalShuffle(
          Sampling.upsampleMix(t(s, d, "documents"), col("doc_id"), "source",
              Map("src0" -> 2.0, "src1" -> 1.0))
            .select("doc_id", "source", "epoch"),
          concat_ws(":", col("doc_id"), col("epoch")),
          seed = "r8e", nShards = 8)
        .select("doc_id", "epoch", "shard", "pos")),

    // token-BUDGET corpus sizing: admit docs per source in seeded-hash
    // order until ~800 tokens each — how training mixes are actually
    // sized (doc-count quotas over-weight short-doc sources)
    "p19_token_budget" -> ((s, d) =>
      Sampling.tokenBudgetSample(
          t(s, d, "documents").withColumn("n_tok",
            size(graft.ext.TextStats.tokens(col("text"))).cast("long")),
          col("doc_id"), "source", col("n_tok"), budget = 800L)
        .select("doc_id", "source", "n_tok")),

    // epoch-expanded recipe materialization: weights > 1 duplicate whole
    // strata (2.5 epochs of src0), fractions gate deterministically;
    // each copy carries an epoch ordinal
    "p20_upsample_mix" -> ((s, d) =>
      Sampling.upsampleMix(t(s, d, "documents"), col("doc_id"), "source",
          Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25, "src3" -> 0.0))
        .select("doc_id", "source", "epoch")),

    // ---- exact percentiles / pivot / ranking breadth ----
    "a11_percentiles" -> ((s, d) =>
      t(s, d, "orders").groupBy("o_orderstatus")
        .agg(percentile(col("o_totalprice"), lit(0.25)).as("p25"),
          percentile(col("o_totalprice"), lit(0.5)).as("p50"),
          percentile(col("o_totalprice"), lit(0.75)).as("p75"))
        .orderBy("o_orderstatus")),

    "a12_pivot_status" -> ((s, d) =>
      t(s, d, "orders").groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P")).agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")),

    // RANGE frame: sum of orders within a 1000-wide price band below each
    // row, per priority — exercises RangeFrame (vs the RowFrame in w4)
    "w8_range_frame" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority").orderBy(col("o_totalprice"))
        .rangeBetween(-1000L, 0L)
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_in_band"))
    }),

    // TPC-H q14 shape: share of revenue from one product-type family —
    // fact⋈dim join + conditional aggregation ratio
    "q14_promo_share" -> ((s, d) => {
      val one = lit(1).cast(DecimalType(3, 2))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("2000-07-01 00:00:00")))
      val p = t(s, d, "part").select(col("p_partkey"), col("p_type"))
      val rev = dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2)))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .agg(
          sum(when(col("p_type").startsWith("STANDARD"), rev)).cast(DecimalType(38, 4))
            .as("standard_revenue"),
          sum(rev).cast(DecimalType(38, 4)).as("total_revenue"))
        .withColumn("standard_pct",
          col("standard_revenue").cast("double") / col("total_revenue").cast("double") * lit(100.0))
    }),

    // math-function breadth (engine-portable subset: floor/ceil/round/
    // sqrt/abs/sign/pmod are correctly-rounded or integral — exp/ln are
    // NOT libm-portable and stay out of oracled outputs)
    "f4_math_suite" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        ceil(col("o_totalprice")).cast("long").as("price_ceil"),
        round(col("o_totalprice"), 1).as("price_round1"),
        sqrt(abs(col("o_totalprice"))).as("price_sqrt"),
        signum(col("o_totalprice")).cast("int").as("price_sign"),
        pmod(col("o_orderkey"), lit(97)).cast("int").as("key_mod"))),

    // date-function breadth (dayofweek aligned to ISO Monday=1 on both
    // sides; DuckDB's native dayofweek starts at Sunday=0)
    "f5_date_suite" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"),
        date_add(to_date(col("o_orderdate")), 30).as("d_plus30"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate"))).cast("int").as("days_to_2002"),
        dayofweek(col("o_orderdate")).cast("int").as("dow_sun1"),
        weekofyear(col("o_orderdate")).cast("int").as("iso_week"))),

    // fixed-width value histogram (feature-binning primitive): floor-bucket
    // on exact cent-quantized values — double division is engine-portable
    // here because cent gaps dwarf the half-ulp rounding window
    "f6_value_histogram" -> ((s, d) =>
      t(s, d, "orders")
        .select(floor(col("o_totalprice").cast("double") / 25000.0)
          .cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))),

    // equi-DEPTH histogram (f6's fixed-width complement): 10 equal-
    // population buckets of o_totalprice per order priority — the
    // range-partitioner / CBO-selectivity profile; id tiebreak pins tied
    // values to deterministic buckets on both engines
    "f11_equidepth_histogram" -> ((s, d) =>
      graft.operators.Profile.equiDepthHistogram(
        t(s, d, "orders").select(col("o_orderpriority"),
          col("o_totalprice").cast("double").as("price"), col("o_orderkey")),
        "o_orderpriority", "price", "o_orderkey", buckets = 10)),

    // column-profiling census (onboarding / data-contract primitive):
    // one wide aggregate -> long format, exact distincts (the Expand cost
    // is bounded by the 5 profiled columns; approxProfile is the
    // full-table variant, spec-bounded in OperatorSpec)
    "f7_column_profile" -> ((s, d) =>
      operators.Profile.profile(t(s, d, "documents")).orderBy("column")),

    // robust outlier screen: per-type median/MAD flags (50% breakdown
    // point — the screen mean/σ rules fail on); raw events load, the
    // value column is ts-encoding-independent
    "f9_mad_outliers" -> ((s, d) =>
      operators.Profile.madOutliers(
          t(s, d, "events").select("event_id", "event_type", "value"),
          "event_type", "value")
        .select("event_id", "event_type", "value", "med", "mad", "is_outlier")),

    // semi-structured extraction: typed from_json with an EXPLICIT schema
    // (schema_of_json sampling is a driver-side hazard at scale — the
    // schema is a contract, not an inference), extracted field aggregated
    // per event type. Nulls on malformed payloads, never a job failure.
    "f8_json_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("events"),
          count(col("k")).as("k_present"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))),

    // TPC-H q6 shape: forecast revenue change — tight scan-filter-agg,
    // the pushdown/pruning stress case
    "q6_forecast_revenue" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("2001-01-01 00:00:00")) &&
          col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
        .agg(sum(dec2(col("l_extendedprice")) * col("l_discount").cast(DecimalType(3, 2)))
          .cast(DecimalType(38, 4)).as("revenue_delta"),
          count(lit(1)).as("n_lines"))),

    // TPC-H q17 shape, manually decorrelated: parts whose lineitems fall
    // under 20% of that part's average quantity (correlated scalar
    // subquery -> per-key pre-aggregation + equi-join)
    "q17_small_quantity" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val thresholds = li.groupBy(col("l_partkey").as("t_partkey"))
        .agg(((sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))) * 0.2)
          .as("qty_threshold"))
      li.join(thresholds, li("l_partkey") === col("t_partkey"))
        .filter(dec2(col("l_quantity")).cast("double") < col("qty_threshold"))
        .agg(sum(dec2(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("small_qty_revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // SCD Type-2: per-user event_type history with validity intervals
    "w9_scd2_history" -> ((s, d) =>
      Scd2.history(
        Tables.events(s, d).select("user_id", "event_type", "ts", "event_id"),
        keys = Seq("user_id"), attrs = Seq("event_type"),
        tsCol = "ts", tiebreak = Seq(col("event_id").asc))),

    // unpivot/melt: wide numeric columns -> (metric, value) long form
    "a14_unpivot" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"),
          col("c_acctbal").cast("double").as("acctbal"),
          col("c_nationkey").cast("double").as("nationkey"))
        .unpivot(Array(col("c_custkey")),
          Array(col("acctbal"), col("nationkey")), "metric", "value")),

    // CUBE grouping (all four grouping-set combinations)
    "a15_cube" -> ((s, d) =>
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    "w7_rank_suite" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cum_dist"))
    }),

    // ---- X5 calendar ----
    "x5_calendar_dim" -> ((s, d) =>
      CalendarDim.fromDomain(t(s, d, "orders"), "o_orderdate").orderBy("date_key")),

    // ---- analytic benchmarks (TPC-H-style shapes over the fixtures) ----
    "q3_shipping_priority" -> ((s, d) => {
      val one = lit(1).cast(DecimalType(3, 2))
      val cutoff = to_timestamp(lit("2000-03-15 00:00:00"))
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = t(s, d, "orders").filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = t(s, d, "lineitem").filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"))
        .agg(sum(dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2))))
          .cast(DecimalType(38, 4)).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    }),

    "q5_local_supplier_volume" -> ((s, d) => {
      val one = lit(1).cast(DecimalType(3, 2))
      val c = t(s, d, "customer").select("c_custkey", "c_nationkey")
      val o = t(s, d, "orders").select("o_orderkey", "o_custkey")
      val l = t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val su = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
      val n = t(s, d, "nation")
      val r = t(s, d, "region").filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2))))
          .cast(DecimalType(38, 4)).as("revenue"))
        .orderBy("n_name")
    }),

    // ---- remaining TPC-H shapes (q2..q22), adapted to the fixture's
    // columns (no partsupp table, no commit/receipt dates) but keeping
    // each query's canonical PLAN structure: correlated-min subquery (q2),
    // EXISTS (q4), multi-nation joins (q7/q8/q9), group-top-k (q10),
    // scalar-subquery HAVING (q11), conditional counts (q12), outer-join
    // double agg (q13), argmax-by-scalar-subquery (q15), disjunctive
    // join predicate (q19), EXISTS+NOT EXISTS (q21), anti-join +
    // threshold subquery (q22) ----

    // q2: for each qualifying part, the supplier(s) with the MINIMUM
    // account balance among that part's suppliers in EUROPE — the
    // correlated scalar-min decorrelated to a per-key pre-agg + equi-join
    "q2_min_balance_supplier" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_type") === "STANDARD" && col("p_size") < 25)
        .select("p_partkey", "p_name")
      val supply = t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
      val su = t(s, d, "supplier")
      val n = t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val r = t(s, d, "region").filter(col("r_name") === "EUROPE").select("r_regionkey")
      val eur = supply
        .join(broadcast(su), col("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      val minBal = eur.groupBy(col("l_partkey").as("mb_partkey"))
        .agg(min(col("s_acctbal")).as("min_bal"))
      eur.join(broadcast(p), col("l_partkey") === p("p_partkey"))
        .join(minBal, col("l_partkey") === col("mb_partkey") &&
          col("s_acctbal") === col("min_bal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(20)
    }),

    // q4: orders of 1995Q2 with at least one lineitem shipped after the
    // order date (EXISTS -> left-semi with a residual inequality)
    "q4_order_priority" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1995-04-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1995-07-01 00:00:00")))
      val l = t(s, d, "lineitem").select(col("l_orderkey").as("lk"), col("l_shipdate"))
      o.join(l, o("o_orderkey") === col("lk") && col("l_shipdate") > o("o_orderdate"),
          "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // q7: shipping volume between two nations, both directions, by year
    "q7_volume_shipping" -> ((s, d) => {
      val one = lit(1).cast(DecimalType(3, 2))
      val su = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
      val c = t(s, d, "customer").select("c_custkey", "c_nationkey")
      val o = t(s, d, "orders").select("o_orderkey", "o_custkey")
      val n1 = t(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), su("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), c("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2))))
          .cast(DecimalType(38, 4)).as("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // q8: market share of NATION_5 suppliers among ASIA customers for one
    // part type, by order year — conditional sum over total, one IEEE
    // division on both engines
    "q8_market_share" -> ((s, d) => {
      val one = lit(1).cast(DecimalType(3, 2))
      val p = t(s, d, "part").filter(col("p_type") === "ECONOMY").select("p_partkey")
      val l = t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val c = t(s, d, "customer").select("c_custkey", "c_nationkey")
      val n1 = t(s, d, "nation").select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val r = t(s, d, "region").filter(col("r_name") === "ASIA").select("r_regionkey")
      val su = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val vol = dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2)))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), c("c_nationkey") === col("cn_key"))
        .join(broadcast(r), col("n_regionkey") === r("r_regionkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n2), su("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_5", vol)
            .otherwise(lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))))
          .cast(DecimalType(38, 4)).cast("double") /
          sum(vol).cast(DecimalType(38, 4)).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    }),

    // q9: profit by supplier nation and year for one part type; the
    // partsupp supply cost is absent in the fixture, so the cost analogue
    // is retailprice * quantity * 0.10 — exact decimal end to end
    "q9_product_profit" -> ((s, d) => {
      val one = lit(1).cast(DecimalType(3, 2))
      val cost = lit(new java.math.BigDecimal("0.10")).cast(DecimalType(3, 2))
      val p = t(s, d, "part").filter(col("p_type") === "PROMO")
        .select("p_partkey", "p_retailprice")
      val su = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
      val n = t(s, d, "nation").select("n_nationkey", "n_name")
      val o = t(s, d, "orders").select("o_orderkey", "o_orderdate")
      val l = t(s, d, "lineitem")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2))) -
            dec2(col("p_retailprice")) * dec2(col("l_quantity")) * cost)
          .cast(DecimalType(38, 4)).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // q10: returned-item revenue per customer for one quarter, top 20
    "q10_returned_items" -> ((s, d) => {
      val one = lit(1).cast(DecimalType(3, 2))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1995-10-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1996-01-01 00:00:00")))
        .select("o_orderkey", "o_custkey")
      val l = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2))))
          .cast(DecimalType(38, 4)).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    }),

    // q11: parts whose EUROPE-supplied value exceeds 1.5x the AVERAGE
    // part value — the scalar-subquery HAVING with a SCALE-FREE threshold
    // (an absolute fraction empties out as the part count grows), compared
    // as one IEEE double expression on both engines
    "q11_important_parts" -> ((s, d) => {
      val su = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
      val n = t(s, d, "nation").select("n_nationkey", "n_regionkey")
      val r = t(s, d, "region").filter(col("r_name") === "EUROPE").select("r_regionkey")
      val l = t(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
      val eur = l.join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("l_partkey"),
          (dec2(col("l_extendedprice")) * dec2(col("l_quantity"))).as("val"))
      val total = eur.agg(
        sum(col("val")).cast(DecimalType(38, 2)).cast("double").as("tot"),
        countDistinct(col("l_partkey")).as("nparts"))
      eur.groupBy("l_partkey")
        .agg(sum(col("val")).cast(DecimalType(38, 2)).as("part_value"))
        .crossJoin(broadcast(total))
        .filter(col("part_value").cast("double") > col("tot") / col("nparts") * 1.5)
        .select(col("l_partkey"), col("part_value"))
    }),

    // q12: conditional priority counts over late-shipped lines of one year
    "q12_priority_shipping" -> ((s, d) => {
      val o = t(s, d, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // q13: customer order-count distribution (outer join + double agg)
    "q13_order_distribution" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      val c = t(s, d, "customer").select("c_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // q15: supplier(s) achieving the maximum quarterly revenue — argmax
    // via a 1-row broadcast of the max, exact-decimal equality
    "q15_top_supplier" -> ((s, d) => {
      val one = lit(1).cast(DecimalType(3, 2))
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2))))
          .cast(DecimalType(38, 4)).as("total_revenue"))
      val maxRev = rev.agg(max("total_revenue").as("max_revenue"))
      rev.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .join(broadcast(t(s, d, "supplier")), col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // q16: supplier variety per part attribute triple, excluding flagged
    // suppliers — NOT IN as an anti join over the supply relation, then a
    // distinct-count aggregation
    "q16_part_supplier_variety" -> ((s, d) => {
      val supply = t(s, d, "lineitem").select("l_partkey", "l_suppkey").distinct()
      val p = t(s, d, "part").filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val flagged = t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_suppkey"))
      supply
        .join(broadcast(flagged), col("l_suppkey") === col("bad_suppkey"), "left_anti")
        .join(broadcast(p), col("l_partkey") === p("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // q20: suppliers in one region that shipped a dominant share (>30%) of
    // some target-type part's yearly volume — the nested-IN chain
    // decorrelated to per-pair and per-part aggregates joined on the part
    "q20_dominant_suppliers" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_type") === "ECONOMY").select("p_partkey")
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .join(broadcast(p), col("l_partkey") === p("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"), dec2(col("l_quantity")).as("qty"))
      val perPair = li.groupBy(col("l_partkey").as("pk"), col("l_suppkey"))
        .agg(sum(col("qty")).cast(DecimalType(38, 2)).as("pair_qty"))
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(col("qty")).cast(DecimalType(38, 2)).as("part_qty"))
      val dominant = perPair
        .join(perPart, col("pk") === col("l_partkey"))
        .filter(col("pair_qty").cast("double") > col("part_qty").cast("double") * 0.3)
        .select(col("l_suppkey")).distinct()
      val n = t(s, d, "nation").select("n_nationkey", "n_regionkey")
      val r = t(s, d, "region").filter(col("r_name") === "AMERICA").select("r_regionkey")
      t(s, d, "supplier")
        .join(dominant, col("s_suppkey") === dominant("l_suppkey"), "left_semi")
        .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy("s_suppkey")
    }),

    // q19: three OR'd brand/size/quantity conjunction groups as a single
    // disjunctive JOIN predicate (plus the equi-key, so it stays a hash
    // join with a residual filter, never a cartesian)
    "q19_disjunctive_revenue" -> ((s, d) => {
      val one = lit(1).cast(DecimalType(3, 2))
      val p = t(s, d, "part").select("p_partkey", "p_brand", "p_size")
      val l = t(s, d, "lineitem")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey") && (
          (p("p_brand") === "Brand#2" && p("p_size").between(1, 5) &&
            l("l_quantity").between(1, 11)) ||
          (p("p_brand") === "Brand#3" && p("p_size").between(1, 10) &&
            l("l_quantity").between(10, 20)) ||
          (p("p_brand") === "Brand#4" && p("p_size").between(1, 15) &&
            l("l_quantity").between(20, 30))))
        .agg(sum(dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2))))
          .cast(DecimalType(38, 4)).as("revenue"), count(lit(1)).as("n_lines"))
    }),

    // q21: suppliers whose late line sits in a multi-supplier order where
    // NO other supplier was late — EXISTS as residual-condition semi join,
    // NOT EXISTS as residual-condition anti join
    "q21_waiting_suppliers" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val l = t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
      val lo = l.join(o, l("l_orderkey") === o("o_orderkey"))
      val late = lo.filter(col("l_shipdate") > col("o_orderdate"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      val allPairs = lo.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
        .distinct()
      val latePairs = late.select(col("ok").as("ok3"), col("sk").as("sk3")).distinct()
      val su = t(s, d, "supplier").select("s_suppkey", "s_name", "s_nationkey")
      val n = t(s, d, "nation").select("n_nationkey", "n_regionkey")
      val r = t(s, d, "region").filter(col("r_name") === "EUROPE").select("r_regionkey")
      late
        .join(allPairs, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
        .join(latePairs, col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
        .join(broadcast(su), col("sk") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(10)
    }),

    // q22: customers in a key-derived "country" group with above-average
    // positive balance and no RECENT orders (every fixture customer has
    // some order, so the anti join keys on the recent window) — threshold
    // from a 1-row broadcast (sum exact decimal, ONE division), then anti
    "q22_sales_opportunity" -> ((s, d) => {
      val c = t(s, d, "customer").withColumn("cntrycode", col("c_custkey") % 7)
        .filter(col("cntrycode").isin(0, 1, 2, 3))
      val thr = c.filter(col("c_acctbal") > 0)
        .agg((sum(dec2(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00")))
        .select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("avg_bal"))
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"),
          sum(dec2(col("c_acctbal"))).cast(DecimalType(38, 2)).as("totacctbal"))
        .orderBy("cntrycode")
    }),

    // full A7 DAX measure set over the star: Sales Only, COGS analogue,
    // Gross Margin, Budget Variance, Achievement % — grouped by region
    "a8_star_measures" -> ((s, d) => {
      val rates = Star.rateDim(t(s, d, "nation"))
      val sales = Star.factSales(t(s, d, "lineitem"), t(s, d, "orders"),
        t(s, d, "customer"), rates)
      val dimc = Star.dimCustomer(t(s, d, "customer"), t(s, d, "nation"), t(s, d, "region"))
        .select("customer_key", "region_name")
      val budget = Star.factBudget(t(s, d, "orders"))
        .join(broadcast(dimc), Seq("customer_key"))
        .groupBy("region_name")
        .agg(sum(col("budget_eur")).cast(DecimalType(18, 2)).as("budget_total"))
      val m = sales.join(broadcast(dimc), Seq("customer_key"))
        .groupBy("region_name")
        .agg(
          // (38,2), not (28,8): keeps the unscaled value < 2^53 so the final
          // decimal->double cast is a single correctly-rounded step in both
          // engines (an 8-dec unscaled sum overflows the exact-double range)
          Measures.sumWhere(col("document_category") === "Sale", col("sales_eur"))
            .cast(DecimalType(38, 2)).as("sales_only"),
          sum(col("taxes_eur")).cast(DecimalType(38, 2)).as("total_taxes"))
        .withColumn("gross_margin",
          (col("sales_only") - col("total_taxes")).cast(DecimalType(38, 2)))
      m.join(budget, Seq("region_name"), "left")
        .withColumn("budget_variance",
          (col("sales_only") - col("budget_total")).cast(DecimalType(38, 2)))
        .withColumn("achievement_pct",
          Measures.divide(col("sales_only"), col("budget_total")) * lit(100.0))
        .select("region_name", "sales_only", "total_taxes", "gross_margin",
          "budget_total", "budget_variance", "achievement_pct")
        .orderBy("region_name")
    }),

    // ---- Gold star builds (J1-J8 + §2.8 math) ----
    "g1_dim_customer" -> ((s, d) =>
      Star.dimCustomer(t(s, d, "customer"), t(s, d, "nation"), t(s, d, "region"))),

    "g2_dim_product" -> ((s, d) =>
      Star.dimProduct(t(s, d, "part"))),

    "g3_fact_sales" -> ((s, d) =>
      Star.factSales(t(s, d, "lineitem"), t(s, d, "orders"), t(s, d, "customer"),
          Star.rateDim(t(s, d, "nation")))),

    "g4_fact_orders" -> ((s, d) =>
      Star.factOrders(t(s, d, "orders"), t(s, d, "customer"),
          Star.rateDim(t(s, d, "nation")))),

    "g5_fact_budget" -> ((s, d) =>
      Star.factBudget(t(s, d, "orders")))
  )

  private val lineitemRules = Quarantine.Rules(
    refDate = lit(java.sql.Date.valueOf("1998-06-01")),
    horizonDays = 730,
    maxVal = 100000.0,
    minVal = -1.0,
    valueColMatch = _.toLowerCase.contains("price"))

  // ------------------------------------------------------------ oracle SQL

  private val ratesCte =
    """rates AS (
      |  SELECT n_nationkey,
      |         CAST(CAST(n_nationkey + 100 AS DECIMAL(10,2)) * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(10,4)) AS rate
      |  FROM nation WHERE n_nationkey % 3 <> 0
      |)""".stripMargin

  private val monthCaseEs =
    """CASE CAST(month(d) AS INT) WHEN 1 THEN 'Enero' WHEN 2 THEN 'Febrero' WHEN 3 THEN 'Marzo'
      | WHEN 4 THEN 'Abril' WHEN 5 THEN 'Mayo' WHEN 6 THEN 'Junio' WHEN 7 THEN 'Julio'
      | WHEN 8 THEN 'Agosto' WHEN 9 THEN 'Septiembre' WHEN 10 THEN 'Octubre'
      | WHEN 11 THEN 'Noviembre' ELSE 'Diciembre' END""".stripMargin.replace("\n", "")

  def oracleSql: Map[String, String] =
    (coreOracles ++ graft.queries.ExtQueries.oracleSql).map { case (n, sql) =>
      n -> decimalOutputCols.get(n).map(cs => asDouble(sql, cs)).getOrElse(sql)
    }

  /** DuckDB-side twin of [[finalizeOutput]]: rewrites the named decimal
    * output columns to DOUBLE without touching the internal decimal math.
    */
  private def asDouble(sql: String, cols: Seq[String]): String =
    s"SELECT * REPLACE (${cols.map(c => s"CAST($c AS DOUBLE) AS $c").mkString(", ")}) FROM (\n$sql\n) _q"

  /** Queries whose output carries decimal columns (kept in sync with the
    * query definitions; [[finalizeOutput]] discovers them from the schema,
    * the oracle needs them spelled out). */
  private val decimalOutputCols: Map[String, Seq[String]] = Map(
    "a10_rollup"              -> Seq("sum_qty"),
    "a7_measures"             -> Seq("sales_only", "total_value"),
    "a8_star_measures"        -> Seq("sales_only", "total_taxes", "gross_margin",
                                     "budget_total", "budget_variance"),
    "f1_scalar_suite"         -> Seq("bal_abs"),
    "f2_sql_surface"          -> Seq("sum_qty"),
    "g1_dim_customer"         -> Seq("account_balance"),
    "g2_dim_product"          -> Seq("retail_price"),
    "g3_fact_sales"           -> Seq("quantity", "sales_eur", "taxes_eur"),
    "g4_fact_orders"          -> Seq("order_value_eur"),
    "g5_fact_budget"          -> Seq("budget_eur"),
    "q14_promo_share"         -> Seq("standard_revenue", "total_revenue"),
    "q6_forecast_revenue"     -> Seq("revenue_delta"),
    "q17_small_quantity"      -> Seq("small_qty_revenue"),
    "q18_large_orders"        -> Seq("total_qty"),
    "q1_pricing_summary"      -> Seq("sum_qty", "sum_base_price", "sum_disc_price"),
    "s17_pruned_scan"         -> Seq("sum_qty"),
    "s20_partitioned_prune"   -> Seq("sum_qty"),
    "s24_delete_where"        -> Seq("sum_qty"),
    "s30_delete_where_in"     -> Seq("sum_qty"),
    "s35_update_where"        -> Seq("sum_qty"),
    "s38_delete_key_list"     -> Seq("sum_qty"),
    "s39_bounded_maintenance" -> Seq("sum_qty"),
    "s45_bloom_key_delete"    -> Seq("sum_qty"),
    "s46_predicate_auto_prune"-> Seq("sum_qty"),
    "s47_read_where"          -> Seq("sum_price"),
    "s48_planner_scan"        -> Seq("sum_qty"),
    "s50_sql_delete"          -> Seq("sum_qty"),
    "s51_sql_update"          -> Seq("sum_qty"),
    "s56_sql_restore_clone"   -> Seq("sum_qty"),
    "s57_replace_where"       -> Seq("sum_qty"),
    "q3_shipping_priority"    -> Seq("revenue"),
    "q5_local_supplier_volume"-> Seq("revenue"),
    "q7_volume_shipping"      -> Seq("volume"),
    "q9_product_profit"       -> Seq("sum_profit"),
    "q10_returned_items"      -> Seq("revenue"),
    "q11_important_parts"     -> Seq("part_value"),
    "q15_top_supplier"        -> Seq("total_revenue"),
    "q19_disjunctive_revenue" -> Seq("revenue"),
    "q22_sales_opportunity"   -> Seq("totacctbal"),
    "st1_tumbling_window"     -> Seq("total_value"),
    "st2_session_window"      -> Seq("total_value"),
    "w4_running_total"        -> Seq("running_value"))

  private val coreOracles: Map[String, String] = Map(
    "s1_full_scan" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    "s4_projection_scan" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey",

    "s7_top_sample" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders ORDER BY o_orderkey LIMIT 5",

    "s11_merge_upsert" ->
      """WITH target AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM events
        |  WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
        |source AS (
        |  SELECT event_id, ts, user_id, event_type, value + 1.0 AS value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-19 00:00:00'),
        |u AS (
        |  SELECT *, 0 AS pri FROM target
        |  UNION ALL
        |  SELECT *, 1 AS pri FROM source),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY pri DESC, ts DESC) AS rn FROM u)
        |SELECT event_id, ts, user_id, event_type, value FROM r WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "s16_zorder_value" -> {
      // the EXACT integer construction Layout.zValueAuto runs: per-dim
      // min/max bounds, ((c-min)*65536)//(max-min+1) scaling, then bit b
      // of dim i interleaved to position b*2+i — DuckDB's BIGINT >> & <<
      // | and floor-div // agree with Spark's shiftright/bitwiseAND/
      // shiftleft/bitwiseOR and `div` on these non-negative operands
      def terms(e: String, i: Int) = (0 until 16)
        .map(b => s"((($e >> $b) & 1) << ${b * 2 + i})").mkString(" | ")
      s"""WITH b AS (
         |  SELECT CAST(min(l_orderkey) AS BIGINT) AS mn0, CAST(max(l_orderkey) AS BIGINT) AS mx0,
         |         CAST(min(l_partkey) AS BIGINT) AS mn1, CAST(max(l_partkey) AS BIGINT) AS mx1
         |  FROM lineitem),
         |s AS (
         |  SELECT l_orderkey, l_partkey,
         |         ((CAST(l_orderkey AS BIGINT) - mn0) * 65536) // (mx0 - mn0 + 1) AS s0,
         |         ((CAST(l_partkey AS BIGINT) - mn1) * 65536) // (mx1 - mn1 + 1) AS s1
         |  FROM lineitem, b)
         |SELECT l_orderkey, l_partkey, (${terms("s0", 0)}) | (${terms("s1", 1)}) AS zval
         |FROM s""".stripMargin
    },

    "s17_pruned_scan" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 20000 AND l_partkey BETWEEN 200 AND 1200
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "s20_partitioned_prune" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty
        |FROM lineitem
        |WHERE year(l_shipdate) BETWEEN 1994 AND 1995
        |  AND l_orderkey BETWEEN 0 AND 30000
        |  AND l_returnflag BETWEEN 'N' AND 'R'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // each snapshot serves exactly its committed row set
    "s21_time_travel" ->
      """SELECT doc_id, CAST(0 AS BIGINT) AS version FROM documents
        |WHERE doc_id < 400
        |UNION ALL
        |SELECT doc_id, CAST(1 AS BIGINT) AS version FROM documents
        |ORDER BY version, doc_id""".stripMargin,

    // idempotence holds ⇔ every doc once + exactly two commits
    "s22_idempotent_sink" ->
      """SELECT doc_id, CAST(2 AS BIGINT) AS n_commits FROM documents
        |ORDER BY doc_id""".stripMargin,

    // the rewrite preserves content ⇔ every doc once + three commits
    "s23_optimize_zorder" ->
      """SELECT doc_id, CAST(3 AS BIGINT) AS n_commits FROM documents
        |ORDER BY doc_id""".stripMargin,

    // surviving rows = NOT coalesce(box, false) — SQL DELETE semantics
    // (a NULL comparison is not a match); `bounded` hashes the
    // bounded-write claim itself
    "s24_delete_where" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS bounded
        |FROM lineitem
        |WHERE NOT COALESCE(l_orderkey BETWEEN 1000 AND 2000
        |                   AND l_returnflag = 'R', FALSE)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // pre-evolution rows serve the evolved column as NULL; version 0
    // keeps its own 2-column schema
    "s25_schema_evolution" ->
      """SELECT doc_id, text,
        |  CASE WHEN doc_id >= 400 THEN lang END AS lang,
        |  CAST(2 AS BIGINT) AS v0_cols
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the file-diff feed must equal the row-level snapshot diff
    "s26_change_feed" ->
      """SELECT doc_id, lang, 'insert' AS _change_type, CAST(1 AS BIGINT) AS step
        |FROM documents WHERE doc_id >= 400
        |UNION ALL
        |SELECT doc_id, lang, 'delete', CAST(2 AS BIGINT)
        |FROM documents WHERE doc_id BETWEEN 100 AND 199
        |ORDER BY step, doc_id""".stripMargin,

    // rollback-as-commit: content equals v0, history has 3 versions
    "s27_restore" ->
      """SELECT doc_id, CAST(3 AS BIGINT) AS n_commits FROM documents
        |WHERE doc_id < 400 ORDER BY doc_id""".stripMargin,

    // protocol-metadata history: exact timestamps (injected clock),
    // operation kinds, file counts, writers, flags
    "s28_describe_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(1000 AS BIGINT), 'OVERWRITE', 2, '', TRUE, FALSE, TRUE),
        |  (CAST(1 AS BIGINT), CAST(2000 AS BIGINT), 'IDEMPOTENT APPEND', 3, 'w', TRUE, FALSE, TRUE),
        |  (CAST(2 AS BIGINT), CAST(3000 AS BIGINT), 'RESTORE', 2, 'w', TRUE, FALSE, TRUE))
        |  AS t(version, ts_ms, operation, n_files, writers, has_schema, retired, has_bytes)
        |ORDER BY version""".stripMargin,

    // TIMESTAMP AS OF: 1500 → v0 (docs < 200); 2000 and 2500 both → v2
    // (the full table) — the 2000 probe is the tie case, two commits at
    // the same instant resolving to the higher version
    "s29_time_travel_ts" ->
      """SELECT doc_id, CAST(1500 AS BIGINT) AS probe_ts, CAST(0 AS BIGINT) AS version
        |FROM documents WHERE doc_id < 200
        |UNION ALL
        |SELECT doc_id, CAST(2000 AS BIGINT), CAST(2 AS BIGINT) FROM documents
        |UNION ALL
        |SELECT doc_id, CAST(2500 AS BIGINT), CAST(2 AS BIGINT) FROM documents
        |ORDER BY probe_ts, doc_id""".stripMargin,

    // survivors = NOT coalesce(IN-list, false); `bounded` hashes the
    // carried-files claim (the box pruned, the IN-list filtered)
    "s30_delete_where_in" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS bounded
        |FROM lineitem
        |WHERE NOT COALESCE(l_orderkey IN (1001, 1500, 1999, 2500), FALSE)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // conversion moves bytes, never rewrites rows: content = the flat
    // table's rows + the post-convert append, exactly 2 commits
    "s31_convert_flat" ->
      """SELECT doc_id, n_chars, lang, CAST(2 AS BIGINT) AS n_commits
        |FROM documents ORDER BY doc_id""".stripMargin,

    // decoupled lifecycles: the clone keeps v0 (plus its own append),
    // the source's delete never leaks into it — and vice versa
    "s32_shallow_clone" ->
      """SELECT doc_id, lang, 'src' AS side FROM documents
        |WHERE doc_id >= 100 AND doc_id < 400
        |UNION ALL
        |SELECT doc_id, lang, 'clone' FROM documents
        |ORDER BY side, doc_id""".stripMargin,

    // enforced-constraint table: content = the clean rows only, the
    // violating batch never landed, one constraint live
    "s33_check_constraint" ->
      """SELECT doc_id, n_chars, lang,
        |  CAST(1 AS BIGINT) AS n_checks, TRUE AS refused_bad_batch
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the table derives omitted generated columns itself; wrong carried
    // values never land
    "s34_generated_column" ->
      """SELECT doc_id, lang, CAST(doc_id % 10 AS BIGINT) AS bucket,
        |  TRUE AS refused_bad_value
        |FROM documents ORDER BY doc_id""".stripMargin,

    // UPDATE = CASE WHEN hit THEN new ELSE old END, hit evaluated once
    // against the pre-update row; `bounded` hashes the carried-files claim
    "s35_update_where" ->
      """SELECT rf AS l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(q AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS bounded
        |FROM (
        |  SELECT CASE WHEN hit THEN 'U' ELSE l_returnflag END AS rf,
        |         CASE WHEN hit THEN l_quantity * 2 ELSE l_quantity END AS q
        |  FROM (SELECT l_returnflag, l_quantity,
        |          COALESCE(l_orderkey BETWEEN 1001 AND 2000
        |                   AND l_quantity < 25, FALSE) AS hit
        |        FROM lineitem))
        |GROUP BY rf ORDER BY rf""".stripMargin,

    // rename serves old bytes under the new name; the dropped column
    // vanishes from the view while v0 keeps the original column list
    "s36_rename_drop_column" ->
      """SELECT doc_id, n_chars AS char_count, lang,
        |  'doc_id,lang,n_chars,source' AS v0_cols, TRUE AS metadata_only
        |FROM documents ORDER BY doc_id""".stripMargin,

    // MERGE = left join with clause CASEs for matched rows, plus the
    // unmatched source rows as inserts; update takes the source row whole
    "s37_merge_full" ->
      """WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |src AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice + 1000 AS p
        |  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, -1 FROM orders
        |  WHERE o_orderkey >= 2000 AND o_orderkey < 2500
        |  UNION ALL
        |  SELECT o_orderkey + 1000000, 'NEW', o_totalprice FROM orders
        |  WHERE o_orderkey < 100),
        |merged AS (
        |  SELECT t.o_orderkey,
        |    CASE WHEN s.k IS NOT NULL AND s.p > t.o_totalprice
        |         THEN s.st ELSE t.o_orderstatus END AS o_orderstatus,
        |    CASE WHEN s.k IS NOT NULL AND s.p > t.o_totalprice
        |         THEN s.p ELSE t.o_totalprice END AS o_totalprice,
        |    CASE WHEN s.k IS NOT NULL AND NOT COALESCE(s.p > t.o_totalprice, FALSE)
        |              AND s.p < 0 THEN 1 ELSE 0 END AS del
        |  FROM t LEFT JOIN src s ON t.o_orderkey = s.k)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, TRUE AS bounded
        |FROM merged WHERE del = 0
        |UNION ALL
        |SELECT s.k, s.st, s.p, TRUE FROM src s
        |LEFT JOIN t ON t.o_orderkey = s.k WHERE t.o_orderkey IS NULL""".stripMargin,

    // schema evolution: matched rows (< 500) take the source whole —
    // note included; unmatched pre-merge rows serve NULL for the new
    // column; the far inserts land with it
    "s42_merge_evolve" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey < 500 THEN o_totalprice + 1000
        |       ELSE o_totalprice END AS o_totalprice,
        |  CASE WHEN o_orderkey < 500 THEN 'upd' ELSE NULL END AS note,
        |  TRUE AS bounded
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 1000000, o_orderstatus, o_totalprice,
        |  'ins', TRUE
        |FROM orders WHERE o_orderkey < 100""".stripMargin,

    // composite-key merge = the s37 shape on a 2-column key
    "s43_merge_composite" ->
      """WITH t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |           FROM orders),
        |src AS (
        |  SELECT o_orderkey AS k1, o_custkey AS k2, o_orderstatus AS st,
        |    o_totalprice + 1000 AS p
        |  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
        |  UNION ALL
        |  SELECT o_orderkey + 1000000, o_custkey, 'NEW', o_totalprice
        |  FROM orders WHERE o_orderkey < 100)
        |SELECT t.o_orderkey, t.o_custkey,
        |  CASE WHEN s.k1 IS NOT NULL AND s.p > t.o_totalprice
        |       THEN s.st ELSE t.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN s.k1 IS NOT NULL AND s.p > t.o_totalprice
        |       THEN s.p ELSE t.o_totalprice END AS o_totalprice,
        |  TRUE AS bounded
        |FROM t LEFT JOIN src s ON t.o_orderkey = s.k1 AND t.o_custkey = s.k2
        |UNION ALL
        |SELECT s.k1, s.k2, s.st, s.p, TRUE FROM src s
        |LEFT JOIN t ON t.o_orderkey = s.k1 AND t.o_custkey = s.k2
        |WHERE t.o_orderkey IS NULL""".stripMargin,

    // 4-type CDF: updated keys pair as pre/postimage, appends insert,
    // bounded deletes delete — carried-identical rows never appear
    "s44_change_feed_keyed" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  'update_preimage' AS _change_type
        |FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice + 1000,
        |  'update_postimage'
        |FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000
        |UNION ALL
        |SELECT o_orderkey + 1000000, o_orderstatus, o_totalprice, 'insert'
        |FROM orders WHERE o_orderkey < 100
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice, 'delete'
        |FROM orders WHERE o_orderkey BETWEEN 3000 AND 3500
        |ORDER BY o_orderkey, _change_type""".stripMargin,

    // NOT EXISTS against the same derived key list (anti-join
    // semantics, deliberately not SQL NOT IN's null trap)
    "s38_delete_key_list" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS bounded
        |FROM lineitem t
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem d
        |  WHERE d.l_orderkey = t.l_orderkey
        |    AND d.l_orderkey BETWEEN 1000 AND 3000 AND d.l_orderkey % 97 = 0)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the Bloom-indexed delete removed EXACTLY the rows whose md5 key
    // was listed — equivalently (keys are the PK's digest, no
    // collisions at this scale) the rows in the doomed orderkey range;
    // fp-extra rewrites change which files rewrite, never the content
    "s45_bloom_key_delete" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS bounded
        |FROM lineitem
        |WHERE l_orderkey NOT BETWEEN 1000 AND 1100
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // DELETE removed exactly the predicate's rows (auto-extracted boxes
    // change which files rewrite, never the surviving content)
    "s46_predicate_auto_prune" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS bounded
        |FROM lineitem
        |WHERE NOT (l_orderkey BETWEEN 1000 AND 2000 AND l_returnflag = 'R')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the list-served counts equal the real table state's counts
    "s49_metadata_count" ->
      """WITH t AS (
        |  SELECT l_orderkey AS k,
        |    CASE WHEN l_orderkey % 10 = 0 THEN NULL ELSE l_returnflag END AS flag_n
        |  FROM lineitem
        |  WHERE l_orderkey NOT BETWEEN 1000 AND 2000
        |  UNION ALL
        |  SELECT l_orderkey + 10000000,
        |    CASE WHEN l_orderkey % 10 = 0 THEN NULL ELSE l_returnflag END
        |  FROM lineitem WHERE l_orderkey <= 100)
        |SELECT COUNT(*) AS n_total, COUNT(flag_n) AS n_flag,
        |  TRUE AS stats_only FROM t""".stripMargin,

    // SQL-text DML twins: same oracles as the API gates they mirror —
    // the SQL entry point must compute exactly what the verb computes
    "s50_sql_delete" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS bounded
        |FROM lineitem
        |WHERE NOT COALESCE(l_orderkey BETWEEN 1000 AND 2000
        |                   AND l_returnflag = 'R', FALSE)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "s51_sql_update" ->
      """SELECT rf AS l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(q AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS bounded
        |FROM (
        |  SELECT CASE WHEN hit THEN 'U' ELSE l_returnflag END AS rf,
        |         CASE WHEN hit THEN l_quantity * 2 ELSE l_quantity END AS q
        |  FROM (SELECT l_returnflag, l_quantity,
        |          COALESCE(l_orderkey BETWEEN 1001 AND 2000
        |                   AND l_quantity < 25, FALSE) AS hit
        |        FROM lineitem))
        |GROUP BY rf ORDER BY rf""".stripMargin,

    // MERGE UPDATE SET * / INSERT *: every source row lands (matched
    // rows replaced, unmatched inserted), unmatched target rows carry
    "s52_sql_merge" ->
      """WITH target AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM events
        |  WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
        |source AS (
        |  SELECT event_id, ts, user_id, event_type, value + 1.0 AS value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-19 00:00:00')
        |SELECT event_id, ts, user_id, event_type, value FROM source
        |UNION ALL
        |SELECT t.event_id, t.ts, t.user_id, t.event_type, t.value FROM target t
        |WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.event_id = t.event_id)
        |ORDER BY event_id""".stripMargin,

    "s53_sql_time_travel" ->
      """SELECT doc_id, CAST(0 AS BIGINT) AS version FROM documents
        |WHERE doc_id < 400
        |UNION ALL
        |SELECT doc_id, CAST(1 AS BIGINT) AS version FROM documents
        |ORDER BY version, doc_id""".stripMargin,

    // full-form MERGE semantics replayed literally: matched 'del' rows
    // drop, other matched rows take the partial update (unassigned
    // user_id KEEPS), unmatched 'inc' source rows insert with
    // unassigned columns NULL, unmatched targets carry
    "s54_sql_merge_full" ->
      """WITH target AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM events
        |  WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
        |source AS (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    CASE WHEN event_id % 7 = 0 THEN 'del' ELSE 'inc' END AS op
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-19 00:00:00')
        |SELECT t.event_id, t.ts, t.user_id,
        |  t.event_type || '*' AS event_type, t.value + s.value AS value
        |FROM target t JOIN source s ON t.event_id = s.event_id
        |WHERE s.op <> 'del'
        |UNION ALL
        |SELECT t.event_id, t.ts, t.user_id, t.event_type, t.value
        |FROM target t
        |WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.event_id = t.event_id)
        |UNION ALL
        |SELECT s.event_id, s.ts, CAST(NULL AS BIGINT) AS user_id,
        |  CAST(NULL AS VARCHAR) AS event_type, s.value
        |FROM source s
        |WHERE s.op = 'inc'
        |  AND NOT EXISTS (SELECT 1 FROM target t WHERE t.event_id = s.event_id)
        |ORDER BY event_id""".stripMargin,

    // NMBS merge semantics replayed literally: matched 'del' rows drop,
    // other matched rows add the values, unmatched 'inc' source rows
    // insert with unassigned columns NULL, unmatched-by-source targets
    // with event_id % 5 = 0 drop (delete listed first in its family)
    // and the rest take the '#' marker
    "s55_sql_merge_not_matched_by_source" ->
      """WITH target AS (
        |  SELECT event_id, ts, user_id, event_type, value FROM events
        |  WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
        |source AS (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    CASE WHEN event_id % 7 = 0 THEN 'del' ELSE 'inc' END AS op
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-19 00:00:00')
        |SELECT t.event_id, t.ts, t.user_id, t.event_type,
        |  t.value + s.value AS value
        |FROM target t JOIN source s ON t.event_id = s.event_id
        |WHERE s.op <> 'del'
        |UNION ALL
        |SELECT t.event_id, t.ts, t.user_id,
        |  t.event_type || '#' AS event_type, t.value
        |FROM target t
        |WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.event_id = t.event_id)
        |  AND t.event_id % 5 <> 0
        |UNION ALL
        |SELECT s.event_id, s.ts, CAST(NULL AS BIGINT) AS user_id,
        |  CAST(NULL AS VARCHAR) AS event_type, s.value
        |FROM source s
        |WHERE s.op = 'inc'
        |  AND NOT EXISTS (SELECT 1 FROM target t WHERE t.event_id = s.event_id)
        |ORDER BY event_id""".stripMargin,

    // replaceWhere literal semantics: the band's original rows leave,
    // the doubled 'X' replacements land, everything else keeps
    "s57_replace_where" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS one_commit, TRUE AS bounded
        |FROM (
        |  SELECT l_returnflag, l_quantity FROM lineitem
        |  WHERE NOT COALESCE(l_orderkey BETWEEN 1000 AND 2000, FALSE)
        |  UNION ALL
        |  SELECT 'X' AS l_returnflag, l_quantity * 2 AS l_quantity
        |  FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // RESTORE puts the table back to its full v0 content; the clone,
    // taken after the restore, keeps only l_orderkey <= 3000
    "s56_sql_restore_clone" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  'restored' AS side
        |FROM lineitem GROUP BY l_returnflag
        |UNION ALL
        |SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  'clone' AS side
        |FROM lineitem WHERE l_orderkey <= 3000 GROUP BY l_returnflag
        |ORDER BY side, l_returnflag""".stripMargin,

    // the planner-integrated scan answers the plain filtered aggregate
    "s48_planner_scan" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS planned
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 2000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the pruned scan answers the disjunctive filter exactly
    "s47_read_where" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_price,
        |  TRUE AS pruned
        |FROM orders
        |WHERE (o_orderkey BETWEEN 500 AND 1500 AND o_orderstatus = 'F')
        |   OR o_orderkey = 42
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // maintenance is content-preserving: the final table = lineitem plus
    // the four shifted epoch trails, whatever got reclustered or packed
    "s39_bounded_maintenance" ->
      """WITH full_t AS (
        |  SELECT l_returnflag, l_quantity FROM lineitem
        |  UNION ALL
        |  SELECT 'E', l_quantity FROM lineitem, (VALUES (0),(1),(2),(3)) AS e(i)
        |  WHERE l_orderkey <= 20)
        |SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  TRUE AS bounded_opt, TRUE AS packed
        |FROM full_t GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the mirror equals the source head after its churn: everything
    // appended, minus the deleted box
    "s40_clone_sync" ->
      """SELECT doc_id, lang, TRUE AS resync_noop
        |FROM documents WHERE doc_id >= 100 ORDER BY doc_id""".stripMargin,

    // provenance = the commit that added the row's file
    "s41_provenance" ->
      """SELECT doc_id, lang,
        |  CAST(CASE WHEN doc_id < 300 THEN 0 WHEN doc_id < 400 THEN 1
        |       ELSE 2 END AS BIGINT) AS _commit_version
        |FROM documents ORDER BY doc_id""".stripMargin,

    // lossless round trip ⇒ the oracle is the untouched source table
    "s18_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",

    "s19_orc_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",

    "f11_equidepth_histogram" ->
      """WITH b AS (
        |  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS price,
        |    NTILE(10) OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(o_totalprice AS DOUBLE) ASC, o_orderkey ASC) AS bucket
        |  FROM orders WHERE o_totalprice IS NOT NULL)
        |SELECT o_orderpriority, CAST(bucket AS INT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n, MIN(price) AS lo, MAX(price) AS hi
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "p1_identifier_normalize" ->
      "SELECT r_regionkey AS region_key, r_name AS region_name FROM region ORDER BY region_key",

    "p2_standardize_types" ->
      """SELECT event_id,
        |  CASE WHEN epoch_ns(ts) > 1000000000000 THEN make_timestamp(epoch_ns(ts)//1000)
        |       ELSE make_timestamp(epoch_ns(ts)*1000000) END AS ts_decoded,
        |  CASE WHEN epoch_ns(ts)//1000000000 > 1000000000000 THEN make_timestamp((epoch_ns(ts)//1000000000)//1000)
        |       ELSE make_timestamp((epoch_ns(ts)//1000000000)*1000000) END AS ts_from_seconds,
        |  CASE WHEN upper(trim(event_type)) IN ('', 'NULL', 'N/A', 'UNKNOWN', 'NONE', '#N/A') THEN NULL
        |       ELSE event_type END AS event_type,
        |  CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END AS value
        |FROM events ORDER BY event_id""".stripMargin,

    "p5_segment_filter" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey",

    "p6_quarantine_clean" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice FROM lineitem
        |WHERE NOT (l_shipdate > DATE '2000-05-31' OR l_extendedprice > 100000.0 OR l_extendedprice < -1.0)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p6_quarantine_rows" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_extendedprice,
        |  CASE WHEN l_shipdate > DATE '2000-05-31' THEN 'future_date:l_shipdate'
        |       WHEN l_extendedprice > 100000.0 OR l_extendedprice < -1.0 THEN 'out_of_range:l_extendedprice'
        |  END AS quarantine_reason
        |FROM lineitem
        |WHERE l_shipdate > DATE '2000-05-31' OR l_extendedprice > 100000.0 OR l_extendedprice < -1.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p14_dq_report" ->
      """SELECT 'future_date:l_shipdate' AS rule,
        |  CAST(SUM(CASE WHEN l_shipdate > DATE '2000-05-31' THEN 1 ELSE 0 END) AS BIGINT) AS n
        |FROM lineitem
        |UNION ALL
        |SELECT 'out_of_range:l_extendedprice',
        |  CAST(SUM(CASE WHEN l_extendedprice > 100000.0 OR l_extendedprice < -1.0 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'total_rows', COUNT(*) FROM lineitem""".stripMargin,

    "p7_drop_all_null" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE NOT (doc_id IS NULL AND text IS NULL AND lang IS NULL AND source IS NULL AND n_chars IS NULL)
        |ORDER BY doc_id""".stripMargin,

    "p9_watermark_filter" ->
      """SELECT event_id, ts, event_type FROM events
        |WHERE ts > TIMESTAMP '2024-01-25 00:00:00' - INTERVAL 3600 SECONDS
        |ORDER BY event_id""".stripMargin,

    "p10_control_probe" ->
      """SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY ts DESC, event_id DESC LIMIT 1""".stripMargin,

    "j2_filtered_dim_reuse" ->
      """SELECT o_orderkey, am.c_name AS am_name, kam.c_name AS kam_name
        |FROM orders
        |LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) am ON o_custkey = am.c_custkey
        |LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') kam ON o_custkey = kam.c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "j8_changed_keys_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,

    "j9_anti_orphans" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "a1_max_watermark" ->
      "SELECT max(ts) AS wm FROM events",

    "a2_count_rows" ->
      "SELECT count(*) AS n FROM lineitem",

    "a3_distinct_keys" ->
      """SELECT DISTINCT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00' ORDER BY o_custkey""".stripMargin,

    "a6_date_range" ->
      "SELECT min(o_orderdate) AS dmin, max(o_orderdate) AS dmax FROM orders",

    "a7_measures" ->
      """SELECT c_mktsegment AS market_segment,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS sales_only,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_value,
        |  COUNT(*) AS n_orders,
        |  (CASE WHEN SUM(CAST(o_totalprice AS DECIMAL(18,2))) IS NULL OR SUM(CAST(o_totalprice AS DECIMAL(18,2))) = 0 THEN 0.0
        |        ELSE CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
        |             / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) END) * 100.0 AS achievement_pct
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY market_segment""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "w1_dedup_latest_dim" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id, ts,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_type, event_id, ts FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "w2_fact_pattern_dedup" ->
      """WITH r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate DESC, l_linenumber DESC,
        |    l_discount DESC, l_extendedprice DESC, l_linestatus DESC, l_partkey DESC,
        |    l_quantity DESC, l_returnflag DESC, l_suppkey DESC, l_tax DESC) AS rn
        |  FROM lineitem)
        |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |       l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM r WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,

    "w4_running_total" ->
      """SELECT event_id, user_id, ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS running_value
        |FROM events ORDER BY event_id""".stripMargin,

    "w10_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY 1)
        |SELECT 'signup' AS stage, count(*) AS users FROM s1
        |UNION ALL SELECT 'view_after_signup', count(*) FROM s2
        |UNION ALL SELECT 'purchase_after_view', count(*) FROM s3""".stripMargin,

    "w11_cohort_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY 1),
        |active AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS weeks_since,
        |  count(DISTINCT user_id) AS active_users
        |FROM active JOIN cohort USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "w5_session_gap" ->
      """SELECT event_id, user_id,
        |  epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY event_id""".stripMargin,

    "w12_first_touch" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts, event_type, value,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         OR epoch_us(ts) - LAG(epoch_us(ts), 1)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM g),
        |f AS (
        |  SELECT *,
        |    FIRST_VALUE(event_id) OVER (PARTITION BY user_id, sess
        |      ORDER BY ts, event_id) AS attributed_event_id,
        |    FIRST_VALUE(event_type) OVER (PARTITION BY user_id, sess
        |      ORDER BY ts, event_id) AS attributed_type
        |  FROM s)
        |SELECT event_id, user_id, CAST(sess AS BIGINT) AS sess,
        |  attributed_event_id, attributed_type, value AS revenue
        |FROM f WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "w6_topk_per_group" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rnk
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk FROM r WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,

    "u2_date_domain" ->
      """SELECT CAST(o_orderdate AS DATE) AS d FROM orders
        |UNION
        |SELECT CAST(l_shipdate AS DATE) AS d FROM lineitem
        |ORDER BY d""".stripMargin,

    "u3_set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "u4_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "u5_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        |  FROM orders WHERE o_orderdate < DATE '1997-06-01'),
        |n AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CAST(CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1
        |              ELSE o_totalprice END AS DECIMAL(18,2)) AS o_totalprice
        |  FROM orders WHERE o_orderdate < DATE '1998-01-01' AND o_orderkey % 97 <> 0),
        |j AS (
        |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
        |              WHEN n.o_orderkey IS NULL THEN 'delete'
        |              WHEN NOT (o.o_custkey IS NOT DISTINCT FROM n.o_custkey
        |                    AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
        |                    AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
        |              THEN 'update' END AS change_type
        |  FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, change_type FROM j WHERE change_type IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "u6_interval_join" ->
      """WITH win AS (
        |  SELECT user_id, ts AS window_start, ts + INTERVAL 5 MINUTE AS window_end
        |  FROM events WHERE event_type = 'error')
        |SELECT w.user_id, w.window_start, count(*) AS n_events,
        |  max(e.value) AS max_value
        |FROM win w JOIN events e ON e.user_id = w.user_id
        | AND e.ts >= w.window_start AND e.ts <= w.window_end
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "u7_overlap_join" ->
      """WITH e AS (
        |  SELECT user_id, ts AS es, ts + INTERVAL 10 MINUTE AS ee
        |  FROM events WHERE event_type = 'error'),
        |b AS (
        |  SELECT user_id, ts AS bs, ts + INTERVAL 10 MINUTE AS be
        |  FROM events WHERE event_type = 'purchase')
        |SELECT e.user_id, count(*) AS n_overlaps, max(e.es) AS last_err_start
        |FROM e JOIN b ON e.user_id = b.user_id AND e.es <= b.be AND b.bs <= e.ee
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w8_range_frame" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_in_band
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q14_promo_share" ->
      """SELECT
        |  CAST(SUM(CASE WHEN p_type LIKE 'STANDARD%' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) END) AS DECIMAL(38,4)) AS standard_revenue,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS total_revenue,
        |  CAST(CAST(SUM(CASE WHEN p_type LIKE 'STANDARD%' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) END) AS DECIMAL(38,4)) AS DOUBLE)
        |    / CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS DOUBLE) * 100.0 AS standard_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '2000-07-01 00:00:00'""".stripMargin,

    "f4_math_suite" ->
      """SELECT o_orderkey,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        |  round(o_totalprice, 1) AS price_round1,
        |  sqrt(abs(o_totalprice)) AS price_sqrt,
        |  CAST(sign(o_totalprice) AS INT) AS price_sign,
        |  CAST(o_orderkey % 97 AS INT) AS key_mod
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f5_date_suite" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(o_orderdate AS DATE) + 30 AS d_plus30,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
        |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow_sun1,
        |  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS iso_week
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f6_value_histogram" ->
      """SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000) AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    // json_extract_string replays the typed extraction; the SUM pins to
    // BIGINT (DuckDB SUM(int) -> HUGEINT would break the hasher)
    "f8_json_extract" ->
      """SELECT event_type, count(*) AS events,
        |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_present,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // percentile ≙ quantile_cont (the a11-proven pairing) for BOTH the
    // median and the MAD; the flag is a single comparison on each side
    "f9_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type)
        |SELECT e.event_id, e.event_type, e.value, m.med, d.mad,
        |  (abs(e.value - m.med) > 3.5 * d.mad) AS is_outlier
        |FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
        |ORDER BY e.event_id""".stripMargin,

    "f7_column_profile" ->
      """WITH p AS (
        |  SELECT 'doc_id' AS "column", count(*) AS n_rows,
        |    count(*) - count(doc_id) AS n_nulls, count(DISTINCT doc_id) AS n_distinct,
        |    CAST(min(doc_id) AS VARCHAR) AS min_val, CAST(max(doc_id) AS VARCHAR) AS max_val
        |  FROM documents
        |  UNION ALL SELECT 'text', count(*), count(*) - count(text), count(DISTINCT text),
        |    CAST(min(text) AS VARCHAR), CAST(max(text) AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'lang', count(*), count(*) - count(lang), count(DISTINCT lang),
        |    CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'source', count(*), count(*) - count(source), count(DISTINCT source),
        |    CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
        |  UNION ALL SELECT 'n_chars', count(*), count(*) - count(n_chars), count(DISTINCT n_chars),
        |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents)
        |SELECT "column", n_rows, n_nulls, n_distinct, min_val, max_val
        |FROM p ORDER BY "column"""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS revenue_delta,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin,

    "q17_small_quantity" ->
      """WITH th AS (
        |  SELECT l_partkey AS t_partkey,
        |    (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 0.2 AS qty_threshold
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS small_qty_revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN th ON l_partkey = t_partkey
        |WHERE CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) < qty_threshold""".stripMargin,

    "a10_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "f1_scalar_suite" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  substring(c_name, 1, 8) AS name_prefix,
        |  concat_ws('|', c_mktsegment, c_name) AS seg_name,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
        |  CAST(round(c_acctbal) AS BIGINT) AS bal_rounded,
        |  CAST(abs(c_acctbal) AS DECIMAL(18,2)) AS bal_abs
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "f2_sql_surface" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q2_min_balance_supplier" ->
      """WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |eur AS (
        |  SELECT l_partkey, s_acctbal, s_name, n_name
        |  FROM supply JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM eur JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'STANDARD' AND p_size < 25
        |  AND s_acctbal = (SELECT MIN(e2.s_acctbal) FROM eur e2 WHERE e2.l_partkey = eur.l_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q8_market_share" ->
      """WITH j AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS vol,
        |    sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |SELECT o_year,
        |  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,4)) AS DOUBLE)
        |  / CAST(CAST(SUM(vol) AS DECIMAL(38,4)) AS DOUBLE) AS mkt_share
        |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.10 AS DECIMAL(3,2))) AS DECIMAL(38,4)) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q11_important_parts" ->
      """WITH eur AS (
        |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS val
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |tot AS (SELECT CAST(CAST(SUM(val) AS DECIMAL(38,2)) AS DOUBLE) AS tot,
        |               COUNT(DISTINCT l_partkey) AS nparts FROM eur)
        |SELECT l_partkey, CAST(SUM(val) AS DECIMAL(38,2)) AS part_value
        |FROM eur GROUP BY l_partkey
        |HAVING CAST(CAST(SUM(val) AS DECIMAL(38,2)) AS DOUBLE) >
        |  (SELECT tot FROM tot) / (SELECT nparts FROM tot) * 1.5""".stripMargin,

    "q12_priority_shipping" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q13_order_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM pc GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON supplier_no = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_part_supplier_variety" ->
      """WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM supply JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q20_dominant_suppliers" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS DECIMAL(18,2)) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'),
        |pair AS (SELECT l_partkey, l_suppkey, CAST(SUM(qty) AS DECIMAL(38,2)) AS pair_qty
        |         FROM li GROUP BY 1, 2),
        |whole AS (SELECT l_partkey, CAST(SUM(qty) AS DECIMAL(38,2)) AS part_qty
        |          FROM li GROUP BY 1)
        |SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |WHERE s_suppkey IN (
        |  SELECT DISTINCT pair.l_suppkey
        |  FROM pair JOIN whole ON pair.l_partkey = whole.l_partkey
        |  WHERE CAST(pair_qty AS DOUBLE) > CAST(part_qty AS DOUBLE) * 0.3)
        |ORDER BY s_suppkey""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'),
        |late AS (SELECT l_orderkey AS ok, l_suppkey AS sk FROM lo WHERE l_shipdate > o_orderdate)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM late l1
        |JOIN supplier ON sk = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |WHERE EXISTS (SELECT 1 FROM lo l2
        |              WHERE l2.l_orderkey = l1.ok AND l2.l_suppkey <> l1.sk)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |                  WHERE l3.l_orderkey = l1.ok AND l3.l_suppkey <> l1.sk
        |                    AND l3.l_shipdate > l3.o_orderdate)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,

    "q22_sales_opportunity" ->
      """WITH c AS (
        |  SELECT c_custkey, c_acctbal, c_custkey % 7 AS cntrycode
        |  FROM customer WHERE c_custkey % 7 IN (0, 1, 2, 3)),
        |thr AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
        |  FROM c WHERE c_acctbal > 0)
        |SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS totacctbal
        |FROM c
        |WHERE c_acctbal > (SELECT avg_bal FROM thr)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,

    "q18_large_orders" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date,
        |  big.total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) > 150) big
        |  ON o_orderkey = big.l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "st1_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "st2_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, value, event_id,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "st3_sliding_window" ->
      """WITH k AS (SELECT unnest(range(0, 4)) AS k),
        |w AS (
        |  SELECT e.event_type,
        |    make_timestamp((epoch_us(e.ts) // 900000000 - k.k) * 900000000) AS window_start
        |  FROM events e CROSS JOIN k)
        |SELECT window_start, event_type, COUNT(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "st4_interval_join" ->
      """WITH decoded AS (
        |  SELECT event_id, user_id, event_type, value,
        |    CASE WHEN epoch_ns(ts) > 1000000000000 THEN make_timestamp(epoch_ns(ts)//1000)
        |         ELSE make_timestamp(epoch_ns(ts)*1000000) END AS ts
        |  FROM events)
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |  c.event_id AS r_event_id, c.ts AS r_ts
        |FROM decoded p JOIN decoded c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY p.event_id, r_event_id""".stripMargin,

    "st5_outer_interval_join" ->
      """WITH decoded AS (
        |  SELECT event_id, user_id, event_type, value,
        |    CASE WHEN epoch_ns(ts) > 1000000000000 THEN make_timestamp(epoch_ns(ts)//1000)
        |         ELSE make_timestamp(epoch_ns(ts)*1000000) END AS ts
        |  FROM events),
        |p AS (SELECT event_id, user_id, ts, value FROM decoded WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, ts FROM decoded WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |  c.event_id AS r_event_id, c.ts AS r_ts
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY p.event_id, r_event_id""".stripMargin,

    "st6_dedup_state" ->
      """WITH fp AS (
        |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM documents),
        |cor AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id < 400),
        |str AS (SELECT doc_id, fingerprint FROM fp WHERE doc_id >= 400),
        |own AS (SELECT fingerprint, min(doc_id) AS mn FROM str GROUP BY fingerprint)
        |SELECT s.doc_id, s.fingerprint,
        |  (s.doc_id = o.mn AND s.fingerprint NOT IN (SELECT fingerprint FROM cor)) AS accepted
        |FROM str s JOIN own o ON s.fingerprint = o.fingerprint""".stripMargin,

    // the whole-stream grid: merged per-slice counters == one pass
    "st7_cms_stream" ->
      """WITH tok AS (
        |  SELECT unnest(
        |    list_filter(string_split(lower(trim(text)), ' '), x -> x <> '')) AS term
        |  FROM documents),
        |rb AS (
        |  SELECT term, j,
        |    CAST('0x' || substring(md5('cms9:' || CAST(j AS VARCHAR) || ':' || term),
        |      1, 13) AS BIGINT) % 256 AS bucket
        |  FROM tok CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j))
        |SELECT j AS row, bucket, count(*) AS cnt
        |FROM rb GROUP BY 1, 2 ORDER BY row, bucket""".stripMargin,

    // the one-shot whole-corpus draw the merged reservoir must equal
    "st8_es_reservoir" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
        |    (CAST(CAST('0x' || substring(md5('res1:' || CAST(doc_id AS VARCHAR)),
        |       1, 13) AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0 AS u
        |  FROM documents),
        |s AS (SELECT doc_id, -ln(u) / w AS score FROM b WHERE w > 0),
        |r AS (SELECT doc_id, score,
        |    row_number() OVER (ORDER BY round(score, 9), doc_id) AS rk FROM s)
        |SELECT doc_id, round(score, 6) AS es_score
        |FROM r WHERE rk <= 25 ORDER BY doc_id""".stripMargin,

    // last-writer-wins replay: slice rank (event_id % 3) is the arrival
    // order, event_id the within-slice version — one window expresses
    // the whole fold
    "st9_cdc_upsert" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT event_id, user_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY event_id % 3 DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    // consume-your-own-feed: insert-all (v0), insert the appended rows
    // (v0→v1), delete the box (v1→v2) folds to exactly the source's
    // final state; 3 slices, replay commits nothing
    "st10_change_feed_stream" ->
      """SELECT event_id, user_id, event_type, value,
        |  CAST(3 AS BIGINT) AS n_folded, TRUE AS replay_noop
        |FROM events WHERE event_id NOT BETWEEN 100 AND 299
        |ORDER BY event_id""".stripMargin,

    // ascending-range slices + the version guard make the fold equal
    // one window: the globally-latest row per user decides, a latest
    // delete marker ('error') removes the user; replay commits nothing
    "st12_merge_sink" ->
      """SELECT event_id, user_id, event_type, value,
        |  CAST(3 AS BIGINT) AS n_committed, TRUE AS replay_noop
        |FROM (SELECT event_id, user_id, event_type, value,
        |        ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    // the engine-driven feed must equal the direct state: same final
    // content as st10, one target version per source commit
    // (maxVersionsPerTrigger = 1), fresh-query replay commits nothing
    "st11_feed_source_stream" ->
      """SELECT event_id, user_id, event_type, value,
        |  CAST(3 AS BIGINT) AS n_folded, TRUE AS replay_noop
        |FROM events WHERE event_id NOT BETWEEN 100 AND 299
        |ORDER BY event_id""".stripMargin,

    // readStream.table's plain append stream: every event row exactly
    // once (snapshot + append), the delete commit skipped whole, the
    // post-delete append's shifted rows flowing
    "st14_readstream_table" ->
      """SELECT event_id, user_id, event_type, value, TRUE AS skip_noop
        |FROM events
        |UNION ALL
        |SELECT event_id + 1000000, user_id, event_type, value, TRUE
        |FROM events WHERE event_id < 50
        |ORDER BY event_id""".stripMargin,

    // a stream pinned to startingVersion=1 serves NO initial snapshot:
    // exactly the append's rows as inserts (commit 1) and the bounded
    // delete's rows as deletes (commit 2); a pin behind the vacuum
    // horizon refuses at start
    "st13_feed_starting_version" ->
      """SELECT event_id, 'insert' AS change_type,
        |  CAST(1 AS BIGINT) AS commit_version, TRUE AS too_old_refused
        |FROM events WHERE event_id >= 600
        |UNION ALL
        |SELECT event_id, 'delete' AS change_type,
        |  CAST(2 AS BIGINT) AS commit_version, TRUE AS too_old_refused
        |FROM events WHERE event_id BETWEEN 100 AND 299
        |ORDER BY event_id, change_type""".stripMargin,

    "j10_asof_purchase" ->
      """WITH decoded AS (
        |  SELECT event_id, user_id, event_type, value,
        |    CASE WHEN epoch_ns(ts) > 1000000000000 THEN make_timestamp(epoch_ns(ts)//1000)
        |         ELSE make_timestamp(epoch_ns(ts)*1000000) END AS ts
        |  FROM events),
        |p0 AS (SELECT user_id, ts, event_id AS p_event, value AS p_value
        |       FROM decoded WHERE event_type = 'purchase'),
        |p AS (SELECT user_id, ts, p_event, p_value FROM (
        |        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY p_event DESC) AS rn
        |        FROM p0) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, p.p_event AS asof_p_event, p.p_value AS asof_p_value
        |FROM decoded e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY event_id""".stripMargin,

    "p13_impute_mean" ->
      """WITH decoded AS (
        |  SELECT event_id, user_id,
        |    CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END AS v
        |  FROM events)
        |SELECT event_id, user_id,
        |  COALESCE(v,
        |    CAST(SUM(CAST(v AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS DOUBLE)
        |      / COUNT(v) OVER (PARTITION BY user_id)) AS value_imputed
        |FROM decoded ORDER BY event_id""".stripMargin,

    "f3_regex_extract" ->
      """SELECT c_custkey,
        |  COALESCE(regexp_extract(c_name, '([0-9]+)', 1), '') AS name_digits,
        |  COALESCE(regexp_extract(c_mktsegment, '^([A-Z]+)', 1), '') AS seg_word
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "p11_hash_sample" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')
        |ORDER BY o_orderkey""".stripMargin,

    "p12_stratified_sample" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE (o_orderstatus = 'F' AND substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0'))
        |   OR (o_orderstatus = 'O' AND substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1','2','3'))
        |   OR (o_orderstatus = 'P')
        |ORDER BY o_orderkey""".stripMargin,

    "p15_weighted_mix" ->
      """SELECT doc_id, source FROM documents
        |WHERE (source = 'src0')
        |   OR (source = 'src1' AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
        |   OR (source = 'src2' AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000')
        |   OR (source = 'src3' AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '028f')
        |ORDER BY doc_id""".stripMargin,

    // identical α-share derivation + gate replay (IEEE ops in the same
    // order both engines; lowercase 4-hex threshold compare). The Σq fold
    // is ORDERED on both sides (Spark: array_sort + aggregate; DuckDB:
    // sum(q ORDER BY lang)) so a share sum landing on a round()
    // half-boundary can never flip __units between engines.
    "p17_temperature_mix" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1),
        |s AS (SELECT lang, n, pow(n, 0.5) AS q FROM c),
        |t AS (SELECT sum(q ORDER BY lang) AS tq FROM s),
        |u AS (SELECT lang,
        |        CAST(round(least(1.0, 300.0 * q / (tq * n)) * 65536.0) AS BIGINT) AS units
        |      FROM s, t)
        |SELECT d.doc_id, d.lang FROM documents d JOIN u USING (lang)
        |WHERE units >= 65536
        |   OR (units > 0 AND substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', units))
        |ORDER BY d.doc_id""".stripMargin,

    // shard = first hash byte mod 8 (hex→int as ascii arithmetic), pos =
    // per-shard rank by (hash, key) — both engines compute the identical
    // assignment from the identical md5 hex
    "p18_global_shuffle" ->
      """WITH h AS (
        |  SELECT o_orderkey, md5('r8' || ':' || CAST(o_orderkey AS VARCHAR)) AS hh
        |  FROM orders),
        |s AS (
        |  SELECT o_orderkey, hh,
        |    ((CASE WHEN ascii(substr(hh, 1, 1)) >= 97 THEN ascii(substr(hh, 1, 1)) - 87
        |           ELSE ascii(substr(hh, 1, 1)) - 48 END) * 16 +
        |     (CASE WHEN ascii(substr(hh, 2, 1)) >= 97 THEN ascii(substr(hh, 2, 1)) - 87
        |           ELSE ascii(substr(hh, 2, 1)) - 48 END)) % 8 AS shard
        |  FROM h)
        |SELECT o_orderkey, CAST(shard AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, o_orderkey) AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,

    // same shard byte; rank ordered by (score, hash, key)
    "p21_curriculum_shards" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    md5('r8c' || ':' || CAST(doc_id AS VARCHAR)) AS hh
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_chars, hh,
        |    ((CASE WHEN ascii(substr(hh, 1, 1)) >= 97 THEN ascii(substr(hh, 1, 1)) - 87
        |           ELSE ascii(substr(hh, 1, 1)) - 48 END) * 16 +
        |     (CASE WHEN ascii(substr(hh, 2, 1)) >= 97 THEN ascii(substr(hh, 2, 1)) - 87
        |           ELSE ascii(substr(hh, 2, 1)) - 48 END)) % 4 AS shard
        |  FROM h)
        |SELECT doc_id, n_chars, CAST(shard AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY n_chars, hh, doc_id)
        |    AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,

    // chains the p20 replay (integer weights, no gate) into the p18
    // replay with the composite (doc_id:epoch) key
    "p22_epoch_shards" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1 ELSE 0 END AS copies
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, CAST(unnest(generate_series(1, copies)) AS BIGINT) AS epoch
        |  FROM c WHERE copies >= 1),
        |h AS (
        |  SELECT doc_id, epoch,
        |    CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR) AS k,
        |    md5('r8e' || ':' || CAST(doc_id AS VARCHAR) || ':' ||
        |        CAST(epoch AS VARCHAR)) AS hh
        |  FROM e),
        |s AS (
        |  SELECT doc_id, epoch, k, hh,
        |    ((CASE WHEN ascii(substr(hh, 1, 1)) >= 97 THEN ascii(substr(hh, 1, 1)) - 87
        |           ELSE ascii(substr(hh, 1, 1)) - 48 END) * 16 +
        |     (CASE WHEN ascii(substr(hh, 2, 1)) >= 97 THEN ascii(substr(hh, 2, 1)) - 87
        |           ELSE ascii(substr(hh, 2, 1)) - 48 END)) % 8 AS shard
        |  FROM h)
        |SELECT doc_id, epoch, CAST(shard AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, k) AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,

    // greedy-prefix budget rule behind the token-weighted skew gate
    // (identical gate + cumsum replay; 3200 = margin(4) * budget(800))
    "p19_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |st AS (SELECT source, SUM(n_tok) AS stoks FROM d GROUP BY 1),
        |g AS (
        |  SELECT d.*, least(65536, CAST(ceil(65536.0 * 3200 / stoks) AS BIGINT)) AS t
        |  FROM d JOIN st USING (source)),
        |f AS (SELECT * FROM g WHERE t >= 65536 OR substr(h, 1, 4) < printf('%04x', t)),
        |c AS (
        |  SELECT doc_id, source, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum
        |  FROM f)
        |SELECT doc_id, source, n_tok FROM c
        |WHERE cum - n_tok < 800 ORDER BY doc_id""".stripMargin,

    // copies = floor(w) + md5-gated fractional unit (0.5 → '8000',
    // 0.25 → '4000'); each copy numbered by generate_series
    "p20_upsample_mix" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 1 ELSE 0 END)
        |    + (CASE WHEN source = 'src0'
        |              AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000' THEN 1
        |            WHEN source = 'src2'
        |              AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000' THEN 1
        |            ELSE 0 END) AS copies
        |  FROM documents),
        |e AS (SELECT doc_id, source, unnest(generate_series(1, copies)) AS epoch
        |      FROM c WHERE copies >= 1)
        |SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch FROM e
        |ORDER BY doc_id, epoch""".stripMargin,

    // identical gate + rank replay; 80 = margin(4) * n(20)
    "p16_exact_stratified" ->
      """WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY 1),
        |g AS (
        |  SELECT d.doc_id, d.source, md5(CAST(d.doc_id AS VARCHAR)) AS h,
        |    least(65536, CAST(ceil(65536.0 * 80 / cnt) AS BIGINT)) AS t
        |  FROM documents d JOIN c USING (source)),
        |f AS (SELECT * FROM g WHERE t >= 65536 OR substr(h, 1, 4) < printf('%04x', t)),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
        |      FROM f)
        |SELECT doc_id, source FROM r WHERE rk <= 20
        |ORDER BY source, doc_id""".stripMargin,

    "a11_percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.25) AS p25,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.75) AS p75
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "a12_pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS n_f,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS n_o,
        |  CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "w9_scd2_history" ->
      """WITH decoded AS (
        |  SELECT user_id, event_type, event_id,
        |    CASE WHEN epoch_ns(ts) > 1000000000000 THEN make_timestamp(epoch_ns(ts)//1000)
        |         ELSE make_timestamp(epoch_ns(ts)*1000000) END AS ts
        |  FROM events),
        |lagged AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM decoded),
        |chg AS (
        |  SELECT user_id, event_type, ts, event_id FROM lagged
        |  WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
        |SELECT user_id, event_type, ts AS valid_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM chg ORDER BY user_id, valid_from""".stripMargin,

    "a14_unpivot" ->
      """SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS value FROM customer
        |UNION ALL
        |SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer
        |ORDER BY c_custkey, metric""".stripMargin,

    "a15_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "w7_rank_suite" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(DENSE_RANK() OVER w AS INT) AS drnk,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cum_dist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_orderkey""".stripMargin,

    "x5_calendar_dim" ->
      s"""WITH span AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS dmin, CAST(max(o_orderdate) AS DATE) AS dmax FROM orders),
        |days AS (
        |  SELECT CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS DATE) AS d FROM span)
        |SELECT CAST(year(d)*10000 + month(d)*100 + day(d) AS INT) AS date_key, d AS date,
        |  CAST(year(d) AS INT) AS year, CAST(quarter(d) AS INT) AS quarter, CAST(month(d) AS INT) AS month_num,
        |  $monthCaseEs AS month_name_es,
        |  CAST(day(d) AS INT) AS day_of_month
        |FROM days ORDER BY date_key""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "a8_star_measures" ->
      s"""WITH $ratesCte,
        |sales AS (
        |  SELECT o_custkey AS customer_key,
        |    CASE WHEN l_returnflag = 'N' THEN 'Sale' WHEN l_returnflag = 'R' THEN 'Return'
        |         WHEN l_returnflag = 'A' THEN 'Adjustment' WHEN l_returnflag IS NULL THEN 'Unclassified'
        |         ELSE l_returnflag END AS document_category,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |         * COALESCE(rate, CAST(1.0000 AS DECIMAL(10,4))) AS DECIMAL(38,8)) AS sales_eur,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(3,2))
        |         * COALESCE(rate, CAST(1.0000 AS DECIMAL(10,4))) AS DECIMAL(38,8)) AS taxes_eur
        |  FROM lineitem
        |  LEFT JOIN orders ON l_orderkey = o_orderkey
        |  LEFT JOIN customer ON o_custkey = c_custkey
        |  LEFT JOIN rates ON c_nationkey = rates.n_nationkey),
        |dimc AS (
        |  SELECT c_custkey AS customer_key, r_name AS region_name
        |  FROM customer
        |  LEFT JOIN nation ON c_nationkey = n_nationkey
        |  LEFT JOIN region ON n_regionkey = r_regionkey),
        |b AS (
        |  SELECT o_custkey AS customer_key, CAST(o_totalprice AS DECIMAL(18,2)) AS budget_eur
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |        FROM orders) WHERE rn = 1),
        |breg AS (
        |  SELECT region_name, CAST(SUM(budget_eur) AS DECIMAL(18,2)) AS budget_total
        |  FROM b JOIN dimc USING (customer_key) GROUP BY region_name),
        |m AS (
        |  SELECT region_name,
        |    CAST(ROUND(SUM(CASE WHEN document_category = 'Sale' THEN sales_eur END), 2) AS DECIMAL(38,2)) AS sales_only,
        |    CAST(ROUND(SUM(taxes_eur), 2) AS DECIMAL(38,2)) AS total_taxes
        |  FROM sales JOIN dimc USING (customer_key) GROUP BY region_name)
        |SELECT region_name, sales_only, total_taxes,
        |  CAST(sales_only - total_taxes AS DECIMAL(38,2)) AS gross_margin,
        |  budget_total,
        |  CAST(sales_only - budget_total AS DECIMAL(38,2)) AS budget_variance,
        |  (CASE WHEN budget_total IS NULL OR budget_total = 0 THEN 0.0
        |        ELSE CAST(sales_only AS DOUBLE) / CAST(budget_total AS DOUBLE) END) * 100.0 AS achievement_pct
        |FROM m LEFT JOIN breg USING (region_name)
        |ORDER BY region_name""".stripMargin,

    "g1_dim_customer" ->
      """SELECT c_custkey AS customer_key, c_name AS customer_name, c_mktsegment AS market_segment,
        |  n_name AS nation_name, r_name AS region_name,
        |  CASE WHEN c_acctbal < 0 THEN 'DELINQUENT' ELSE 'OK' END AS credit_status,
        |  CAST(c_acctbal AS DECIMAL(18,2)) AS account_balance
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY customer_key""".stripMargin,

    "g2_dim_product" ->
      """SELECT p_partkey AS product_key, p_name AS product_name, p_brand AS brand,
        |  p_type AS product_type, p_size AS size,
        |  CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 25 THEN 'M' ELSE 'L' END AS size_category,
        |  CAST(p_retailprice AS DECIMAL(18,2)) AS retail_price
        |FROM part ORDER BY product_key""".stripMargin,

    "g3_fact_sales" ->
      s"""WITH $ratesCte
        |SELECT l_orderkey AS sales_document_number, l_linenumber AS sales_document_line,
        |  o_custkey AS customer_key, l_partkey AS product_key,
        |  CAST(o_orderdate AS DATE) AS billing_date, CAST(l_shipdate AS DATE) AS ship_date,
        |  CASE WHEN l_returnflag = 'N' THEN 'Sale' WHEN l_returnflag = 'R' THEN 'Return'
        |       WHEN l_returnflag = 'A' THEN 'Adjustment' WHEN l_returnflag IS NULL THEN 'Unclassified'
        |       ELSE l_returnflag END AS document_category,
        |  CAST(l_quantity AS DECIMAL(18,2)) AS quantity,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
        |       * COALESCE(rate, CAST(1.0000 AS DECIMAL(10,4))) AS DECIMAL(38,8)) AS sales_eur,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(3,2))
        |       * COALESCE(rate, CAST(1.0000 AS DECIMAL(10,4))) AS DECIMAL(38,8)) AS taxes_eur
        |FROM lineitem
        |LEFT JOIN orders ON l_orderkey = o_orderkey
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN rates ON c_nationkey = rates.n_nationkey
        |ORDER BY sales_document_number, sales_document_line""".stripMargin,

    "g4_fact_orders" ->
      s"""WITH $ratesCte
        |SELECT o_orderkey AS order_document_number, o_custkey AS customer_key,
        |  CAST(o_orderdate AS DATE) AS order_date,
        |  CASE WHEN o_orderstatus = 'F' THEN 'Closed' WHEN o_orderstatus = 'O' THEN 'Open'
        |       WHEN o_orderstatus = 'P' THEN 'Processing' ELSE 'Other' END AS order_status_group,
        |  o_orderpriority AS order_priority,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * COALESCE(rate, CAST(1.0000 AS DECIMAL(10,4))) AS DECIMAL(38,6)) AS order_value_eur
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN rates ON c_nationkey = rates.n_nationkey
        |ORDER BY order_document_number""".stripMargin,

    "g5_fact_budget" ->
      """WITH r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT o_custkey AS customer_key,
        |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS budget_month,
        |  CAST(o_totalprice AS DECIMAL(18,2)) AS budget_eur
        |FROM r WHERE rn = 1 ORDER BY customer_key""".stripMargin
  )
}
