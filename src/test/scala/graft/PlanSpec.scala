package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Physical-plan invariants for the hot operators — the perf properties
  * (broadcast stars, pruned scans, pushed filters) are asserted so a
  * regression shows up as a red test, not as a silent 3x on the bench.
  */
class PlanSpec extends SparkSpecBase {

  private def planOf(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def collectAll[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(f) ++ p.subqueries.flatMap(collectAll(_)(f))

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("g3_fact_sales plans as a zero-shuffle broadcast star") {
    val p = planOf(q("g3_fact_sales"))
    val shuffles = collectAll(p) { case s: ShuffleExchangeLike => s }
    val bcasts = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(shuffles.isEmpty, s"fact build must not shuffle, found: $shuffles")
    assert(bcasts.size == 3, s"orders/customer/rates all broadcast, got ${bcasts.size}")
  }

  test("d18 bloom screen shuffles nothing: literal sketch probe + broadcast confirm") {
    val p = planOf(q("d18_bloom_screen"))
    val shuffles = collectAll(p) { case s: ShuffleExchangeLike => s }
    // the only legitimate exchanges are the candidate/confirm DISTINCTs —
    // both over the fpp-sized sliver, never over the corpus or the batch.
    // Corpus and batch relations reach their joins exclusively as
    // broadcast sides or probe-side scans.
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size == 2,
      s"confirm semi join + verdict join must both broadcast, got ${bhj.size}")
    assert(shuffles.size <= 2,
      s"only sliver-sized distinct exchanges allowed, found ${shuffles.size}: $shuffles")
  }

  test("p6 quarantine scan prunes to exactly the referenced columns") {
    val p = planOf(q("p6_quarantine_clean"))
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val read = scans.head.requiredSchema.fieldNames.toSet
    assert(read == Set("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice"),
      s"over-read: $read")
  }

  test("q5 pushes the region filter into the parquet scan") {
    val p = planOf(q("q5_local_supplier_volume"))
    val pushed = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metadata.get("PushedFilters")
    }.flatten
    assert(pushed.exists(_.contains("EqualTo(r_name,ASIA)")),
      s"region predicate must reach a scan, got: $pushed")
  }

  test("p9 watermark predicate reaches the events parquet scan through ts normalization") {
    // Tables.events rebuilds ts (cast on native encodings, epoch decode on
    // longs) — on the native encoding the watermark comparison must still
    // UNWRAP through the cast into PushedFilters, because rowgroup-skipping
    // the already-ingested history is what makes an incremental scan
    // incremental at 100 TB. (The epoch-long encoding cannot push — the
    // predicate sits on a computed column — so this asserts the native
    // path's strictly better plan stays that way.)
    val native = sources.Tables.load(spark, sfDir, "events")
      .schema("ts").dataType.typeName.startsWith("timestamp")
    assume(native, "fixture carries the epoch-long encoding; nothing to push")
    val p = planOf(q("p9_watermark_filter"))
    val pushed = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.metadata.get("PushedFilters")
    }.flatten
    assert(pushed.exists(s => s.contains("GreaterThan(ts") || s.contains("GreaterThanOrEqual(ts")),
      s"watermark cut must reach the events scan, got: $pushed")
  }

  test("e3 near-dup plan is fully distributed: broadcast chunk-pairs, no driver-side data") {
    val df = q("e3_embedding_near_dups")
    // construction must be lazy (the old path collect()ed the corpus while
    // BUILDING the frame; the chunked path cannot touch the driver)
    val p = planOf(df)
    val bcasts = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bcasts.size >= 2, s"both chunk-pair replications broadcast, got ${bcasts.size}")
    val locals = collectAll(p) {
      case l: org.apache.spark.sql.execution.LocalTableScanExec => l
    }
    // the only driver-materialized relation allowed is the tiny
    // chunk-pair list (chunks*(chunks+1)/2 int pairs)
    assert(locals.forall(_.output.length <= 2),
      s"no collected corpus may appear in the plan: ${locals.map(_.output)}")
    val cartesian = collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(cartesian.isEmpty, "all-pairs must come from the chunk equi-join, " +
      s"not a physical cross product: $cartesian")
  }

  test("u5 snapshot diff: snapshot date filters reach the scans, one full-outer key join") {
    val p = planOf(q("u5_snapshot_diff"))
    val pushed = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.get("PushedFilters")
    }.flatten
    assert(pushed.count(_.contains("LessThan(o_orderdate")) >= 2,
      s"both snapshots must push their date cut to the scan: $pushed")
    val fullOuter = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.joinType.toString == "FullOuter" => j
    }
    assert(fullOuter.size == 1, "exactly one key-shuffled full-outer join")
  }

  test("s4 projection reaches the scan (2-column query never reads the wide row)") {
    val p = planOf(q("s4_projection_scan"))
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val read = scans.head.requiredSchema.fieldNames.toSet
    assert(read == Set("c_custkey", "c_name", "c_mktsegment"), s"over-read: $read")
  }

  test("q19's disjunctive predicate stays a hash join with residual, never a cartesian") {
    val p = planOf(q("q19_disjunctive_revenue"))
    val nlj = collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nlj.isEmpty, s"disjunctive groups must ride the p_partkey equi-key:\n$p")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty)
  }

  test("q21's EXISTS/NOT EXISTS decorrelate to equi-key semi and anti joins") {
    val p = planOf(q("q21_waiting_suppliers"))
    val joins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j.joinType.toString
    }
    assert(joins.exists(_.contains("LeftSemi")), s"EXISTS must plan as a semi join: $joins")
    assert(joins.exists(_.contains("LeftAnti")), s"NOT EXISTS must plan as an anti join: $joins")
    val nlj = collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nlj.isEmpty, s"the inequality must stay a residual on the orderkey key:\n$p")
  }

  test("d10 dup-span join rides the window hash, never a cartesian or a driver pass") {
    val p = planOf(q("d10_dup_spans"))
    val nlj = collectAll(p) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(nlj.isEmpty, s"the positional-window self-join must be an equi-join on h:\n$p")
    val equiKeys = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys
      case j: BroadcastHashJoinExec => j.leftKeys
    }.flatten
    assert(equiKeys.exists(_.references.map(_.name).exists(_ == "h")),
      s"join keys must include the 64-bit window hash, got $equiKeys")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The 100 TB shuffle-join path: when a dim carries a selective filter
    // and the fact⋈dim join is too big to broadcast, Spark's
    // InjectRuntimeFilter builds a bloom filter over the dim's join keys
    // and pushes might_contain() into the fact scan — fact rows that can't
    // match die before the shuffle. Local thresholds are tuned down so the
    // tiny fixture takes the same plan shape a 100 TB fact would.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = sources.Tables.load(spark, sfDir, "lineitem")
      val ord = sources.Tables.load(spark, sfDir, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom runtime filter on the fact side:\n$optimized")
      // and the filter is only a pre-filter: results match the plain join
      val n = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      assert(n == plain, s"runtime filter changed the result: $n vs $plain")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("p20 upsample mix is shuffle-free (pure map + explode)") {
    val p = planOf(q("p20_upsample_mix"))
    val shuffles = collectAll(p) { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty,
      s"recipe materialization must not exchange anything, found: $shuffles")
  }

  test("p18 global shuffle is exactly one exchange (the shard partition)") {
    val p = planOf(q("p18_global_shuffle"))
    val shuffles = collectAll(p) { case s: ShuffleExchangeLike => s }
    assert(shuffles.size == 1,
      s"one hash exchange on shard, then per-shard sorts: $shuffles")
  }

  test("c4 data card aggregates partially (map-side combine on both stages)") {
    val p = planOf(q("c4_data_card"))
    val s = p.toString
    assert(s.contains("partial_bit_xor") || s.contains("partial_xor"),
      s"the xor fold must have a partial (map-side) stage:\n$s")
    assert(s.contains("partial_count") && s.contains("partial_sum"),
      "the count/sum aggregates must combine map-side")
  }

  test("t21 unigram LM broadcasts the totals and never explodes a cartesian") {
    val p = planOf(SparkEntry.queries("t21_unigram_logprob")(spark, sfDir))
    val s = p.toString
    assert(!s.contains("CartesianProduct"),
      "the 1-row totals frame must broadcast, not cartesian")
  }

  test("m10/m12 perceptual hashing never shuffles a payload (decode map only)") {
    // r15: the fixture generators may spread the SLIM id frame across
    // cores before synthesizing payloads (guide §8: decide placement on
    // light rows, move heavy bytes once — here the heavy bytes never
    // move at all). The load-bearing invariant is therefore sharper than
    // "no exchange anywhere": no exchange may carry a payload/binary
    // column — the codec work itself stays a per-partition map.
    for (name <- Seq("m10_image_phash", "m12_audio_hash")) {
      val p = planOf(q(name))
      val shuffles = collectAll(p) { case s: ShuffleExchangeLike => s }
      val payloadShuffles = shuffles.filter(_.child.output.exists(a =>
        a.name == "payload" ||
          a.dataType == org.apache.spark.sql.types.BinaryType))
      assert(payloadShuffles.isEmpty,
        s"$name must never exchange decoded/encoded payload bytes, found: $payloadShuffles")
      assert(shuffles.forall(_.child.output.length <= 1),
        s"$name may only spread the slim id frame, found wider exchange: $shuffles")
    }
  }

  test("bpe pair counting aggregates partially (map-side combine over the vocab)") {
    // the round's pair-count shuffle carries partial sums, never raw pairs
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val vocab = graft.ext.TextStats.bpeWordFreqs(docs, "text")
    val p = planOf(vocab)
    assert(p.toString.contains("partial_count"),
      "word-frequency census must combine map-side before its one shuffle")
    val shuffles = collectAll(p) { case s: ShuffleExchangeLike => s }
    assert(shuffles.size == 1, s"exactly one corpus-scale exchange: $shuffles")
  }

  test("m11 near-dup pairs never cartesian: banding + membership equi-joins only") {
    val p = planOf(q("m11_image_near_dups"))
    val s = p.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"hamming pair join must stay equi-keyed:\n$s")
  }

  test("session-added composed gates stay cartesian-free") {
    // g7 composes near-dup pairs into PageRank (ngram bucket joins +
    // rank joins), t30 joins three signal frames, t31 is one grouped
    // fold, m13 is the audio banding twin — none may nested-loop
    for (name <- Seq("g7_dup_pagerank", "t30_quality_ensemble",
        "t31_chat_pack", "m13_audio_near_dups")) {
      val s = planOf(q(name)).toString
      assert(!s.contains("CartesianProduct"),
        s"$name must not plan a cartesian")
    }
  }
}
