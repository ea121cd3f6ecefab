package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase replacements for SINGLE-PARTITION global windows (VERDICT
  * r15 #3): `Window.orderBy(...)` with no partition spec moves the whole
  * input to ONE task (`WindowExec: No Partition Defined` — fine at
  * sf0.1, a scale-killer at 100 TB). The helpers here keep the exact
  * semantics — same rows, same ranks, same tie-breaks, hash-identical
  * outputs — while the heavy phase runs distributed:
  *
  *   - [[topK]]: phase 1 keeps each hash bucket's local top-k (parallel
  *     sort over ~rows/buckets each), phase 2 re-ranks the ≤ k·buckets
  *     survivors in one constant-key group. Exact because the global
  *     top-k is a subset of the union of per-bucket top-k for ANY
  *     disjoint bucketing.
  *   - [[withGlobalRowNumber]]: exact global rank via range partitioning
  *     + per-partition rank + broadcast partition-offset prefix sums —
  *     a distributed sort, no single-partition window at any size.
  *   - [[ntileFromRank]]: Spark's NTILE as arithmetic over that rank
  *     (first `n % t` buckets get `n/t + 1` rows — pinned by RanksSpec
  *     against the real window function).
  *   - [[withGlobalPrefixSum]]: per-partition running total + broadcast
  *     offsets; for integral values bit-identical to the global window
  *     (addition is exact and order-free).
  */
object Ranks {

  /** Exact global top-`k` rows by `order` (which must end in a unique
    * tie-break column — every call site here orders by (score, id)).
    * `bucket` is any expression over the row (typically the id); it only
    * shapes the plan and never affects the result. When `rankCol` is set
    * the global 1..k rank is kept under that name.
    *
    * ONE window, partitioned by a CONSTANT key written non-foldably
    * (a bare lit constant-folds out of the spec and the plan degrades to
    * the warned no-partition WindowExec). Because the spec is a
    * rank-function window under a `<= k` filter, Spark's
    * InferWindowGroupLimit plans it as WindowGroupLimit(Partial) →
    * one-group Exchange → WindowGroupLimit(Final) → Window: each map
    * partition ships AT MOST k rows, the merge sorts ≤ k·maps rows in
    * one task, and nothing ever moves the full input to a single
    * partition. (A two-phase hash-bucketed variant — tighter k·64 merge
    * bound — was A/B'd and cost an extra full exchange + sort for no
    * local win; the group-limit cap is the part that matters at scale.) */
  def topK(df: DataFrame, order: Seq[Column], k: Int, bucket: Column,
           rankCol: Option[String] = None): DataFrame = {
    require(k > 0)
    val ranked = df
      .withColumn("__rnk_g", row_number().over(
        Window.partitionBy(pmod(xxhash64(bucket), lit(1L))).orderBy(order: _*)))
      .filter(col("__rnk_g") <= k)
    rankCol.fold(ranked.drop("__rnk_g"))(c =>
      ranked.withColumnRenamed("__rnk_g", c))
  }

  /** Exact global `row_number` by `order` (must be a total order — end
    * it in a unique id), returned as `(frame + outCol, total row count)`.
    *
    * Shape: range-repartition on the sort key (the distributed sort),
    * pin the partition ids by persisting THROUGH [[graft.util.Caches]]
    * (range boundaries are sampled per materialization, so the counts
    * pass and the rank pass must read the SAME materialized assignment
    * — the registry also scopes the pin's lifetime to the session /
    * bench family), take per-partition counts (one small job — this is
    * also what materializes the cache), and add each partition's offset
    * to its local rank. The offsets ride a tiny map literal; the count
    * comes free off the same collect. */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column],
                          outCol: String): (DataFrame, Long) = {
    val p = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    // cache the INPUT too: a range exchange executes its child TWICE
    // (the boundary-sampling pass, then the shuffle itself), which
    // doubled expensive upstream plans (measured on p26's ensemble
    // score). Both pins ride the Caches registry — released per bench
    // family / on session teardown, never across runs.
    val src = graft.util.Caches.cached(df)
    val parted = graft.util.Caches.cached(
      src.repartitionByRange(p, order: _*)
        .withColumn("__rnk_p", spark_partition_id()))
    val cnts = parted.groupBy("__rnk_p").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = cnts.map(_._2).sum
    val offsets: Map[Int, Long] =
      cnts.map(_._1).zip(cnts.scanLeft(0L)(_ + _._2)).toMap
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offsets), col("__rnk_p")), lit(0L))
    val ranked = parted
      .withColumn(outCol, row_number().over(
        Window.partitionBy(col("__rnk_p")).orderBy(order: _*))
        .cast("long") + offCol)
      .drop("__rnk_p")
    (ranked, total)
  }

  /** Spark/DuckDB `ntile(t)` over `n` rows as arithmetic on the global
    * 1-based rank: bucket sizes are `n/t + 1` for the first `n % t`
    * buckets and `n/t` after (RanksSpec pins this against the window
    * function). For `n < t` every row opens its own bucket. */
  def ntileFromRank(rank: Column, n: Long, t: Int): Column = {
    require(t > 0)
    val size = n / t
    val big = n % t
    val cut = big * (size + 1)
    if (size == 0L) rank.cast("int")
    else when(rank <= cut, (rank - 1L) / (size + 1L) + 1L)
      .otherwise(lit(big) + (rank - cut - 1L) / size + 1L)
      .cast("int")
  }

  /** Exact EXCLUSIVE global prefix sum of `value` in `order` (total
    * order required, as above): per-partition exclusive running total
    * plus the broadcast sum of all earlier partitions. Addition must be
    * exact for this to equal the single-window fold regardless of
    * grouping — use with integral values (both call sites sum token
    * COUNTS). */
  def withGlobalPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
                          outCol: String): DataFrame = {
    val p = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    // input cached for the same sampling-pass reason as
    // [[withGlobalRowNumber]]
    val src = graft.util.Caches.cached(df)
    val parted = graft.util.Caches.cached(
      src.repartitionByRange(p, order: _*)
        .withColumn("__rnk_p", spark_partition_id()))
    val sums = parted.groupBy("__rnk_p")
      .agg(coalesce(sum(value), lit(0L)).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] =
      sums.map(_._1).zip(sums.scanLeft(0L)(_ + _._2)).toMap
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(offsets), col("__rnk_p")), lit(0L))
    val w = Window.partitionBy(col("__rnk_p")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn(outCol, coalesce(sum(value).over(w), lit(0L)) + offCol)
      .drop("__rnk_p")
  }
}
