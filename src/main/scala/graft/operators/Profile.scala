package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Column profiling: the per-column census (row count, null count,
  * exact/approx distinct count, min/max) every warehouse onboarding and
  * data-contract check runs before trusting a new source. Long-format
  * output — one row per column — so the profile of a 500-column table is
  * still one small frame a DQ dashboard can diff across loads.
  *
  * Two variants with the same schema:
  *   - `profile`: EXACT distinct counts. Spark plans multiple
  *     `count(DISTINCT c)` aggregates in one pass via an Expand node that
  *     replicates each input row once per profiled column — a deliberate
  *     ncols× map-side blow-up (still a single shuffle, partially
  *     aggregated). Right for profiling runs over a table sample or a
  *     bounded column list.
  *   - `approxProfile`: HLL++ distinct (`approx_count_distinct`), which
  *     keeps the plan a plain single-pass partial aggregate with NO row
  *     replication — the 100 TB full-table default.
  *
  * min/max are rendered as strings so heterogeneous column types share one
  * output schema. Floating columns render min/max as NULL by default
  * (engine-specific decimal formatting would make the profile
  * non-portable); counts are still reported for them.
  */
object Profile {

  /** Exact profile of `columns` (default: all columns). */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame =
    build(df, columns, exact = true)

  /** Single-pass profile with HLL++ distinct estimates (rsd ~2.3%
    * default): no Expand replication, safe over a full 100 TB table. */
  def approxProfile(df: DataFrame, columns: Seq[String] = Nil,
                    rsd: Double = 0.023): DataFrame =
    build(df, columns, exact = false, rsd)

  private def build(df: DataFrame, columns: Seq[String], exact: Boolean,
                    rsd: Double = 0.023): DataFrame = {
    val cs = if (columns.nonEmpty) columns else df.columns.toSeq
    val floating = df.schema.fields
      .collect { case f if f.dataType == DoubleType || f.dataType == FloatType => f.name }
      .toSet
    // one wide aggregate: every metric for every column in a single job
    val aggs =
      count(lit(1)).as("__n") +: cs.flatMap { c =>
        val mn =
          if (floating(c)) lit(null).cast("string") else min(col(c)).cast("string")
        val mx =
          if (floating(c)) lit(null).cast("string") else max(col(c)).cast("string")
        Seq(
          count(col(c)).as(s"__nn_$c"),
          (if (exact) count_distinct(col(c))
           else approx_count_distinct(col(c), rsd)).as(s"__nd_$c"),
          mn.as(s"__mn_$c"),
          mx.as(s"__mx_$c"))
      }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cs.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_val"),
        col(s"__mx_$c").as("max_val"))
    }
    row.select(explode(array(entries: _*)).as("m")).select("m.*")
  }

  /** Robust per-group outlier flags via median / MAD (median absolute
    * deviation) — the screen that drops corrupt numeric rows before
    * training or aggregation. Mean/σ rules break exactly when needed
    * most (the outliers inflate σ until nothing is an outlier); the
    * median/MAD pair has a 50% breakdown point. `k` ≈ 3.5 is the
    * conventional cut (≈ 2.3σ on clean gaussian data, MAD·1.4826 ≈ σ).
    *
    * Shape: two grouped EXACT percentiles (the a11-proven sort-based
    * aggregate — swap for [[graft.functions.KllQuantile]] when groups
    * run to billions of rows) + one broadcast join of the tiny
    * per-group stats back onto the rows; flagging is a pure map. Fully
    * engine-replayable (`percentile` ≙ DuckDB `quantile_cont`). */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.5): DataFrame = {
    require(df.columns.toSet.intersect(Set("med", "mad", "is_outlier")).isEmpty,
      "input already has a med/mad/is_outlier column — rename it first")
    // null-SAFE joins throughout: a NULL group key forms its own stratum
    // with its own med/mad instead of silently vanishing from the output
    // (an equi join back onto the rows would drop every NULL-group row —
    // the exact silent-loss failure a screening op must not have)
    val med = df.groupBy(col(groupCol).as("__g"))
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val withMed = df.join(broadcast(med), col(groupCol) <=> col("__g"))
      .drop("__g")
    val mad = withMed.groupBy(col(groupCol).as("__g"))
      .agg(percentile(abs(col(valueCol) - col("med")), lit(0.5)).as("mad"))
    withMed.join(broadcast(mad), col(groupCol) <=> col("__g"))
      .drop("__g")
      .withColumn("is_outlier",
        abs(col(valueCol) - col("med")) > lit(k) * col("mad"))
  }

  /** Equi-DEPTH histogram per group — the optimizer/profiling standard
    * next to the fixed-width census (`f6`): `buckets` ntile ranks of the
    * value (ties broken by the value itself — deterministic), each bucket
    * reporting its count and [lo, hi] bounds. Equal-population buckets
    * resolve skewed distributions where fixed-width bins collapse into
    * one giant bar; the boundaries are exactly what a range-partitioner
    * or a CBO selectivity estimate wants. One window + one aggregation;
    * at extreme scale swap the exact ntile for KLL quantile cuts. */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valueCol: String,
                         idCol: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    import org.apache.spark.sql.expressions.Window
    // the id tiebreak pins which of N TIED values lands each side of a
    // bucket boundary — without it two runs (or engines) disagree on the
    // straddling rows' buckets and the per-bucket counts/bounds drift
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    df.filter(col(valueCol).isNotNull)
      .withColumn("bucket", ntile(buckets).over(w))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Population Stability Index between a reference and a current
    * distribution — the standard drift monitor for an ingest batch
    * against the settled corpus (PSI < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 shifted): fixed-width floor bins, add-k smoothed bin
    * probabilities (empty bins stay finite), `PSI = Σ (p_cur − p_ref) ·
    * ln(p_cur / p_ref)`. Returns ONE row `(n_ref, n_cur, n_bins, psi)`.
    *
    * Scale shape: one count aggregation per side (mergeable), a full
    * outer join on the bin (bin-cardinality-sized, tiny), a broadcast
    * 1-row total, and the final sum folded in ascending-bin order so the
    * IEEE double is identical across partitionings and engines (the
    * [[graft.ext.TextStats.unigramLogProb]] determinism rule). */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          binWidth: Double, smoothing: Double = 0.5): DataFrame = {
    require(binWidth > 0 && smoothing > 0, "binWidth and smoothing positive")
    def binned(df: DataFrame, as: String): DataFrame = df
      .select(floor(col(valueCol).cast("double") / lit(binWidth))
        .cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(as))
    val u = binned(ref, "c_ref")
      .join(binned(cur, "c_cur"), Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cur"), lit(0L)).as("c_cur"))
    val tot = u.agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"),
      count(lit(1)).as("n_bins"))
    u.crossJoin(broadcast(tot))
      .withColumn("p_ref",
        (col("c_ref").cast("double") + lit(smoothing)) /
          (col("n_ref").cast("double") + lit(smoothing) * col("n_bins").cast("double")))
      .withColumn("p_cur",
        (col("c_cur").cast("double") + lit(smoothing)) /
          (col("n_cur").cast("double") + lit(smoothing) * col("n_bins").cast("double")))
      .withColumn("term",
        (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
      .groupBy()
      .agg(max("n_ref").as("n_ref"), max("n_cur").as("n_cur"),
        max("n_bins").as("n_bins"),
        aggregate(
          array_sort(collect_list(struct(col("bin"), col("term")))),
          lit(0.0), (acc, x) => acc + x.getField("term")).as("__psi"))
      .select(col("n_ref"), col("n_cur"), col("n_bins"),
        round(col("__psi"), 6).as("psi"))
  }

  private def cmsBucket(j: Int, key: org.apache.spark.sql.Column, width: Int,
                        seed: String) =
    pmod(conv(substring(md5(concat_ws(":", lit(seed), lit(j),
      key.cast("string"))), 1, 13), 16, 10).cast("long"), lit(width))

  /** COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005) — the fixed-size
    * frequency summary next to the HLL/theta/KLL family: `depth`
    * independent hash rows × `width` counters; an item's estimate is
    * the MIN of its `depth` counters, so the sketch only ever
    * OVER-estimates (collisions add, never subtract) and the error is
    * bounded by N/width per row with failure probability 2^-depth.
    * Returned sparse — `(row, bucket, cnt)`, only touched counters —
    * and MERGEABLE by construction: counters are plain sums, so
    * unioning two sketches and re-summing per (row, bucket) IS the
    * sketch of the concatenated streams (the per-segment/per-day
    * rollup shape; OperatorSpec proves merge ≡ whole). One explode
    * (depth× map-side, like profile's Expand) + one mergeable
    * aggregation; grid size is `depth·width` regardless of corpus
    * cardinality. */
  def countMinSketch(df: DataFrame, keyCol: String, depth: Int = 4,
                     width: Int = 256, seed: String = "cms"): DataFrame = {
    require(depth > 0 && width > 0, s"need depth>0, width>0: $depth/$width")
    val rb = (0 until depth).map(j => struct(lit(j).as("row"),
      cmsBucket(j, col(keyCol), width, seed).as("bucket")))
    df.select(explode(array(rb: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query a [[countMinSketch]]: for each distinct key in `keys`,
    * `est_cnt = min_j counter[j][h_j(key)]` (0 for a key hashing only
    * to untouched counters). `depth`/`width`/`seed` must match the
    * build. Broadcast-sized whenever the sketch is (`depth·width`
    * rows), so the probe is a map-side join however large `keys` is. */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                       depth: Int = 4, width: Int = 256,
                       seed: String = "cms"): DataFrame = {
    val rb = (0 until depth).map(j => struct(lit(j).as("row"),
      cmsBucket(j, col(keyCol), width, seed).as("bucket")))
    keys.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(array(rb: _*)).as("rb"))
      .select(col(keyCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }
}
