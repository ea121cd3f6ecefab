package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Release-hygiene noise for published aggregates — the
  * differential-privacy pipeline SHAPE with a seeded, reproducible noise
  * source. Published per-group statistics (data cards, corpus censuses)
  * leak membership at small group sizes; the standard mitigation adds
  * Laplace(Δ/ε) noise to each released count. This implementation draws
  * the Laplace deviate through the inverse CDF from a KEYED-HASH uniform
  * (md5 of seed:group → 52 mantissa bits) instead of an RNG, so releases
  * are deterministic, engine-replayable (the DuckDB oracle recomputes the
  * exact noise), and independent across groups and seeds.
  *
  * HONESTY NOTE: seeded noise is NOT differential privacy — an adversary
  * who knows the seed can subtract the noise. It is the
  * release-engineering shape of DP (same sensitivity analysis, same
  * pipeline, one swap of the uniform source to real entropy for a true
  * DP release) plus reproducibility, which real data-release processes
  * need for audit/replay. The ε accounting is still meaningful for the
  * swapped-in production variant.
  *
  * Scale shape: one mergeable count aggregation; the noise is a pure
  * per-group projection (codegen'd hash + arithmetic) — nothing beyond
  * the group-by census touches the corpus.
  */
object Privacy {

  /** Seeded uniform in (0,1), exclusive: 52 bits of `md5(seed:key)` plus
    * a half-ULP offset (so 0 and 1 are unreachable and `ln` below never
    * sees a zero argument). */
  private def seededUniform(seed: String, key: Column): Column =
    (conv(substring(md5(concat(lit(seed), lit(":"), key.cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") + lit(0.5)) /
      lit(4503599627370496.0) // 2^52

  /** Deterministic Laplace(0, scale) deviate keyed on (seed, key) via the
    * inverse CDF: `x = -scale · sgn(u−½) · ln(1 − 2|u−½|)`. */
  def laplaceNoise(seed: String, key: Column, scale: Double): Column = {
    val p = seededUniform(seed, key) - lit(0.5)
    val mag = -lit(scale) * log(lit(1.0) - lit(2.0) * abs(p))
    when(p < 0, -mag).otherwise(mag)
  }

  /** Per-group noised count release: true count + Laplace(Δ/ε) with unit
    * sensitivity (one record moves one count by 1), rounded to 6 decimals
    * for cross-engine IEEE parity (the [[graft.ext.TextStats]] LM-score
    * treatment). */
  def dpNoisedCounts(df: DataFrame, groupCol: String, epsilon: Double,
                     seed: String): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        round(col("__n") + laplaceNoise(seed, col(groupCol), 1.0 / epsilon), 6)
          .as("noised_count"))
  }

  /** Noised SUM release for a bounded integer measure: values clipped to
    * `[0, cap]` (clipping is what gives the sum a finite sensitivity —
    * the DP treatment of token counts and other unbounded per-record
    * contributions), then Laplace(cap/ε) on each group's sum. The clipped
    * sum stays in exact Long (IEEE summation order would otherwise make
    * the release partition-dependent); only the final noise add is one
    * double operation. */
  def dpNoisedSums(df: DataFrame, groupCol: String, valueCol: String,
                   cap: Long, epsilon: Double, seed: String): DataFrame = {
    require(epsilon > 0 && cap > 0, "epsilon and cap must be positive")
    df.groupBy(col(groupCol))
      .agg(sum(least(greatest(col(valueCol).cast("long"), lit(0L)), lit(cap)))
        .as("__s"))
      .select(col(groupCol),
        round(col("__s") + laplaceNoise(seed, col(groupCol), cap / epsilon), 6)
          .as("noised_sum"))
  }
}
