package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling (training-data pipelines need
  * reproducible subsets far more than statistical RNG sampling):
  * rows are kept by a hash gate on a stable business key, so the sample is
  *   - reproducible across runs, engines, and partitionings (no RNG, no
  *     partition-index dependence like `df.sample`),
  *   - a pure pushdown-able filter (no shuffle, composes with any scan),
  *   - consistent across tables sharing the key — sampling orders and
  *     lineitem by the same order key keeps the join complete (correlated
  *     sampling, the property RNG sampling destroys).
  */
object Sampling {

  private def nibble(key: Column): Column =
    substring(md5(key.cast("string")), 1, 1)

  /** Keep rows whose md5(key) leading hex digit falls in `hexDigits`:
    * fraction = |hexDigits|/16 in expectation, exact per key-set. */
  def hashSample(df: DataFrame, key: Column, hexDigits: Seq[String]): DataFrame =
    df.filter(nibble(key).isin(hexDigits: _*))

  /** Stratified deterministic sample: a different keep-fraction (nibble
    * set) per stratum value, evaluated in one pass (single OR-fold filter,
    * no per-stratum scan). Strata missing from `fractions` are dropped. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           fractions: Map[String, Seq[String]]): DataFrame = {
    val keep = fractions.toSeq.sortBy(_._1).map { case (sv, digits) =>
      stratum === lit(sv) && nibble(key).isin(digits: _*)
    }.reduce(_ || _)
    df.filter(keep)
  }

  /** Training-mix construction: keep each stratum at its target WEIGHT
    * (0.0–1.0 fraction, 1/65536 granularity) with the same deterministic
    * hash gate — the operation that turns N crawled sources into a
    * recipe-weighted training corpus. The gate compares the first 4 hex
    * chars of md5(key) against a per-stratum threshold string (fixed-width
    * lowercase hex compares lexicographically = numerically in every
    * engine), so the mix is reproducible, engine-portable, a pure
    * pushdown-able filter, and correlated across tables sharing the key.
    * Strata missing from `weights` are dropped. */
  def weightedMix(df: DataFrame, key: Column, stratum: Column,
                  weights: Map[String, Double]): DataFrame = {
    val keep = weights.toSeq.sortBy(_._1).map { case (sv, w) =>
      val units = math.round(w * 65536.0)
      val gate =
        if (units >= 65536L) lit(true)
        else if (units <= 0L) lit(false)
        else substring(md5(key.cast("string")), 1, 4) < lit(f"$units%04x")
      stratum === lit(sv) && gate
    }.reduce(_ || _)
    df.filter(keep)
  }
}
