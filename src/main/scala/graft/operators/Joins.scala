package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skewed keys (SURVEY §4 scale posture).
  *
  * AQE's skew-join handling splits oversized SHUFFLE partitions at
  * runtime, which covers most cases; `saltedJoin` is the explicit,
  * planner-independent fallback for pathological hot keys (one key =
  * double-digit % of a 100 TB fact): the hot side gets a deterministic
  * salt, the other side is replicated to every salt bucket, and the
  * shuffle key becomes (keys…, salt) — a hot key's rows spread across
  * `saltBuckets` tasks by construction, not by AQE heuristics.
  */
object Joins {

  private[graft] val Salt = "__graft_salt"

  /** The salted left side — exposed package-private so the skew spec can
    * measure the actual per-(key, salt) shuffle-group bound directly. */
  private[graft] def saltedLeft(left: DataFrame, saltBuckets: Int): DataFrame =
    left.withColumn(Salt,
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))

  /** Inner equi-join with left-side salting: use when `left` carries hot
    * join keys and `right` is too big to broadcast but small enough to
    * replicate `saltBuckets` times (dims, rate tables, bucketed key sets).
    * Exact same result set as `left.join(right, keys)`. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 16): DataFrame = {
    val l = saltedLeft(left, saltBuckets)
    val r = right.withColumn(Salt,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, keys :+ Salt).drop(Salt)
  }

  private[graft] val Bin = "__graft_bin"

  /** Point-in-interval join without the cartesian: Spark plans a bare
    * `p.ts BETWEEN i.start AND i.end` predicate as BroadcastNestedLoop /
    * cartesian-plus-filter — O(|points|·|intervals|) work however
    * selective the ranges are. Binning equi-izes it: intervals replicate
    * to every `binSeconds`-wide time bin they touch, points carry their
    * single bin, and the join becomes a hash join on (keys…, bin) with
    * the BETWEEN kept as a residual filter. Each qualifying
    * (point, interval) pair meets in exactly one bin — the point's — so
    * no post-join distinct is needed and row counts are exact.
    *
    * Cost model: interval replication = interval length / binSeconds, so
    * pick binSeconds near the typical interval length (replication ~2×)
    * — the standard range-join binning trade. At 100 TB both sides
    * shuffle once on (keys, bin); candidate volume per bin is bounded by
    * bin width, never by table size. Intervals with end < start are
    * dropped (an unguarded `sequence` would walk backwards). */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   ptCol: String, startCol: String, endCol: String,
                   binSeconds: Long = 300L): DataFrame = {
    val binUs = binSeconds * 1000000L
    val p = points.withColumn(Bin, floor(unix_micros(col(ptCol)) / binUs))
    val i = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn(Bin,
        explode(sequence(floor(unix_micros(col(startCol)) / binUs),
          floor(unix_micros(col(endCol)) / binUs))))
    p.join(i, keys :+ Bin)
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop(Bin)
  }

  /** Interval-overlap join, same binning discipline as [[intervalJoin]]:
    * both sides replicate to the bins they touch, the overlap predicate
    * stays residual, and exactly-once emission comes from keeping each
    * pair only in the bin of the LATER start — two overlapping intervals
    * always share that bin (the later start lies inside both), and it is
    * unique per pair, so no post-join distinct. Start/end column names
    * must be disjoint across the two inputs. */
  def overlapJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  lStart: String, lEnd: String, rStart: String, rEnd: String,
                  binSeconds: Long = 300L): DataFrame = {
    val binUs = binSeconds * 1000000L
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(e) >= col(s))
      .withColumn(Bin,
        explode(sequence(floor(unix_micros(col(s)) / binUs),
          floor(unix_micros(col(e)) / binUs))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), keys :+ Bin)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col(Bin) === greatest(floor(unix_micros(col(lStart)) / binUs),
        floor(unix_micros(col(rStart)) / binUs)))
      .drop(Bin)
  }
}
