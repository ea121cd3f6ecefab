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
}
