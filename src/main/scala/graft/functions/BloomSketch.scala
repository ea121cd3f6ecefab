package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions.{call_function, lit}

/** Column-level access to Spark's own bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) — the sketch pair
  * Catalyst itself injects for runtime row-level filtering, exposed here as
  * registered functions so library operators can build an EXPLICIT corpus
  * membership sketch: a fixed-size, mergeable summary whose bytes depend
  * only on (expectedItems, fpp), never on corpus row count. That inversion
  * is the 100 TB point — a billion-key corpus compresses to a blob the
  * driver can hold and every executor can probe map-side, so an ingest
  * batch is screened without shuffling either relation.
  *
  * Both are Spark-internal expressions, reached the same way the other
  * graft natives are (temp-function registry + `call_function`); the agg
  * input must be `xxhash64(key)` (LongType), matching Spark's runtime
  * filter convention.
  */
object BloomSketch {

  /** Optimal bit count for an `n`-item filter at false-positive rate `p`:
    * m = ceil(-n ln p / (ln 2)^2), the standard bloom sizing formula. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"need expectedItems > 0 and fpp in (0,1), got ($expectedItems, $fpp)")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }

  /** Register `bloom_agg(hash, items, bits)` and
    * `bloom_might_contain(sketch, hash)`. Idempotent. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }

  /** Aggregate a `xxhash64` column into a serialized bloom filter blob. */
  def bloomAgg(hash: Column, expectedItems: Long, fpp: Double): Column =
    call_function("bloom_agg", hash,
      lit(expectedItems), lit(optimalNumBits(expectedItems, fpp)))

  /** Probe a sketch blob (a LITERAL — `BloomFilterMightContain` requires a
    * constant or scalar-subquery filter side) with a `xxhash64` column. */
  def mightContain(sketch: Array[Byte], hash: Column): Column =
    call_function("bloom_might_contain", lit(sketch), hash)
}
