package graft

import org.apache.spark.sql.SparkSession

/** One-stop session preparation for the engine — the imperative twin of
  * installing [[graft.functions.GraftExtensions]] via
  * `spark.sql.extensions` (the production path; this helper covers
  * driver-owned and test sessions where the builder is not ours to
  * configure). Keeps [[graft.sources.Tables.load]] a PURE reader: table
  * loads must not mutate session state.
  *
  * - `spark.sql.legacy.parquet.nanosAsLong`: early fixture generations
  *   carried nanosecond-precision parquet timestamps that Spark otherwise
  *   rejects; with the flag they arrive as epoch-nano longs and
  *   [[graft.sources.Tables.events]] decodes them through the epoch
  *   heuristic. Current fixtures ship native `timestamp[us]` (the flag is
  *   then a no-op), but the conf stays set so a regeneration back to the
  *   nanos encoding cannot take a session down (SchemaDriftSpec covers
  *   both encodings).
  * - native expression registration: `rolling_hash`, `dot_product`,
  *   `simhash64` become resolvable from SQL and `call_function`.
  */
object GraftSession {
  def setup(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.RollingHash.register(spark)
    graft.functions.DotProduct.register(spark)
    graft.functions.SimHash64.register(spark)
    graft.functions.BloomSketch.register(spark)
    graft.functions.KllQuantile.register(spark)
    graft.functions.TopKBy.register(spark)
    spark
  }
}
