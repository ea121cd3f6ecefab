package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.operators.Standardize

/** Fixture/table access layer. All queries read the parquet star schema under
  * a scale-factor directory (TESTDATA.md). The `events` table's `ts` column
  * has shipped in two encodings across fixture generations — epoch-nanos
  * `int64` (read as `LongType` via `spark.sql.legacy.parquet.nanosAsLong`)
  * and native parquet `timestamp[us]` (read as `TimestampNTZType`) — so
  * [[events]] branches on the decoded Spark type rather than assuming one.
  * This mirrors the reference, whose Silver bigint-date decode is itself
  * dtype-conditional (Silver_full_load.ipynb:cell 8: `if dtype=='bigint'`).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Raw parquet scan — a PURE reader: session preparation (ns-timestamp
    * conf, native function registration) lives in [[graft.GraftSession
    * .setup]] / [[graft.functions.GraftExtensions]], run once at session
    * build. Column pruning + predicate pushdown reach the scan because we
    * return the untouched relation (no barriers in the plan). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` normalized to ONE downstream contract regardless of the
    * fixture's `ts` encoding: `ts` is a session-tz (UTC) `TimestampType`
    * and `ts_ns` is the epoch-nanosecond `LongType` twin that watermark
    * arithmetic and epoch-decode tests consume.
    *
    *  - epoch-nanos `LongType` source → `ts` via the engine's epoch
    *    heuristic ([[Standardize.epochDecode]]), `ts_ns` is the raw long.
    *    KNOWN BLIND SPOT (faithful to the reference heuristic, which has
    *    exactly two regimes): a long encoded in epoch MILLIS (~1.7e12
    *    today) exceeds [[Standardize.NsThreshold]] and is silently read
    *    as nanos (decoding to ~1970) — only seconds- and nanos-encoded
    *    longs round-trip. The loud-failure guarantee below covers
    *    unsupported COLUMN TYPES, not in-range unit ambiguity, which no
    *    value heuristic can resolve;
    *  - native `timestamp`/`timestamp_ntz` source → `ts` passes through
    *    (NTZ wall-clock is the UTC instant — session tz is pinned to UTC
    *    everywhere, matching DuckDB's naive-as-UTC `epoch_ns`), `ts_ns`
    *    derived as `unix_micros(ts) * 1000`.
    *
    * Unknown encodings fail loudly at analysis instead of mis-decoding. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // ts_ns carries NANOS whatever the long's unit: raw values on the
        // nanos side of the epoch heuristic pass through untouched
        // (preserving sub-microsecond precision the decoded ts floors
        // away); a seconds-encoded fixture is scaled up rather than
        // silently mislabeled as nanos
        raw
          .withColumn("ts_ns",
            when(col("ts") > lit(Standardize.NsThreshold), col("ts"))
              .otherwise(col("ts") * lit(1000000000L)))
          .withColumn("ts", Standardize.epochDecode(col("ts")))
      case TimestampType | TimestampNTZType =>
        val ltz: Column = col("ts").cast(TimestampType)
        raw
          .withColumn("ts_ns", unix_micros(ltz) * lit(1000L))
          .withColumn("ts", ltz)
      case other =>
        throw new IllegalArgumentException(
          s"events.ts has unsupported encoding $other; expected BIGINT epoch or TIMESTAMP[_NTZ]")
    }
  }
}
