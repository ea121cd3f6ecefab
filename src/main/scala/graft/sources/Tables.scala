package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Standardize

/** Fixture/table access layer. All queries read the parquet star schema under
  * a scale-factor directory (TESTDATA.md). The `events` table carries a
  * nanosecond-precision timestamp that Spark's parquet reader rejects by
  * default; we read it as epoch-nanos `LongType`
  * (`spark.sql.legacy.parquet.nanosAsLong`) and decode with the engine's
  * epoch heuristic (Standardize.epochDecode) — the same bigint-epoch decode
  * the reference applies in its Silver layer
  * (Silver_full_load.ipynb:cell 8).
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

  /** `events` with `ts` decoded from epoch-nanos to a microsecond timestamp;
    * the raw long is kept as `ts_ns` for operators that need the source
    * encoding (watermark arithmetic, epoch-decode tests). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", Standardize.epochDecode(col("ts")))
  }
}
