package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Hot-key dedup evidence driver: builds a deliberately skewed keep-latest
  * workload from the events fixture — `factor`× replicated rows with a
  * single user owning `hotFrac` of the WHOLE table — and times plain
  * [[Dedup.keepLatest]] against [[Dedup.saltedKeepLatest]] on identical
  * input, asserting identical output (count + order-free checksum) before
  * reporting. This is the W2 fact-dedup shape at its pathological limit:
  * one window partition holding 20% of all rows lands on ONE task in the
  * plain plan, while the salted plan caps every task at `saltBuckets`
  * candidates per key.
  *
  * Usage: `SkewBench <sfDir> [factor] [hotFrac] [saltBuckets]`
  * Prints one JSON line: rows, hot-key rows, per-variant seconds
  * (min of `repeats` alternated runs), and the checksum equality.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val hotFrac = args.lift(2).map(_.toDouble).getOrElse(0.2)
    val saltBuckets = args.lift(3).map(_.toInt).getOrElse(64)
    val repeats = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE's own skew mitigation is deliberately ON for both variants:
      // the comparison is salted-vs-plain under the session defaults the
      // whole engine runs with, not a strawman
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.setup(spark)

    val base = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts_ns", "event_type", "value")
    // factor× replication with shifted event ids (MakeScale's scheme),
    // then one synthetic user takes over hotFrac of ALL rows — hash-gated
    // on the unique event id, so the hot set is deterministic and spread
    // across every input partition (the realistic shape: a bot account's
    // events arrive interleaved with everyone else's)
    val shift = 10000000L
    val big = (0 until factor).map { i =>
      base.withColumn("event_id", col("event_id") + lit(i * shift))
    }.reduce(_ union _)
      .withColumn("user_id",
        when(pmod(xxhash64(col("event_id")), lit(math.round(1.0 / hotFrac)))
          === 0, lit(-1L)).otherwise(col("user_id")))
      .localCheckpoint(true) // materialize: time the DEDUP, not the build
    val total = big.count()
    val hotRows = big.filter(col("user_id") === -1L).count()

    val order = Seq(col("ts_ns").desc, col("event_id").desc)
    // order-free content checksum; hashes reduced mod a prime so the sum
    // of 10M terms stays far inside long range (ANSI mode overflow-checks)
    def checksum(df: DataFrame): Long =
      df.select(pmod(xxhash64(df.columns.map(col): _*), lit(1000000007L)).as("h"))
        .agg(sum("h")).head().getLong(0)
    def timed(f: => DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val out = f
      val n = out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, n, checksum(out))
    }
    // alternate the variants so host stalls cannot bias one side; report min
    val runs = (1 to repeats).map { _ =>
      val p = timed(Dedup.keepLatest(big, Seq("user_id"), order))
      val s = timed(Dedup.saltedKeepLatest(big, Seq("user_id"), order, saltBuckets))
      (p, s)
    }
    val (plain, salted) = (runs.map(_._1), runs.map(_._2))
    require(plain.map(_._2).distinct.size == 1 &&
      plain.head._2 == salted.head._2 &&
      salted.map(_._2).distinct.size == 1, "row counts diverged")
    require(plain.map(_._3).distinct.size == 1 &&
      plain.head._3 == salted.head._3 &&
      salted.map(_._3).distinct.size == 1,
      "salted output differs from plain — semantics broken")
    println(s"""{"rows":$total,"hot_rows":$hotRows,"dedup_rows":${plain.head._2},""" +
      s""""plain_sec":${plain.map(_._1).min},"salted_sec":${salted.map(_._1).min},""" +
      s""""salt_buckets":$saltBuckets,"checksum_equal":true}""")
    spark.stop()
  }
}
