package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ParquetDirSource

/** Gold-incremental convergence check at arbitrary fixture scale — the
  * driver twin of PipelineSpec's five-model convergence test, runnable
  * against a scaled fixture (`/tmp/sf1e`-style) where the spec's unit
  * fixture would prove nothing about 10× behavior:
  *
  *   1. full medallion build (bronze → silver → gold), timed;
  *   2. mutate ~10% of each primary silver source (value bump + audit
  *      stamp past the watermark) — the change-capture shape the
  *      incremental path keys on;
  *   3. `runGoldIncremental`, timed;
  *   4. assert each of the five gold models EQUALS its full-rebuild twin
  *      (same keyed-grain build over the mutated silver), compared
  *      DISTRIBUTED (two anti joins per model on the non-audit columns
  *      — no driver collect, unlike the unit spec's set compare, because
  *      at sf1 gold_fact_sales is 6M rows).
  *
  * Prints one JSON line with wall times and per-model equality; any
  * inequality exits nonzero. Usage: `ConvergeCheck <sfDir> [whDir]`.
  */
object ConvergeCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val whDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_wh_conv").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.setup(spark)

    val wh = Warehouse(spark, whDir)
    val src = ParquetDirSource(sfDir,
      Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem"))
    val fixedClock = () => java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val pipe = new Pipeline(wh, src, "converge-check", fixedClock)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, fullSec) = timed {
      pipe.runBronze(); pipe.runSilver(); pipe.runGold()
    }

    val t2 = java.sql.Timestamp.valueOf("2026-06-01 00:00:00")
    def mutate(table: String, keyCol: String, valCol: String): Unit = {
      val mutated = wh.read(table)
        .withColumn(valCol,
          when(col(keyCol) % 10 === 0, col(valCol) * 2).otherwise(col(valCol)))
        .withColumn("silver_created_date",
          when(col(keyCol) % 10 === 0, lit(t2)).otherwise(col("silver_created_date")))
        .localCheckpoint(true) // cut lineage off the files being overwritten
      wh.write(table, mutated)
    }
    val (_, mutateSec) = timed {
      mutate("silver_customer", "c_custkey", "c_acctbal")
      mutate("silver_part", "p_partkey", "p_retailprice")
      mutate("silver_orders", "o_orderkey", "o_totalprice")
      mutate("silver_lineitem", "l_orderkey", "l_quantity")
    }

    val (counts, incSec) = timed {
      pipe.runGoldIncremental(java.sql.Timestamp.valueOf("2026-05-01 00:00:00"))
    }

    // distributed equality on the business payload (audit cols excluded:
    // full-rebuild twins share the fixed clock but not the merge lineage)
    def business(df: DataFrame): DataFrame =
      df.select(df.columns.filterNot(_.startsWith("gold_")).sorted.map(col): _*)
    val results = pipe.goldModels()
      .filter(m => counts.keySet.contains(m.name))
      .map { m =>
        val got = business(wh.read(m.name))
        val want = business(m.atGrain)
        val extra = got.exceptAll(want).count()
        val missing = want.exceptAll(got).count()
        (m.name, extra == 0 && missing == 0, extra, missing)
      }
    val models = results.map { case (n, eq, _, _) => s""""$n":$eq""" }
      .mkString("{", ",", "}")
    println(s"""{"sf_dir":"$sfDir","full_sec":$fullSec,"mutate_sec":$mutateSec,""" +
      s""""incremental_sec":$incSec,"models":$models}""")
    results.filterNot(_._2).foreach { case (n, _, e, miss) =>
      System.err.println(s"[converge] $n DIVERGED: extra=$e missing=$miss")
    }
    spark.stop()
    if (results.exists(!_._2)) sys.exit(1)
  }
}
