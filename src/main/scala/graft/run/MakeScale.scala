package graft.run

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up fixture generator: replicates a TPC-H-ish parquet directory
  * `factor`× with referential-integrity-preserving key shifts, producing a
  * larger dataset on which the SAME oracle SQL remains valid (both engines
  * read the produced files, so correctness comparison needs no external
  * data generator — the offline answer to "oracle the q* family at sf1"
  * when no sf1 fixture and no network data generator exist).
  *
  * Copy i shifts every join key by i·10⁷: foreign keys move together
  * (orders.o_custkey shifts with customer.c_custkey), so each copy is a
  * disjoint, internally-consistent replica of the source universe and
  * every equi-join produces exactly `factor`× the source matches — no
  * cross-copy joins, no broken orphan semantics. Non-key attributes are
  * untouched, so per-group aggregates are either identical (avg) or
  * exactly scaled (sum/count) — both recomputed from the same files by
  * the oracle, never assumed. `region`/`nation` (fixed dims joined by
  * every copy) and the non-TPC-H tables (`documents`/`embeddings`/
  * `events` keep their gates at the calibrated scale) are byte-copied
  * by default; any of the three can be opted into scaling.
  *
  * Each scaled table is written as ONE parquet file named `table.parquet`
  * (coalesce(1) + rename) because the oracle harness registers plain
  * single-file paths.
  *
  * Usage: `MakeScale <srcDir> <outDir> <factor> [extraTable...]` — extra
  * tables (`documents`, `embeddings`, `events`) are normally byte-copied
  * but can be opted into scaling; replicated documents make every
  * span/shingle a corpus-wide duplicate, which is exactly the
  * boilerplate-saturated worst case the dedup stack's skew guards exist
  * for, and scaled events stress the window/session/funnel families at
  * 10× their calibrated event volume.
  */
object MakeScale {
  private val Shift = 10000000L

  private val keyCols: Seq[(String, Seq[String])] = Seq(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part"     -> Seq("p_partkey"),
    "orders"   -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"))

  private val extraKeys = Map(
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    // shifting user_id with event_id keeps every per-user window/session/
    // funnel computation inside its own copy — the event-time analytics
    // families scale exactly like the equi-join ones
    "events"     -> Seq("event_id", "user_id"))

  private val copied = Seq("region", "nation", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args(2).toInt
    val extras = args.drop(3).toSeq
    extras.foreach(t => require(extraKeys.contains(t),
      s"unknown extra table $t (supported: ${extraKeys.keys.mkString(", ")})"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // full session prep (nanos-as-long conf + native functions): scaling
    // `events` must read EITHER fixture ts encoding, same as every other
    // entrypoint
    graft.GraftSession.setup(spark)

    Files.createDirectories(Paths.get(out))
    copied.filterNot(extras.contains).foreach { t =>
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$out/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    (keyCols ++ extras.map(t => t -> extraKeys(t))).foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val replicated = (0 until factor).map { i =>
        val shifted = keys.foldLeft(base) { (df, k) =>
          // cast back: the + widens, and a changed physical type would make
          // the scaled fixture diverge from the source schema contract
          val dt = base.schema(k).dataType
          df.withColumn(k, (col(k) + lit(i * Shift)).cast(dt))
        }
        // embeddings copies are PERTURBED, not byte-identical: verbatim
        // vector copies would make every ANN/near-dup measurement at 10×
        // degenerate (ties at cosine 1.0, bucket collisions by
        // construction). Deterministic hash noise (±1% per component,
        // keyed on vec_id/dimension/copy) keeps copy 0 exact and gives
        // the scaled corpus realistic near-duplicate structure — close
        // cross-copy cousins, never exact repeats. In-plan, engine-free
        // of RNG, reproducible across runs.
        if (t == "embeddings" && i > 0)
          shifted.withColumn("embedding",
            transform(col("embedding"), (x, j) =>
              (x + (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(2001L))
                .cast("double") / lit(1000.0) - lit(1.0)) * lit(0.01))
                .cast("float")))
        else shifted
      }.reduce(_ union _)
      // a LEGACY events fixture reads ts as LongType (nanosAsLong); writing
      // that long back produces a BARE INT64 column with no timestamp
      // logical type — Spark's Tables.events still decodes it, but DuckDB
      // cannot, so every event-time ORACLE would error on the scaled
      // fixture. Re-encode through the same normalization Tables.events
      // applies, landing on timestamp_ntz = the native fixture encoding
      // (micros precision, naive-as-UTC — exactly what epoch_ns reads).
      val scaled =
        if (t == "events" &&
            replicated.schema("ts").dataType == org.apache.spark.sql.types.LongType) {
          val ns = when(col("ts") > lit(graft.operators.Standardize.NsThreshold),
            col("ts")).otherwise(col("ts") * lit(1000000000L))
          replicated.withColumn("ts",
            timestamp_micros(floor(ns.cast(org.apache.spark.sql.types.DecimalType(38, 0)) / lit(1000))
              .cast(org.apache.spark.sql.types.LongType))
              .cast(org.apache.spark.sql.types.TimestampNTZType))
        } else replicated
      val tmp = s"$out/_tmp_$t"
      scaled.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new File(tmp).listFiles
        .find(f => f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$out/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      new File(tmp).listFiles.foreach(_.delete())
      Files.deleteIfExists(Paths.get(tmp))
      println(s"[make-scale] $t x$factor written")
    }
    spark.stop()
  }
}
