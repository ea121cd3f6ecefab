package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ×N DML pillar: proves the BOUNDED verbs stay bounded two orders of
  * magnitude above the gated fixture. Replicates sf0.1 lineitem
  * `factor`× with disjoint key shifts (the MakeScale rule: copy i
  * shifts l_orderkey by i·10⁷), commits it as a range-clustered
  * versioned table, then runs the round-11 verb set and reports, per
  * verb, wall seconds and the rewritten/carried file split — the
  * 100 TB claim is exactly that rewritten ≪ carried at every scale:
  *
  *   - UPDATE over one narrow key box;
  *   - MERGE with a bimodal CDC batch (updates in a narrow range +
  *     far-key inserts — the exact point probe must keep the inserts
  *     from inflating the touched set);
  *   - key-list DELETE with a scattered redaction list;
  *   - small-file compaction after a 12-epoch append trail.
  *
  * Usage: `MergeScale <sfDir> [factor]` (default 100 ⇒ ~60M rows).
  * Prints one JSON line; human summary goes to SCALE.md.
  */
object MergeScale {
  private val Shift = 10000000L

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.{SkippingIndex, VersionedTable}
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_mergescale").toString + "/t"
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
    val copies = spark.range(factor).select(col("id").as("__copy"))
    val big = li.crossJoin(broadcast(copies))
      .select((col("l_orderkey") + col("__copy") * Shift).as("l_orderkey"),
        col("l_partkey"), col("l_returnflag"), col("l_quantity"))
    val (_, tLoad) = timed {
      VersionedTable.overwrite(spark, root,
        big.repartitionByRange(64, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey"))
    }
    val rows = VersionedTable.read(spark, root).count()
    val nFiles = VersionedTable.dataFiles(root).size

    // 1) bounded UPDATE: one narrow box inside copy 3
    val lo = 3L * Shift + 1000L; val hi = 3L * Shift + 5000L
    val ((_, uRw, uCarry), tUpd) = timed {
      VersionedTable.updateWhere(spark, root,
        col("l_orderkey") >= lo && col("l_orderkey") <= hi,
        Map("l_returnflag" -> lit("U")),
        Seq(SkippingIndex.ColRange("l_orderkey", lo, hi)))
    }

    // 2) bimodal MERGE: updates in copy 5's low key range + inserts far
    // above every copy — the probe must keep the far keys from widening
    // the touched set to the whole table. One source row per key (the
    // SQL multiple-matches rule; it may match several target lineitems).
    // The batch is MATERIALIZED first so tMerge prices the merge, not
    // the CDC extraction.
    val updSrc = graft.operators.Dedup.keepLatest(
      VersionedTable.read(spark, root)
        .filter(col("l_orderkey") >= 5L * Shift &&
          col("l_orderkey") < 5L * Shift + 50000L),
      Seq("l_orderkey"), Seq(col("l_quantity").desc))
      .withColumn("l_quantity", col("l_quantity") + lit(1.0))
    val insSrc = updSrc.select(
      (col("l_orderkey") + lit(900L * Shift)).as("l_orderkey"),
      col("l_partkey"), lit("I").as("l_returnflag"), col("l_quantity"))
    val batch = updSrc.unionByName(insSrc).persist()
    val batchN = batch.count()
    val ((_, mRw, mCarry), tMerge) = timed {
      VersionedTable.mergeInto(spark, root, batch, Seq("l_orderkey"),
        updateWhen = Some(expr("s.l_quantity > t.l_quantity")),
        insertWhen = Some(lit(true)))
    }
    batch.unpersist()

    // 3) scattered key-list DELETE: every 997th key across 4 copies
    val doomed = spark.range(10000)
      .select((col("id") % 4L * Shift * 2L + (col("id") * 997L % 60000L)).as("k"))
    val ((_, dRw, dCarry), tDel) = timed {
      VersionedTable.deleteWhereKeys(spark, root, "l_orderkey", doomed)
    }

    // 4) compaction of a 12-epoch small-file trail
    (0 until 12).foreach { e =>
      VersionedTable.append(spark, root, li.limit(100)
        .select((col("l_orderkey") + lit((950L + e) * Shift)).as("l_orderkey"),
          col("l_partkey"), col("l_returnflag"), col("l_quantity")))
    }
    val ((_, cRw, cCarry), tCompact) = timed {
      VersionedTable.compactSmall(spark, root, minBytes = 1024L * 1024)
    }

    val finalRows = VersionedTable.read(spark, root).count()
    println(
      s"""{"pillar":"merge_scale","factor":$factor,"rows":$rows,"files":$nFiles,
         |"load_s":${f"$tLoad%.1f"},
         |"update":{"wall_s":${f"$tUpd%.1f"},"rewritten":$uRw,"carried":$uCarry},
         |"merge":{"wall_s":${f"$tMerge%.1f"},"batch_rows":$batchN,"rewritten":$mRw,"carried":$mCarry},
         |"delete_keys":{"wall_s":${f"$tDel%.1f"},"rewritten":$dRw,"carried":$dCarry},
         |"compact":{"wall_s":${f"$tCompact%.1f"},"rewritten":$cRw,"carried":$cCarry},
         |"final_rows":$finalRows}""".stripMargin.replace("\n", ""))
    spark.stop()
  }
}
