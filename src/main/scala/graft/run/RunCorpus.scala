package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone driver for the training-corpus pipeline
  * ([[graft.ext.CorpusPipeline]]): prepares the `documents` table end to
  * end and writes the packed bins plus the per-stage census.
  *
  * Usage: RunCorpus <sfDir> <outDir> [benchmarkMaxId]
  *
  * Documents below `benchmarkMaxId` (default 25, mirroring the d7 gate's
  * split) play the held-out benchmark: they are excluded from the corpus
  * and drive the decontamination screen.
  */
object RunCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val benchMax = if (args.length > 2) args(2).toLong else 25L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.setup(spark)

    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val (packed, census) = graft.ext.CorpusPipeline.run(
      docs.filter(col("doc_id") >= benchMax),
      docs.filter(col("doc_id") < benchMax))
    packed.write.mode("overwrite").parquet(s"$outDir/corpus_bins")
    import spark.implicits._
    census.toDF().write.mode("overwrite").parquet(s"$outDir/corpus_census")
    println(census.map(c => s"""\"${c.stage}\":${c.docs}""")
      .mkString("{", ",", "}"))
    graft.util.Caches.releaseAll()
    spark.stop()
  }
}
