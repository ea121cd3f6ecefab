package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Similarity, VectorIndex}

/** Measures the persisted IVF index ([[graft.ext.VectorIndex]]) against
  * the full-scan brute-force path on an embeddings parquet (typically a
  * MakeScale-perturbed 10x fixture): build wall, then per-nprobe search
  * wall, recall@k vs brute force, and — the durable 100 TB metric, as in
  * LayoutBench — the fraction of assignment FILES the probed-cell
  * partition filter lets the scan touch.
  *
  * Usage: IndexBench <embeddingsParquet> [nlist] [k] [nQueries]
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val embPath = args(0)
    val nlist = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 5
    val nQ = if (args.length > 3) args(3).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.setup(spark)

    val emb = spark.read.parquet(embPath)
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < nQ)
    val dir = s"${sys.props("java.io.tmpdir")}/graft_ixbench"

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val (idx, buildS) = timed(
      VectorIndex.build(emb, "vec_id", "embedding", dir, nlist = nlist))
    println(f"[ixbench] corpus=$n%d nlist=$nlist%d build=$buildS%.1fs")

    // brute force = the recall reference AND the no-index wall baseline
    val (brute, bruteS) = timed(pairs(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = k)))
    println(f"[ixbench] brute_force wall=$bruteS%.1fs (${brute.size}%d pairs)")

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def filesIn(cells: Seq[Int]): Int = cells.map { c =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/assignments/cell=$c")
      if (fs.exists(p)) fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet")) else 0
    }.sum
    val allCells = (0 until nlist)
    val totalFiles = filesIn(allCells)

    Seq(1, 4, 16, nlist).distinct.filter(_ <= nlist).foreach { nprobe =>
      // probed cells across the query set (what the static IN filter scans)
      val probed = VectorIndex.probedCells(idx, queries, "embedding", nprobe)
      val (res, wall) = timed(pairs(
        VectorIndex.search(idx, queries, "vec_id", "embedding", k = k, nprobe = nprobe)))
      val recall = (res intersect brute).size.toDouble / brute.size
      println(f"[ixbench] nprobe=$nprobe%3d wall=$wall%.1fs recall@$k=$recall%.3f " +
        f"files=${filesIn(probed)}%d/$totalFiles%d cells=${probed.size}%d/$nlist%d")
    }
    spark.stop()
  }
}
