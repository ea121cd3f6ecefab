package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted inverted-file (IVF) vector index: build once, load anywhere,
  * grow append-only, search with partition-pruned reads.
  *
  * Layout under `dir`:
  *  - `centroids/` — `nlist` rows (cell, centroid array<double>): the index
  *    METADATA; tiny, collected to the driver on load;
  *  - `assignments/` — (n_id, n_vec, n_norm) parquet PARTITIONED BY `cell`:
  *    one directory per coarse cell, so a search probing `nprobe` of
  *    `nlist` cells statically prunes to ~nprobe/nlist of the files
  *    (`PartitionFilters` on the scan — the same touch-fewer-files
  *    mechanics as [[graft.sources.SkippingIndex]], via directory layout
  *    instead of footer stats).
  *
  * 100 TB shape: the expensive passes — normalizing the corpus, fitting
  * the coarse quantizer, assigning cells — happen ONCE at [[build]].
  * [[grow]] assigns only the BATCH against the frozen centroids (standard
  * IVF practice: FAISS's add-after-train) and appends new files into the
  * cell directories; the stored corpus is never reshuffled or rewritten.
  * [[search]] reads only the probed cells' files, broadcasts the (small)
  * query side, and reads STORED norms instead of recomputing them, so
  * per-query compute is ~nprobe·N/nlist scored vectors.
  *
  * Driver-side data is bounded by construction: `load` collects the
  * `nlist` centroid rows (index metadata, not corpus data) and `search`
  * collects the ≤ |queries|·nprobe probed cell ids — the same bounded-
  * probe class as [[graft.meta.ControlTables]]; corpus vectors never reach
  * the driver.
  *
  * The plain `append` here is the simple-parquet growth path;
  * [[IngestPipeline]]/`run.RunIngest` hold the crash-safe versioned-delta
  * + commit-log pattern for drivers that need redelivery idempotence.
  *
  * Reference analogue: none — the reference ships no vector index; this is
  * north-star extension capability (SURVEY §2 extensions), sharing its
  * quantizer and scoring expressions with [[Similarity.ivfTopK]] so the
  * session-transient and persisted paths cannot drift.
  */
object VectorIndex {

  final case class IvfIndex(dir: String, centroids: Array[Array[Double]],
                            assignments: DataFrame) {
    def nlist: Int = centroids.length
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  private def withCell(normalized: DataFrame,
                       centroids: Array[Array[Double]]): DataFrame =
    normalized.withColumn("cell",
      element_at(Similarity.nearestCells(col("n_vec"), centroids, 1), 1))

  /** Fit the coarse quantizer on `corpus` and write a fresh index at
    * `dir`, wiping any previous one (the gates' idempotence guarantee:
    * a re-run can never double-append). `payload` columns (labels,
    * source tags, timestamps) are stored alongside each vector so
    * [[search]] can filter on them INSIDE the pruned scan — hybrid
    * metadata+vector search without a join back to the source table. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
            nlist: Int = 16, seed: Long = 42L,
            payload: Seq[String] = Nil): IvfIndex = {
    val spark = corpus.sparkSession
    deleteDir(spark, dir)
    val centroids = Similarity.fitCoarseCentroids(
      Similarity.corpusFrame(corpus, idCol, vecCol), nlist, seed)
    import spark.implicits._
    centroids.zipWithIndex.toSeq
      .map { case (cent, i) => (i, cent.toSeq) }.toDF("cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/centroids")
    withCell(normalized(corpus, idCol, vecCol, payload), centroids)
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/assignments")
    load(spark, dir)
  }

  /** (n_id, n_vec, n_norm, payload...) — recomputed per call rather than
    * via the cached [[Similarity.corpusFrame]] because payload columns
    * vary by index; build/grow are one-off writes, not hot paths. */
  private def normalized(df: DataFrame, idCol: String, vecCol: String,
                         payload: Seq[String]): DataFrame =
    df.select(col(idCol).as("n_id") +: asDouble(col(vecCol)).as("n_vec") +:
        payload.map(col): _*)
      .withColumn("n_norm", Similarity.norm(col("n_vec")))

  /** Assign `batch` to the EXISTING centroids and append its rows into the
    * cell directories — growth touches only the batch; stored cells gain
    * files, never rewrite. Centroids stay frozen, so a grown index and an
    * index built on the union corpus rank identically under a full probe
    * (VectorIndexSpec pins this). The payload column set is NOT a
    * parameter: it is read from the stored assignments schema, so grown
    * rows always carry exactly the columns [[build]] declared — a batch
    * missing one fails loudly here instead of silently appending files
    * whose null payload would exclude every grown vector from any later
    * hybrid-search predicate. */
  def grow(spark: SparkSession, dir: String, batch: DataFrame,
           idCol: String, vecCol: String): IvfIndex = {
    val idx = load(spark, dir)
    val stored = idx.assignments.schema.fieldNames.toSeq
      .filterNot(Set("n_id", "n_vec", "n_norm", "cell"))
    val missing = stored.filterNot(batch.columns.contains)
    require(missing.isEmpty,
      s"index at $dir stores payload columns $stored; the batch lacks $missing")
    withCell(normalized(batch, idCol, vecCol, stored), idx.centroids)
      .write.partitionBy("cell").mode("append").parquet(s"$dir/assignments")
    load(spark, dir)
  }

  /** Fold the per-grow file fan back to ~one file per cell: each [[grow]]
    * APPENDS files into the cell directories, so after N daily batches a
    * probe of one cell opens N small files ([[graft.run.RunIngest]]'s
    * delta-fan problem, index-shaped). Reads the assignments fully into
    * a materialized barrier FIRST (overwriting a path being read), then
    * rewrites cell-partitioned. Row set, centroids, and search results
    * are unchanged (VectorIndexSpec pins search equality pre/post). */
  def compact(spark: SparkSession, dir: String): IvfIndex = {
    val idx = load(spark, dir)
    val all = idx.assignments.localCheckpoint(true)
    all.repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/assignments")
    load(spark, dir)
  }

  def load(spark: SparkSession, dir: String): IvfIndex = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect() // nlist rows: index metadata, bounded
      .map(_.getSeq[Double](1).toArray)
    IvfIndex(dir, cents, spark.read.parquet(s"$dir/assignments"))
  }

  /** Top-k per query over the probed cells only. The probed cell set is
    * collected from the (small, broadcast-side by contract) query frame
    * and applied as a STATIC `cell IN (...)` filter on the partition
    * column, so the assignments scan touches only those directories —
    * static rather than dynamic pruning because the probe set is already
    * known pre-execution and a literal IN survives every planner path.
    * `nprobe = nlist` probes every cell and is EXACT brute force (the
    * e7/e8 hash gates run there); cosine uses the same expression tree as
    * [[Similarity.bruteForceTopK]], over the stored norms.
    *
    * `pred` (over stored payload columns) makes this HYBRID search: the
    * predicate lands on the pruned scan itself — pushed into the parquet
    * footers of the surviving cell files, visible as PushedFilters — so
    * non-matching vectors die before a single dot product, and top-k
    * ranks among the matching vectors only (post-filter semantics). */
  def search(index: IvfIndex, queries: DataFrame, idCol: String,
             vecCol: String, k: Int = 5, nprobe: Int = 4,
             pred: Option[Column] = None): DataFrame = {
    val q = queries
      .select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", Similarity.norm(col("q_vec")))
      // explode_outer + isNotNull, not plain explode: explode's implicit
      // size(...)>0 filter would be pushed down and inline the full
      // centroid-distance expression as an interpreted per-row filter
      .withColumn("cell",
        explode_outer(Similarity.nearestCells(col("q_vec"), index.centroids, nprobe)))
      .filter(col("cell").isNotNull)
    val probed = q.select("cell").distinct().collect().map(_.getInt(0)) // ≤ |Q|·nprobe
    val cellPruned = index.assignments.filter(col("cell").isin(probed.toSeq: _*))
    searchCells(pred.fold(cellPruned)(cellPruned.filter), q, k)
  }

  /** The distinct cells a query set would probe — what [[search]]'s static
    * partition filter scans (exposed for the IndexBench file-skip report). */
  def probedCells(index: IvfIndex, queries: DataFrame, vecCol: String,
                  nprobe: Int): Seq[Int] =
    queries
      .select(explode_outer(Similarity.nearestCells(
        asDouble(col(vecCol)), index.centroids, nprobe)).as("cell"))
      .filter(col("cell").isNotNull)
      .distinct().collect().map(_.getInt(0)).toSeq

  // each corpus vector lives in exactly one cell, so the cell equi-join
  // cannot duplicate a (q_id, n_id) candidate — no distinct needed
  private def searchCells(pruned: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val scored = pruned.join(broadcast(q), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos_sim",
        Similarity.dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cos_sim")
  }

  private def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
