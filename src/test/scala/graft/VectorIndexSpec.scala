package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.ext.{Similarity, VectorIndex}
import graft.sources.Tables

/** Persisted IVF index: build/load round trip, append-only growth, static
  * partition pruning on the probed cells, and recall under a partial
  * probe. The exact-equality tests pin search's full probe to brute force
  * — the property the e7/e8 hash gates rely on. */
class VectorIndexSpec extends SparkSpecBase {

  private def planOf(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 10)
  private def tmp(name: String) = s"${sys.props("java.io.tmpdir")}/graft_vix_$name"

  private def triples(df: DataFrame): Set[(Long, Long, Int)] =
    df.select("q_id", "n_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("full-probe index search == brute force (build/write/load round trip)") {
    val idx = VectorIndex.build(emb, "vec_id", "embedding", tmp("full"), nlist = 8)
    val viaIndex = triples(
      VectorIndex.search(idx, queries, "vec_id", "embedding", k = 5, nprobe = 8))
    val brute = triples(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    assert(viaIndex == brute,
      "a full probe must rank exactly like brute force, stored norms included")
  }

  test("grown index == index built on the union corpus (full probe)") {
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
    VectorIndex.build(even, "vec_id", "embedding", tmp("grow"), nlist = 8)
    val grown = VectorIndex.grow(spark, tmp("grow"), odd, "vec_id", "embedding")
    assert(grown.assignments.count() == emb.count(),
      "growth must append exactly the batch rows")
    val viaGrown = triples(
      VectorIndex.search(grown, queries, "vec_id", "embedding", k = 5, nprobe = 8))
    val brute = triples(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    assert(viaGrown == brute,
      "frozen-centroid growth must not change full-probe ranking")
  }

  test("compact folds the per-grow file fan; search and row set unchanged") {
    val third = (r: Int) => emb.filter(col("vec_id") % 3 === r)
    VectorIndex.build(third(0), "vec_id", "embedding", tmp("cpt"), nlist = 8)
    VectorIndex.grow(spark, tmp("cpt"), third(1), "vec_id", "embedding")
    val grown = VectorIndex.grow(spark, tmp("cpt"), third(2), "vec_id", "embedding")
    def dataFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"${tmp("cpt")}/assignments"))
        .count(_.getName.endsWith(".parquet"))
    }
    val fannedFiles = dataFiles()
    val before = triples(
      VectorIndex.search(grown, queries, "vec_id", "embedding", k = 5, nprobe = 8))
    val compacted = VectorIndex.compact(spark, tmp("cpt"))
    assert(dataFiles() < fannedFiles,
      s"compaction must reduce the file fan: $fannedFiles -> ${dataFiles()}")
    assert(compacted.assignments.count() == emb.count(),
      "compaction must preserve every stored vector")
    val after = triples(
      VectorIndex.search(compacted, queries, "vec_id", "embedding", k = 5, nprobe = 8))
    assert(after == before, "compaction must not change search results")
  }

  test("partial-probe search statically prunes the assignments scan to the probed cells") {
    val idx = VectorIndex.build(emb, "vec_id", "embedding", tmp("prune"), nlist = 8)
    val one = emb.filter(col("vec_id") === 0)
    val res = VectorIndex.search(idx, one, "vec_id", "embedding", k = 5, nprobe = 2)
    // collect() (not count()) so the metrics below belong to THIS
    // queryExecution — count() would spawn a separate execution
    assert(res.collect().length == 5)
    // AQE hides executed scans inside QueryStageExec nodes, which
    // TreeNode.collect does not enter — walk stages explicitly
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      val nested = p match {
        case q: QueryStageExec => allNodes(q.plan)
        case r: ReusedExchangeExec => allNodes(r.child)
        case _ => Nil
      }
      p +: (p.children.flatMap(allNodes) ++ nested)
    }
    val scans = allNodes(planOf(res)).collect { case f: FileSourceScanExec => f }
    val assignScan = scans.find(_.output.exists(_.name == "n_vec"))
      .getOrElse(fail("no assignments scan in the search plan"))
    assert(assignScan.partitionFilters.nonEmpty,
      "the probed-cell IN filter must land as a partition filter")
    assert(assignScan.metadata("PartitionFilters").contains("cell"),
      s"partition filter must be on cell: ${assignScan.metadata("PartitionFilters")}")
    // fixture sanity: the UNFILTERED table spans all 8 cell directories
    val dirs = assignScan.relation.location.inputFiles
      .flatMap(f => "cell=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toInt)).toSet
    assert(dirs.size == 8, s"fixture should populate all 8 cells, got $dirs")
    // the EXECUTED scan must have read only the 2 probed cell partitions —
    // this is the actual exclusion property (a regression to a post-scan
    // filter would read all 8 and fail here)
    val partitionsRead = assignScan.metrics("numPartitions").value
    assert(partitionsRead == 2,
      s"nprobe=2 must read exactly 2 of 8 cell partitions, read $partitionsRead")
  }

  test("hybrid filtered search == brute force over the filtered corpus, predicate pushed") {
    val idx = VectorIndex.build(emb, "vec_id", "embedding", tmp("filt"),
      nlist = 8, payload = Seq("label"))
    val res = VectorIndex.search(idx, queries, "vec_id", "embedding",
      k = 5, nprobe = 8, pred = Some(col("label") < 3))
    val brute = Similarity.bruteForceTopK(emb.filter(col("label") < 3),
      queries, "vec_id", "embedding", k = 5)
    assert(triples(res) == triples(brute),
      "filtered full probe must rank exactly like brute force on the filtered corpus")
    val scans = planOf(res).collect { case f: FileSourceScanExec => f }
    val assignScan = scans.find(_.output.exists(_.name == "n_vec"))
      .getOrElse(fail("no assignments scan in the filtered search plan"))
    assert(assignScan.metadata("PushedFilters").contains("label"),
      s"payload predicate must reach the parquet footers: ${assignScan.metadata("PushedFilters")}")
  }

  test("grow onto a payload index keeps the payload; a batch lacking it fails loudly") {
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 =!= 0)
    VectorIndex.build(even, "vec_id", "embedding", tmp("gpay"),
      nlist = 8, payload = Seq("label"))
    val grown = VectorIndex.grow(spark, tmp("gpay"), odd, "vec_id", "embedding")
    // grown rows carry the stored payload column, populated — so hybrid
    // predicates can still match them
    assert(grown.assignments.columns.contains("label"))
    assert(grown.assignments.filter(col("label").isNull).count() == 0,
      "grown vectors must store real payload values, not nulls")
    val res = VectorIndex.search(grown, queries, "vec_id", "embedding",
      k = 5, nprobe = 8, pred = Some(col("label").isNotNull))
    assert(res.filter(col("n_id") % 2 =!= 0).count() > 0,
      "hybrid search must be able to return grown (odd-id) vectors")
    // a batch missing the stored payload is rejected, not silently nulled
    val e = intercept[IllegalArgumentException] {
      VectorIndex.grow(spark, tmp("gpay"), odd.drop("label"), "vec_id", "embedding")
    }
    assert(e.getMessage.contains("label"))
  }

  test("partial probe keeps useful recall vs brute force") {
    val idx = VectorIndex.build(emb, "vec_id", "embedding", tmp("recall"), nlist = 8)
    val part = triples(
      VectorIndex.search(idx, queries, "vec_id", "embedding", k = 5, nprobe = 3))
      .map(t => (t._1, t._2))
    val brute = triples(
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
      .map(t => (t._1, t._2))
    val recall = (part intersect brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall too low for nprobe=3/8 cells")
  }

  test("loaded centroids round-trip: nlist entries of corpus dimension") {
    VectorIndex.build(emb, "vec_id", "embedding", tmp("meta"), nlist = 8)
    val idx = VectorIndex.load(spark, tmp("meta"))
    assert(idx.nlist == 8)
    assert(idx.centroids.forall(_.length == 64),
      "centroids must keep the corpus dimension through the parquet round trip")
    assert(idx.assignments.columns.toSet == Set("n_id", "n_vec", "n_norm", "cell"))
  }

  test("embedding ingest screen == exact stored-vs-batch decision") {
    val stored = emb.filter(col("vec_id") < 350)
    val batch = emb.filter(col("vec_id") >= 350)
    val survivors = Similarity.embedIngestScreen(stored, batch, "vec_id",
        "embedding", 0.5)
      .collect().map(_.getLong(0)).toSet
    // oracle twin: exact pairwise against the stored side
    val dropped = Similarity.nearDupPairsExpr(emb, "vec_id", "embedding", 0.5)
      .filter((col("id_a") < 350 && col("id_b") >= 350) ||
        (col("id_a") >= 350 && col("id_b") < 350))
      .select(greatest(col("id_a"), col("id_b")).as("b"))
      .collect().map(_.getLong(0)).toSet
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors == (batchIds -- dropped),
      "screen must keep exactly the batch ids with no stored mate at threshold")
  }
}
