package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (north-star ANN):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH-bucketed variant as the scale path.
  *
  * Scale design: brute force is a broadcast of the (small) query set against
  * a full scan of the corpus — O(Q·N) but embarrassingly parallel and
  * shuffle-free until the final per-query top-k (a tiny aggregation).
  * The LSH path buckets the corpus once (pure map), then joins query
  * buckets to corpus buckets — candidate count is bucket-bounded, turning
  * O(Q·N) into O(Q·N/2^bits) at a recall cost.
  */
object Similarity {

  /** Dot product of two array<double> columns — the native codegen
    * Expression ([[graft.functions.DotProduct]]); bit-identical to the
    * zip_with/aggregate fold (same left-to-right summation) but stays
    * inside whole-stage codegen instead of the HOF CodegenFallback path.
    * Requires DotProduct.register on the session (done in Tables.load;
    * [[dotFold]] is the registration-free HOF twin). */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  /** HOF fallback formulation (interpreted) — kept as the portable twin
    * and for sessions without the function registered. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  // NOTE: an unrolled sum-of-element_at formulation was measured 4x SLOWER
  // than the zip_with/aggregate fold at dim=64 (the wide expression tree
  // falls out of compact codegen); the native expression beats both.

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** The shared normalized corpus: (n_id, n_vec, n_norm) persisted through
    * the [[graft.util.Caches]] registry. Every similarity operator in a
    * session derives from this SAME analyzed plan, so one materialization
    * (cast + norm over the parquet scan) serves brute-force, LSH, IVF, and
    * near-dup — index once, query many; `Caches.releaseAll()` releases it.
    */
  def corpusFrame(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.util.Caches.cached(
      corpus.select(col(idCol).as("n_id"), asDouble(col(vecCol)).as("n_vec"))
        .withColumn("n_norm", norm(col("n_vec"))))

  /** Exact top-k neighbors for each query vector (queries broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int = 5): DataFrame = {
    // norms computed once per side, not per pair (3x fewer dot products)
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val c = corpusFrame(corpus, idCol, vecCol)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos_sim",
        dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cos_sim")
  }

  /** Hard-negative mining for contrastive / embedding-model training:
    * per anchor, the top-k most-similar corpus vectors that are NOT
    * near-duplicates — rank by cosine descending restricted to
    * `cos < dupThreshold`. The exclusion matters because unlabeled
    * near-dups of the anchor are the classic contrastive-training poison
    * (false negatives teach the model to push paraphrases apart);
    * `dupThreshold` is the same constant the near-dup pair census
    * ([[nearDupPairs]] / gate e3) uses, so "excluded" is exactly "an e3
    * pair of the anchor". Same broadcast-anchor scan shape as
    * [[bruteForceTopK]]; swap the scan for the IVF index at real scale
    * and keep the threshold filter. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int = 5,
                    dupThreshold: Double = 0.5): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    val c = corpusFrame(corpus, idCol, vecCol)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos_sim",
        dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
      .filter(col("cos_sim") < lit(dupThreshold))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cos_sim")
  }

  /** Contrastive-training TRIPLET assembly — the deliverable dataset an
    * embedding-model trainer consumes: for every vector that has a
    * near-duplicate, emit `(anchor, positive, negative×k)` where the
    * positive is the anchor's HIGHEST-cosine near-dup partner (tie → min
    * id) and the negatives come from [[hardNegatives]] (most similar
    * NON-dups — hard negatives train better than random ones, false
    * negatives poison). Both ingredients are the already-gated e3/e12
    * constructions; this composes them into the dataset shape. */
  def contrastiveTriplets(corpus: DataFrame, idCol: String, vecCol: String,
                          dupThreshold: Double = 0.5, kNeg: Int = 3): DataFrame = {
    val pairs = nearDupPairs(corpus, idCol, vecCol, dupThreshold)
    val bi = pairs.select(col("id_a").as("anchor_id"),
        col("id_b").as("partner"), col("cos_sim"))
      .unionByName(pairs.select(col("id_b").as("anchor_id"),
        col("id_a").as("partner"), col("cos_sim")))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("cos_sim").desc, col("partner").asc)
    val pos = bi.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("anchor_id"), col("partner").as("pos_id"))
    val anchors = corpus.join(
      pos.select(col("anchor_id").as(idCol)).distinct(), Seq(idCol))
    hardNegatives(corpus, anchors, idCol, vecCol, kNeg, dupThreshold)
      .select(col("q_id").as("anchor_id"), col("n_id").as("neg_id"),
        col("rnk").as("neg_rnk"))
      .join(pos, "anchor_id")
      .select("anchor_id", "pos_id", "neg_id", "neg_rnk")
  }

  /** Deterministic random-hyperplane matrix (seeded — no runtime RNG). */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(bits, dim)(rng.nextGaussian())
  }

  /** Sign-bit LSH bucket id for each vector: bit p = (v · h_p) > 0. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (h, p) =>
      when(dot(vec, typedlit(h.toSeq)) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN top-k: exact ranking restricted to LSH-bucket candidates.
    * Multi-table (standard recall amplification): `tables` independent
    * hyperplane sets; a corpus vector is a candidate if it shares a bucket
    * with the query in ANY table. Candidate count — and the compute/recall
    * trade — is `tables · N / 2^bits` per query instead of N. */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int = 5, bits: Int = 8, tables: Int = 8,
              dim: Int = 64): DataFrame = {
    val buckets = (vec: Column) => array((0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        lshBucket(vec, hyperplanes(dim, bits, seed = 42L + t)).as("bucket"))
    }: _*)
    val c = corpusFrame(corpus, idCol, vecCol)
      .withColumn("b", explode(buckets(col("n_vec"))))
      .select(col("n_id"), col("n_vec"), col("b.tbl"), col("b.bucket"))
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("b", explode(buckets(col("q_vec"))))
      .select(col("q_id"), col("q_vec"), col("b.tbl"), col("b.bucket"))
    val cand = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "q_vec", "n_id", "n_vec")
      .dropDuplicates("q_id", "n_id")
    val scored = cand.withColumn("cos_sim", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cos_sim")
  }

  /** Coarse k-means quantizer fit — the engine's OWN deterministic Lloyd
    * loop over a `(n_id, n_vec)` frame, no MLlib: init = the `nlist`
    * corpus vectors with the smallest `(md5("seed:id"), id)` (order-free,
    * partition-free, no engine RNG), then `rounds` assign-and-mean
    * passes; an emptied cell keeps its previous centroid. Random-ish init
    * + few iterations is deliberate: the quantizer only needs a roughly
    * balanced partition of the space (recall comes from nprobe, bounded
    * in ExtSpec), not converged centroids.
    *
    * Because every step is plain relational algebra on a seeded md5
    * init, the whole fit REPLAYS IN SQL as `rounds` unrolled CTEs — the
    * t36/t39 GD-loop treatment — which is what converts the IVF gate
    * from rows-only to hash-checked. `deterministic = true` is the
    * oracle opt-in (the pageRank/classifier pattern): per-(cell, dim)
    * sums fold a SORTED collect_list so the IEEE order is engine- and
    * partitioning-exact; the default plain-sum path is the 100 TB shape
    * (per-round cost: one dim-exploded shuffle, ≤ nlist×dim aggregate
    * rows, centroid state = nlist×dim driver doubles). Shared by
    * [[ivfTopK]], [[semanticDedup]] and the persisted [[VectorIndex]]. */
  private[ext] def fitCoarseCentroids(feat: DataFrame, nlist: Int, seed: Long,
                                      deterministic: Boolean = false,
                                      rounds: Int = 4): Array[Array[Double]] = {
    val init = feat
      .withColumn("__h", md5(concat_ws(":", lit(seed.toString), col("n_id").cast("string"))))
      .orderBy(col("__h"), col("n_id")).limit(nlist)
      .select("n_vec").collect().map(_.getSeq[Double](0).toArray)
    require(init.nonEmpty, "fitCoarseCentroids needs a non-empty corpus")
    // NOT spread across the pool, deliberately (measured r16): the
    // m-gate repartition treatment was A/B'd here — repartitioning the
    // slim fit input to defaultParallelism before each round's
    // assign-and-mean pass took e4 from 13 single-task jobs / 3.6 s
    // summed task time to 145 tasks / 60 s: the higher-order
    // nearest-cell expression pays a large PER-TASK interpretation
    // setup, so fanning tiny fit inputs out multiplies fixed cost
    // without reducing the (already sub-second) compute. At cluster
    // scale a real corpus scan arrives with partitions ≥ cores and the
    // rounds parallelize on their own — no repartition needed there
    // either.
    var cents = init
    for (_ <- 1 to rounds) {
      val assigned = feat.withColumn("cell",
        element_at(nearestCells(col("n_vec"), cents, 1), 1))
      val dims = assigned.select(col("cell"), col("n_id"),
        posexplode(col("n_vec")).as(Seq("pos", "x")))
      val sumAgg =
        if (deterministic)
          aggregate(array_sort(collect_list(struct(col("n_id"), col("x").as("t")))),
            lit(0.0), (a, s) => a + s.getField("t"))
        else sum(col("x"))
      val rows = dims.groupBy("cell", "pos")
        .agg(sumAgg.as("s"), count(lit(1)).as("n"))
        .collect() // bounded: <= nlist × dim rows of driver state
      val next = cents.map(_.clone())
      rows.foreach { r =>
        next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) =
          r.getAs[Double]("s") / r.getAs[Long]("n")
      }
      cents = next
    }
    cents
  }

  /** Squared euclidean distance to one broadcast-literal centroid. */
  private[ext] def sqDist(vec: Column, centroid: Array[Double]): Column =
    aggregate(zip_with(vec, typedlit(centroid.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** The `n` nearest centroid cell ids for `vec`, as a pure expression
    * (broadcast literal centroids; no model UDF in the hot path).
    *
    * Shape matters here (guide §4): the old form unrolled one
    * `struct(sqDist(vec, cᵢ), i)` subtree per centroid — nlist × dim
    * expression nodes, an interpreted-mode tree whose PER-TASK
    * instantiation cost (~0.2–0.4 s measured) dwarfed the per-row math
    * and punished any attempt to parallelize the fit. This form loops
    * over ONE 2-D literal with higher-order functions — a constant-size
    * tree whatever nlist/dim — computing the identical distances
    * (same zip_with/aggregate, same IEEE order: lit(0.0) seed, in-array
    * order) and the identical (d, cell) struct sort with the same cell
    * tiebreak, so results are bit-equal and the oracle replay is
    * untouched. */
  private[ext] def nearestCells(vec: Column, centroids: Array[Array[Double]],
                                n: Int): Column = {
    val cents = typedlit(centroids.map(_.toSeq).toSeq)
    val ranked = array_sort(zip_with(cents,
      sequence(lit(0), lit(centroids.length - 1)),
      (c, i) => struct(
        aggregate(zip_with(vec, c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("d"),
        i.as("cell"))))
    slice(transform(ranked, s => s.getField("cell")), 1, n)
  }

  /** IVF (inverted-file) ANN: a coarse k-means quantizer (MLlib, fixed
    * seed) partitions the corpus into `nlist` cells; each query probes the
    * `nprobe` nearest centroids and ranks exactly inside them. The corpus
    * assignment is a one-off O(N·nlist) map stage; per-query work drops to
    * ~nprobe·N/nlist. Centroids are tiny and broadcast. Session-transient;
    * [[VectorIndex]] is the persisted build-once/load/grow variant. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int = 5, nlist: Int = 16, nprobe: Int = 4,
              seed: Long = 42L, deterministic: Boolean = false): DataFrame = {
    // derived from the shared cached corpus; persisted itself because
    // k-means is iterative (each iteration re-reads its input)
    val feat = graft.util.Caches.cached(corpusFrame(corpus, idCol, vecCol))
    val centroids = fitCoarseCentroids(feat, nlist, seed, deterministic)
    def cellsFor(vec: Column, n: Int): Column = nearestCells(vec, centroids, n)

    val c = feat.withColumn("cell", element_at(cellsFor(col("n_vec"), 1), 1))
      .select("n_id", "n_vec", "n_norm", "cell")
    // explode_outer + isNotNull (not plain explode): explode's implicit
    // `size(...) > 0` filter would be pushed down and inline the full
    // centroid-distance expression as an interpreted per-row filter
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("cell", explode_outer(cellsFor(col("q_vec"), nprobe)))
      .filter(col("cell").isNotNull)
      .withColumn("q_norm", norm(col("q_vec")))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos_sim",
        dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cos_sim")
  }

  /** Product-quantization ANN (SIFT-style PQ with asymmetric distance and
    * exact re-rank): each vector splits into `m` subvectors; per subspace a
    * small k-means codebook (`ksub` centroids, the seeded Lloyd fit of
    * [[fitCoarseCentroids]] at `seed + j`) encodes
    * the corpus as `m` small ints — at 100 TB this is THE memory lever
    * (d×8 bytes/vector → m codes; dim=64, m=8, ksub=16 is 128:1 on the
    * scored representation). Scoring never touches corpus vectors:
    * approx cosine = Σ_j q_subⱼ·codebook[j][codeⱼ] over the code-
    * reconstructed norm, all as broadcast-literal expressions; the top
    * `rerank` candidates per query re-rank EXACTLY against true vectors
    * (standard PQ practice — recall bounded in ExtSpec vs brute force).
    * One 1-row driver probe reads the dimension; everything else is
    * expression-only over the cached corpus/code frames. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int = 5, m: Int = 8, ksub: Int = 16,
             rerank: Int = 32, seed: Long = 42L,
             deterministic: Boolean = false): DataFrame = {
    val c0 = corpusFrame(corpus, idCol, vecCol)
    val dim = c0.select(size(col("n_vec"))).head().getInt(0) // metadata probe
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m

    // the m subspace fits (the seeded Lloyd loop of fitCoarseCentroids,
    // seed + j per subspace — SQL-replayable, which is what oracles the
    // e5 gate) are independent — submit them CONCURRENTLY so Spark
    // schedules the small per-round jobs across the executor pool
    // instead of paying m sequential job latencies
    val codebooks: Array[Array[Array[Double]]] = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fits = (0 until m).map { j => Future {
        val sub = c0.select(col("n_id"),
          slice(col("n_vec"), j * dsub + 1, dsub).as("n_vec"))
        fitCoarseCentroids(sub, ksub, seed + j, deterministic)
      } }
      Await.result(Future.sequence(fits), Duration(10, "min")).toArray
    }
    val normTab: Array[Array[Double]] = codebooks.map(_.map(cb => cb.map(x => x * x).sum))

    // encode: codeⱼ = argmin over the subspace codebook (expression-only).
    // Loops over ONE 2-D codebook literal instead of unrolling ksub
    // struct subtrees per subspace (×m subspaces in the codes projection
    // = m·ksub·dsub expression nodes) — the nearestCells treatment
    // (guide §4): identical distances, identical (d, code) sort and
    // tiebreak, constant-size tree.
    def codeFor(vec: Column, j: Int): Column = {
      val sub = slice(vec, j * dsub + 1, dsub)
      val cb = typedlit(codebooks(j).map(_.toSeq).toSeq)
      val ranked = array_sort(zip_with(cb,
        sequence(lit(0), lit(codebooks(j).length - 1)),
        (c, ci) => struct(
          aggregate(zip_with(sub, c, (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x).as("d"),
          ci.as("code"))))
      element_at(transform(ranked, s => s.getField("code")), 1)
    }
    // the compressed index: (n_id, m codes) — this is ALL the scoring reads
    val codes = graft.util.Caches.cached(c0.select(col("n_id"),
      array((0 until m).map(j => codeFor(col("n_vec"), j)): _*).as("codes")))

    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("q_norm", norm(col("q_vec")))
    def adcTerm(j: Int): Column = {
      val qsub = slice(col("q_vec"), j * dsub + 1, dsub)
      val chosen = element_at(typedlit(codebooks(j).map(_.toSeq).toSeq),
        element_at(col("codes"), j + 1) + 1)
      aggregate(zip_with(qsub, chosen, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    }
    def normTerm(j: Int): Column =
      element_at(typedlit(normTab(j).toSeq), element_at(col("codes"), j + 1) + 1)

    val approx = codes.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("approx_sim",
        (0 until m).map(adcTerm).reduce(_ + _) /
          (col("q_norm") * sqrt((0 until m).map(normTerm).reduce(_ + _))))
    val wA = Window.partitionBy("q_id").orderBy(col("approx_sim").desc, col("n_id").asc)
    val cands = approx.withColumn("rnk", row_number().over(wA))
      .filter(col("rnk") <= rerank).select("q_id", "n_id")

    // exact re-rank of the shortlisted candidates against true vectors
    val exact = cands.join(c0, Seq("n_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cos_sim",
        dot(col("q_vec"), col("n_vec")) / (col("q_norm") * col("n_norm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id").asc)
    exact.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cos_sim")
  }

  /** Embedding near-dup pairs (id_a < id_b, cosine >= threshold) — the
    * DEFAULT path: an EXACT distributed block-nested-loop ("chunked
    * all-pairs") join. Vectors hash into `chunks` blocks; the tiny
    * (chunks·(chunks+1)/2)-row block-pair relation is broadcast to
    * replicate each vector to its block-pairs, and the (ca, cb) equi-join
    * evaluates each block-pair's cross product in its own task with the
    * codegen'd native dot product.
    *
    * Why not LSH here: a threshold query must return pairs sitting AT the
    * threshold, where sign-LSH recall is 1-(1-(1-θ/π)^bits)^tables < 1 no
    * matter the parameters (measured on the fixtures: the planted pairs
    * lie at cosine 0.50–0.60 and every reasonable (bits, tables) drops
    * some). Exact all-pairs is inherently O(N²) compute, but this shape
    * distributes it evenly (parallelism chunks²/2, per-task memory N/chunks
    * vectors, shuffle O(N·chunks) rows), touches the driver with nothing,
    * and never materializes a broadcast of the corpus — scale `chunks`
    * with N to hold per-task memory constant. For the high-similarity
    * near-dup regime where missing a boundary pair is acceptable,
    * [[nearDupPairsLsh]] cuts the quadratic term by 2^bits. */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, chunks: Int = 32): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpusFrame(corpus, idCol, vecCol)
      .withColumn("chunk", pmod(xxhash64(col("n_id")), lit(chunks)).cast("int"))
    val chunkPairs = broadcast(
      (for { i <- 0 until chunks; j <- i until chunks } yield (i, j)).toDF("ca", "cb"))
    val left = c.join(chunkPairs, col("chunk") === col("ca"))
      .select(col("ca"), col("cb"), col("n_id").as("id_l"),
        col("n_vec").as("vl"), col("n_norm").as("nl"))
    val right = c.join(chunkPairs, col("chunk") === col("cb"))
      .select(col("ca"), col("cb"), col("n_id").as("id_r"),
        col("n_vec").as("vr"), col("n_norm").as("nr"))
    left.join(right, Seq("ca", "cb"))
      // cross-chunk pairs appear exactly once (min-chunk side left);
      // same-chunk pairs appear in both orders -> keep one
      .filter(col("ca") < col("cb") || col("id_l") < col("id_r"))
      // x·y is bitwise symmetric (IEEE multiply commutes), so emitting the
      // canonical id order below cannot change cos_sim vs the expression twin
      .withColumn("cos_sim", dot(col("vl"), col("vr")) / (col("nl") * col("nr")))
      .filter(col("cos_sim") >= threshold)
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"), col("cos_sim"))
  }

  /** Approximate near-dup pairs for the high-similarity regime: multi-table
    * sign-LSH bucketing followed by exact cosine verification of
    * bucket-mates — [[TextDedup.minhashDupPairs]]'s candidates-then-verify
    * architecture for embeddings. Candidate count is bounded by
    * `tables · N²/2^bits` (never all pairs), the id-pair dedup shuffles
    * ONLY (id_a, id_b), and vectors re-join from the shared cached corpus.
    * Precision is exact (every emitted pair is verified with the same IEEE
    * expression order as [[nearDupPairsExpr]]); recall is the sign-LSH
    * amplification 1-(1-(1-θ/π)^bits)^tables — ~1 for genuinely near-dup
    * pairs (cosine ≳ 0.9), deliberately below 1 at a loose threshold
    * boundary. Use [[nearDupPairs]] when exactness at the threshold is
    * required. */
  def nearDupPairsLsh(corpus: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, bits: Int = 8, tables: Int = 16,
                      dim: Int = 64): DataFrame = {
    val c = corpusFrame(corpus, idCol, vecCol)
    val buckets = array((0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        lshBucket(col("n_vec"), hyperplanes(dim, bits, seed = 42L + t)).as("bucket"))
    }: _*)
    val banded = c.select(col("n_id"), explode(buckets).as("b"))
      .select(col("n_id"), col("b.tbl"), col("b.bucket"))
    val cand = banded.select(col("n_id").as("id_a"), col("tbl"), col("bucket"))
      .join(banded.select(col("n_id").as("id_b"), col("tbl"), col("bucket")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val a = c.select(col("n_id").as("id_a"), col("n_vec").as("va"), col("n_norm").as("na"))
    val b = c.select(col("n_id").as("id_b"), col("n_vec").as("vb"), col("n_norm").as("nb"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("cos_sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Cluster-BALANCED sampling — diversity-aware curation (the sampling
    * half of the SemDeDup idea): partition the embedding space into
    * sign-bit LSH cells (deterministic seeded hyperplanes — no k-means
    * fit, no iteration) and keep exactly `perCell` vectors per populated
    * cell, ranked by the standard md5 order. A uniform sample keeps the
    * corpus's density skew — dense regions (boilerplate clusters) keep
    * dominating; equal-per-cell flattens that, which is the point of
    * diversity sampling for eval sets and seed corpora. Scale shape:
    * the cell id is a pure map expression, the quota reuses
    * [[graft.operators.Sampling.exactStratifiedSample]]'s skew-safe
    * hash-threshold prefilter + per-cell window — no pairwise anything,
    * no centroid fit. Bucket ids are engine-specific (hyperplane RNG) →
    * rows-only gate; quota/determinism/flattening are spec-asserted. */
  def clusterBalancedSample(corpus: DataFrame, idCol: String, vecCol: String,
                            bits: Int = 4, perCell: Int = 10,
                            dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val cells = corpus.withColumn("__cell", lshBucket(asDouble(col(vecCol)), planes))
    graft.operators.Sampling
      .exactStratifiedSample(cells, col(idCol), "__cell", perCell)
      .withColumnRenamed("__cell", "cell")
  }

  /** JOHNSON-LINDENSTRAUSS random projection: `outDim` seeded Gaussian
    * directions (the [[hyperplanes]] generator), `y_p = (v·h_p)/√outDim`
    * — with unit-variance entries this preserves expected squared norms
    * (`E‖y‖² = ‖x‖²`) and, by the JL lemma, pairwise distances within
    * `1±ε` for `outDim = O(log n / ε²)`. The cheap dimensionality cut
    * in front of brute-force scoring: an 8× narrower vector makes the
    * candidate scan 8× cheaper, with the exact re-rank on the original
    * vectors (the PQ pattern). Pure codegen projection — `outDim`
    * native sequential-fold dot products per row, no shuffle, matrix
    * rides the plan as literals (the e11 hyperplane treatment, so the
    * oracle replays every coordinate). Returns `(idCol, proj)` with
    * `proj` an `outDim` double array. */
  def randomProjection(corpus: DataFrame, idCol: String, vecCol: String,
                       outDim: Int = 8, dim: Int = 64,
                       seed: Long = 42L): DataFrame = {
    require(outDim >= 1, s"outDim must be >= 1: $outDim")
    val planes = hyperplanes(dim, outDim, seed)
    val s = math.sqrt(outDim.toDouble)
    corpus.select(col(idCol), array(planes.toIndexedSeq.map(h =>
      dot(asDouble(col(vecCol)), typedlit(h.toSeq)) / lit(s)): _*).as("proj"))
  }

  /** Incremental EMBEDDING ingest screen: the e-family analogue of
    * [[TextDedup]]'s d14/d15 text screens. Returns the batch ids with NO
    * stored vector at cosine >= `threshold` — the rows an ingest step may
    * accept into the corpus.
    *
    * Scale shape: the stored corpus is scanned ONCE and never shuffled;
    * the (small, per-step) batch rides as the broadcast side of a
    * nested-loop join whose condition is the codegen'd dot product, so
    * candidate work is O(N·B) with B bounded by the ingest batch size —
    * the same batch-pays/corpus-rests economics as every d1x screen. The
    * id-distinct and anti join shuffle only batch ids. Exact by
    * construction (every stored×batch pair is scored); swap the corpus
    * side for [[VectorIndex]] probed cells when batch latency matters more
    * than boundary exactness. Within-batch near-dups are a separate policy
    * ([[IngestPipeline]]'s AnyPairDrops/Greedy); this screen is
    * batch-vs-stored only, matching its text siblings. */
  def embedIngestScreen(stored: DataFrame, batch: DataFrame, idCol: String,
                        vecCol: String, threshold: Double): DataFrame = {
    val c = corpusFrame(stored, idCol, vecCol)
    val b = batch.select(col(idCol).as("b_id"), asDouble(col(vecCol)).as("b_vec"))
      .withColumn("b_norm", norm(col("b_vec")))
    val dropped = c.join(broadcast(b),
        dot(col("n_vec"), col("b_vec")) / (col("n_norm") * col("b_norm")) >= threshold)
      .select(col("b_id")).distinct()
    b.join(dropped, Seq("b_id"), "left_anti").select(col("b_id").as(idCol))
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with a k-means coarse
    * quantizer, then within each cluster drop every document that has a
    * LOWER-id cluster-mate at cosine >= `threshold` — one survivor per
    * semantic duplicate group, found without any global pairwise pass.
    * Returns the surviving (id, cluster) rows.
    *
    * Scale shape: the pairwise step is per-cluster (cost Σ n_c², bounded
    * by scaling `nlist` with N to hold cluster sizes roughly constant —
    * the paper runs 50k clusters for LAION), expressed as ONE self-join
    * on the cluster id so each cluster's candidate block evaluates in its
    * own tasks with the codegen'd dot product. The centroids ride as
    * broadcast literals exactly like [[ivfTopK]]'s probe expressions; the
    * corpus never collects to the driver. Cross-cluster near-dups are the
    * documented approximation (that is SemDeDup's trade); `nlist = 1`
    * degrades to the exact policy, which ExtSpec pins against
    * [[nearDupPairs]].
    *
    * Drop policy nuance (as in the paper's "keep one per group"): a chain
    * i < j < k with cos(i,j) and cos(j,k) above threshold but cos(i,k)
    * below drops BOTH j and k — membership is "has ANY lower-id mate
    * within threshold", not graph reachability; use
    * [[TextDedup.dedupSurvivors]] over [[nearDupPairs]] when
    * connected-component semantics are wanted. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, nlist: Int = 16,
                    seed: Long = 42L, deterministic: Boolean = false): DataFrame = {
    val feat = graft.util.Caches.cached(corpusFrame(corpus, idCol, vecCol))
    val assigned =
      if (nlist <= 1) feat.withColumn("cell", lit(0))
      else {
        // same rough-quantizer economics as ivfTopK: seeded init, few
        // iterations — the partition only has to be balanced, dedup
        // correctness within a cell never depends on centroid quality
        val centroids = fitCoarseCentroids(feat, nlist, seed, deterministic)
        feat.withColumn("cell",
          element_at(nearestCells(col("n_vec"), centroids, 1), 1))
      }
    val cells = assigned.select(col("n_id"), col("n_vec"), col("n_norm"), col("cell"))
    val lower = cells.select(col("cell"), col("n_id").as("id_l"),
      col("n_vec").as("vl"), col("n_norm").as("nl"))
    val dropped = cells.join(lower, Seq("cell"))
      .filter(col("id_l") < col("n_id"))
      .filter(dot(col("vl"), col("n_vec")) / (col("nl") * col("n_norm")) >= threshold)
      .select(col("n_id")).distinct()
    cells.join(dropped, Seq("n_id"), "left_anti")
      .select(col("n_id").as(idCol), col("cell"))
  }

  /** Expression-only formulation (reference semantics; kept for plan-level
    * composability and as the oracle twin of [[nearDupPairsLocal]]). */
  def nearDupPairsExpr(corpus: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
      .withColumn("na", norm(col("va")))
    val b = corpus.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
      .withColumn("nb", norm(col("vb")))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** All-pairs cosine near-dups via `mapPartitions` over a broadcast corpus
    * — an explicitly SMALL-N exact verifier, not the default path: it
    * `collect()`s the corpus to the driver, so it caps at driver/executor
    * memory (use [[nearDupPairs]] everywhere else). Where it fits, the
    * O(N²/2) inner loop on primitive double arrays is ~20x faster than the
    * HOF-expression cross join at N=2000, and guarantees 100% recall at
    * any threshold (which LSH, by construction, does not at the boundary).
    * Summation is left-to-right like the expression fold, so results are
    * bit-identical to [[nearDupPairsExpr]]. */
  def nearDupPairsLocal(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = corpus.select(col(idCol).cast("long"), asDouble(col(vecCol)))
      .as[(Long, Seq[Double])]
    val all = rows.collect().sortBy(_._1).map { case (id, v) => (id, v.toArray) }
    def dotArr(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }
    val norms = all.map { case (_, v) => math.sqrt(dotArr(v, v)) }
    val bc = spark.sparkContext.broadcast((all, norms))
    val idx = all.map(_._1).zipWithIndex.toMap
    val bcIdx = spark.sparkContext.broadcast(idx)
    rows.mapPartitions { it =>
      val (corpusArr, ns) = bc.value
      val index = bcIdx.value
      it.flatMap { case (idA, vSeq) =>
        val va = vSeq.toArray
        val i = index(idA)
        val na = ns(i)
        // only pairs with id_a < id_b; corpus sorted by id
        Iterator.range(i + 1, corpusArr.length).flatMap { j =>
          val (idB, vb) = corpusArr(j)
          val cs = dotArr(va, vb) / (na * ns(j))
          if (cs >= threshold) Some((idA, idB, cs)) else None
        }
      }
    }.toDF("id_a", "id_b", "cos_sim")
  }
}
