package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.CorpusPipeline.StageCount

/** Composed INCREMENTAL corpus ingest — the batch-arrival counterpart of
  * [[CorpusPipeline]] (which curates a corpus once, from scratch): a new
  * batch of documents screens against the settled corpus's INDEXES, the
  * survivors are cut against what the corpus already stores, and the
  * indexes grow by the accepted delta. The settled corpus is never
  * re-deduplicated, re-shingled, or re-shuffled — each screen touches an
  * index scan plus batch-sized frames, so a daily batch costs O(batch),
  * not O(corpus). Reference analogue: the watermark-incremental loads
  * (bronze_incremental_load.ipynb:cell 17, Silver_incremental_load
  * .ipynb:cell 8), re-expressed for corpus-scale content dedup.
  *
  * Screens, in production order (each the already-gated operator):
  *
  *   1. exact screen    — bloom-sketch prefilter + confirm against the
  *                        corpus fingerprint index ([[BloomScreen]], d18);
  *                        within-batch repeats keep the min id
  *                        ([[TextDedup.incrementalExactIdsFps]], d14)
  *   2. near screen     — batch ⋈ corpus shingle-postings index
  *                        ([[TextDedup.nearDupPairsAgainstIndex]], d15)
  *   3. within-batch    — near-dup pairs among the batch itself, resolved
  *                        by the configured [[BatchPolicy]] (d16's
  *                        any-pair rule, or the order-consistent greedy
  *                        rule whose sequential consistency IngestSpec
  *                        proves)
  *   4. content cut     — accepted docs lose every span/chunk the corpus
  *                        already stores ([[TextDedup.cutSpansAgainstIndex]]
  *                        d17 / [[TextDedup.cutChunksAgainstIndex]] d21),
  *                        and too-short remnants drop
  *   5. index growth    — the state DELTA for the accepted docs: stored
  *                        text, fingerprints, shingle postings, window
  *                        hashes, chunk fingerprints. All five are
  *                        append-only (each doc id lives in exactly one
  *                        delta) so state grows without rewrites.
  *
  * [[graft.run.RunIngest]] wraps this in a restartable, idempotent
  * file-backed driver (versioned deltas + commit log).
  */
object IngestPipeline {

  /** Within-batch near-dup resolution policy. */
  sealed trait BatchPolicy
  /** The [[TextDedup.incrementalSurvivors]] (d16) rule: the greater side
    * of EVERY within-batch pair drops, even when the lower side was
    * itself dropped by a corpus screen. Cheapest (one anti join), and the
    * rule the d16 oracle replays — but NOT sequentially consistent:
    * splitting a batch can change the outcome on chains through dropped
    * documents. */
  case object AnyPairDrops extends BatchPolicy
  /** Arrival-order greedy rule ([[TextDedup.greedySurvivors]]): a doc
    * drops only for a SURVIVING lower-id neighbor — byte-identical
    * results whether a batch arrives whole or split (IngestSpec). */
  case object Greedy extends BatchPolicy

  /** What the accepted documents lose against stored corpus content. */
  sealed trait CutMode
  case object SpanCut extends CutMode
  case object ChunkCut extends CutMode
  case object NoCut extends CutMode

  /** The persisted corpus state, as frames. `docs` is the stored corpus
    * (id, text); every index derives from the STORED text, so the state
    * is self-consistent and rebuildable from `docs` alone:
    *  - `fps`     one `fingerprint` per doc (exact screen);
    *  - `posts`   shingle postings (id, sz, s) (near screen);
    *  - `windows` distinct span-window hashes `h` (span cut; duplicates
    *              across deltas are tolerated — membership semi join);
    *  - `chunks`  distinct CDC chunk fingerprints `fp` (chunk cut). */
  final case class IngestState(docs: DataFrame, fps: DataFrame,
                               posts: DataFrame, windows: DataFrame,
                               chunks: DataFrame)

  /** Per-batch outcome: `delta` holds ONLY the accepted documents' state
    * rows (append to the persisted state), `decisions` one row per batch
    * doc with the per-screen verdicts, `census` the stage counts. */
  final case class IngestResult(delta: IngestState, decisions: DataFrame,
                                census: Seq[StageCount])

  /** Eager materialization barrier for stage frames: RELIABLE
    * `checkpoint` into `checkpointDir` when given (executor-loss-safe —
    * the cluster path, mirroring [[TextStats.bpeTrain]]'s option),
    * `localCheckpoint` otherwise (fine single-node / when
    * [[graft.run.RunIngest]]'s file-backed deltas already bound the
    * blast radius to one batch re-run). */
  private def ckpt(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        // lazy (r16): the frame is a truncated leaf either way; its
        // materialization folds into the first consumer's job (the
        // screen-census aggregate, the stored count, an index build)
        // instead of a dedicated barrier job per ckpt
        df.localCheckpoint(false)
    }

  /** Index a corpus as the initial state (the "settle everything you
    * already have" step — screening among these docs is
    * [[CorpusPipeline]]'s job, deliberately not repeated here). */
  def bootstrap(corpus: DataFrame, idCol: String = "doc_id",
                textCol: String = "text", shingleK: Int = 3,
                spanK: Int = 8,
                boundaryHex: Seq[String] = Seq("0", "1")): IngestState =
    IngestState(
      docs = corpus.select(col(idCol), col(textCol)),
      fps = corpus.select(col(idCol),
        TextStats.fingerprintMd5(col(textCol)).as("fingerprint")),
      posts = TextDedup.shinglePosts(corpus, idCol, textCol, shingleK),
      windows = TextDedup.windowIndex(corpus, idCol, textCol, spanK),
      chunks = TextDedup.chunkIndex(corpus, idCol, textCol, boundaryHex))

  /** Screen a batch against the state WITHOUT mutating anything: one row
    * per batch doc — `(id, fingerprint, batch_exact, corpus_exact,
    * corpus_near, batch_near, accepted)`. Under [[AnyPairDrops]] the
    * accepted set is exactly [[TextDedup.incrementalSurvivors]] (the d16
    * gate asserts this against the DuckDB replay).
    *
    * @param sketch reuse a maintained bloom blob for the exact prefilter;
    *   None folds one from `state.fps` (still exact — the sketch only
    *   decides which rows touch the confirm join). */
  def screen(state: IngestState, batch: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             shingleK: Int = 3, threshold: Double = 0.5,
             policy: BatchPolicy = Greedy,
             sketch: Option[Array[Byte]] = None,
             checkpointDir: Option[String] = None): DataFrame = {
    val fpsOnly = state.fps.select(col("fingerprint"))
    val blob = sketch.orElse(BloomScreen.fpSketch(fpsOnly.toDF("fp")))
    // exact verdicts: corpus membership (bloom prefilter + confirm) and
    // within-batch first-occurrence
    val verdictExact = BloomScreen
      .screenExactFps(fpsOnly, blob, batch, idCol, textCol)
      .withColumnRenamed("is_corpus_dup", "corpus_exact")
    val fp = batch.select(col(idCol),
      TextStats.fingerprintMd5(col(textCol)).as("fingerprint"))
    val batchFirst = fp.groupBy("fingerprint").agg(min(col(idCol)).as(idCol))
      .select(col(idCol)).withColumn("__first", lit(true))
    // near verdict vs the settled corpus
    val corpusNear = TextDedup.nearDupPairsAgainstIndex(state.posts, batch,
        idCol, textCol, shingleK, threshold)
      .select(col("new_id").as(idCol)).distinct()
      .withColumn("__cnear", lit(true))
    val base0 = fp
      .join(verdictExact, Seq(idCol))
      .join(batchFirst, Seq(idCol), "left")
      .join(corpusNear, Seq(idCol), "left")
      .select(col(idCol), col("fingerprint"),
        coalesce(col("__first"), lit(false)).unary_!.as("batch_exact"),
        col("corpus_exact"),
        coalesce(col("__cnear"), lit(false)).as("corpus_near"))
    // base needs an eager barrier only when a second consumer exists:
    // the Greedy policy derives its candidate set from it. Under
    // AnyPairDrops base feeds exactly one downstream join, so a barrier
    // would be a pure extra materialization pass (r15, guide §1.2:
    // fewer sequential actions).
    val base = policy match {
      case Greedy       => ckpt(base0, checkpointDir)
      case AnyPairDrops => base0
    }
    // within-batch near-dup resolution
    val batchNear = policy match {
      case AnyPairDrops =>
        // d16 semantics: pairs computed over the WHOLE batch; the greater
        // side of any pair drops, surviving or not
        TextDedup.ngramJaccardPairs(batch, idCol, textCol, shingleK, threshold)
          .select(greatest(col("id_a"), col("id_b")).as(idCol)).distinct()
      case Greedy =>
        // pairs restricted to candidates the corpus screens let through:
        // a corpus-dropped doc was never accepted, so it cannot kill
        val candidates = base.filter(!col("batch_exact") &&
          !col("corpus_exact") && !col("corpus_near")).select(idCol)
        val pairs = TextDedup.ngramJaccardPairs(
          batch.join(candidates, Seq(idCol), "left_semi"),
          idCol, textCol, shingleK, threshold)
        val survivors = TextDedup.greedySurvivors(candidates, idCol, pairs)
        candidates.join(survivors, Seq(idCol), "left_anti")
    }
    base
      .join(batchNear.withColumn("__bnear", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("fingerprint"), col("batch_exact"),
        col("corpus_exact"), col("corpus_near"),
        coalesce(col("__bnear"), lit(false)).as("batch_near"))
      .withColumn("accepted", !col("batch_exact") && !col("corpus_exact") &&
        !col("corpus_near") && !col("batch_near"))
  }

  /** One full ingest step: screen, cut, and produce the accepted DELTA.
    * Pure over frames — no files are touched; [[graft.run.RunIngest]]
    * owns persistence. Every returned delta frame is an eager
    * checkpoint (they are batch-sized and each feeds multiple
    * consumers), so callers can count/write them without replaying the
    * screen chain; pass `checkpointDir` for the reliable
    * (executor-loss-safe) variant on a cluster. */
  def ingest(state: IngestState, batch: DataFrame,
             idCol: String = "doc_id", textCol: String = "text",
             shingleK: Int = 3, threshold: Double = 0.5,
             spanK: Int = 8, minTokensAfterCut: Int = 5,
             boundaryHex: Seq[String] = Seq("0", "1"),
             policy: BatchPolicy = Greedy, cutMode: CutMode = SpanCut,
             sketch: Option[Array[Byte]] = None,
             checkpointDir: Option[String] = None): IngestResult = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val counts = Seq.newBuilder[StageCount]
    // the batch census is independent of every other job this step runs
    // — overlap it with the screen instead of paying it as the step's
    // first sequential action (r16, guide §2.6; VERDICT r15 #4)
    val fBatchCnt = Future(batch.count())
    val decisions = ckpt(screen(state, batch, idCol, textCol, shingleK,
      threshold, policy, sketch, checkpointDir), checkpointDir)
    // all three screen censuses in ONE pass over the materialized
    // decisions frame (r15, guide §1.2/§2.3: aggregate once, not three
    // filtered counts = three sequential jobs). Conditional sums are
    // exactly the old filters; coalesce guards the empty-batch NULL sum.
    // The aggregate reads the materialized checkpoint and nothing the
    // cut/index chain produces — run it concurrently with building and
    // materializing that chain (r16, guide §2.6), await before returning.
    val fScreenCnts = Future(decisions.agg(
      coalesce(sum(when(!col("batch_exact") && !col("corpus_exact"), 1L)
        .otherwise(0L)), lit(0L)).as("exact_ok"),
      coalesce(sum(when(!col("batch_exact") && !col("corpus_exact") &&
        !col("corpus_near"), 1L).otherwise(0L)), lit(0L)).as("near_ok"),
      coalesce(sum(when(col("accepted"), 1L).otherwise(0L)), lit(0L))
        .as("accepted")).head())
    val acceptedIds = decisions.filter(col("accepted")).select(idCol)
    val accepted = batch.select(col(idCol), col(textCol))
      .join(acceptedIds, Seq(idCol), "left_semi")
    // cut what the corpus already stores out of the accepted copies,
    // then drop remnants too short to train on (CorpusPipeline's rule)
    val cut = cutMode match {
      case NoCut => accepted
      case SpanCut =>
        TextDedup.cutSpansAgainstIndex(state.windows, accepted,
            idCol, textCol, spanK)
          .withColumnRenamed("text_dedup", textCol).drop("n_tokens_removed")
      case ChunkCut =>
        TextDedup.cutChunksAgainstIndex(state.chunks, accepted,
            idCol, textCol, boundaryHex)
          .withColumnRenamed("text_dedup", textCol).drop("n_tokens_removed")
    }
    val stored = ckpt(cut
      .withColumn("__nt", size(TextStats.tokens(col(textCol))))
      .filter(col(textCol) =!= "" && col("__nt") >= minTokensAfterCut)
      .drop("__nt"), checkpointDir)
    // the four index deltas all derive from the just-materialized
    // `stored` frame and are mutually independent — materialize them
    // CONCURRENTLY (guide §2.6: overlap independent jobs) instead of as
    // four sequential barrier jobs; the stored census count overlaps too.
    val fFps = Future(ckpt(stored.select(col(idCol),
      TextStats.fingerprintMd5(col(textCol)).as("fingerprint")), checkpointDir))
    val fPosts = Future(ckpt(
      TextDedup.shinglePosts(stored, idCol, textCol, shingleK), checkpointDir))
    val fWindows = Future(ckpt(
      TextDedup.windowIndex(stored, idCol, textCol, spanK), checkpointDir))
    val fChunks = Future(ckpt(
      TextDedup.chunkIndex(stored, idCol, textCol, boundaryHex), checkpointDir))
    val storedCnt = stored.count()
    // census order is part of the result contract — counts land in stage
    // order however the overlapped jobs finished
    counts += StageCount("batch", Await.result(fBatchCnt, Duration.Inf))
    val screenCnts = Await.result(fScreenCnts, Duration.Inf)
    counts += StageCount("exact_ok", screenCnts.getLong(0))
    counts += StageCount("near_ok", screenCnts.getLong(1))
    counts += StageCount("accepted", screenCnts.getLong(2))
    counts += StageCount("stored", storedCnt)
    val delta = IngestState(
      docs = stored,
      fps = Await.result(fFps, Duration.Inf),
      posts = Await.result(fPosts, Duration.Inf),
      windows = Await.result(fWindows, Duration.Inf),
      chunks = Await.result(fChunks, Duration.Inf))
    IngestResult(delta, decisions, counts.result())
  }

  /** Append a delta to a state (frame-level union — the in-memory twin of
    * the file-backed append [[graft.run.RunIngest]] performs). */
  def grow(state: IngestState, delta: IngestState): IngestState =
    IngestState(
      docs = state.docs.unionByName(delta.docs),
      fps = state.fps.unionByName(delta.fps),
      posts = state.posts.unionByName(delta.posts),
      windows = state.windows.unionByName(delta.windows),
      chunks = state.chunks.unionByName(delta.chunks))
}
