package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the LLM-side counterpart of the
  * medallion `run.Pipeline`, composing the north-star operators in the
  * order production pipelines run them (cf. C4 / Gopher / RefinedWeb
  * processing chains):
  *
  *   1. quality gate   — heuristic keep/drop ([[TextStats.qualityFilter]])
  *   2. PII redaction  — typed placeholders ([[TextStats.redact]]), then
  *                        within-doc boilerplate cut ([[TextDedup.cutSelfSpans]])
  *   3. exact dedup    — one copy per identical text ([[TextDedup.exactDedup]])
  *   4. near-dup removal — one representative per cluster
  *                        ([[TextDedup.ngramJaccardPairs]] → [[TextDedup.dedupSurvivors]])
  *   5. span cut       — shared k-token spans removed from the surviving
  *                        copies, then too-short remnants dropped
  *                        ([[TextDedup.cutDupSpans]])
  *   6. contamination  — docs sharing shingles with the benchmark dropped
  *                        ([[TextDedup.contaminatedIds]])
  *   7. packing        — greedy budget bins + assembled text
  *                        ([[TextStats.packedText]])
  *
  * Every stage is the already-gated operator — this object only wires
  * them, so the composition inherits each stage's scale shape: the corpus
  * is filtered by broadcast-able id sets (anti joins against the SMALL
  * dropped side), never re-shuffled wholesale, and the one heavy index
  * (the shingle frame) is shared through [[graft.util.Caches]].
  *
  * Returns the packed-bin frame plus a per-stage census for lineage
  * reporting (docs surviving each stage, in order).
  */
object CorpusPipeline {

  final case class StageCount(stage: String, docs: Long)

  /** @param contamK contamination n-gram size, deliberately SEPARATE from
    *   `shingleK`: near-dup Jaccard wants short shingles (recall), but
    *   decontamination on word trigrams would drop a corpus doc for ONE
    *   shared 3-gram with any benchmark doc — massive over-dropping on
    *   realistic corpora. Standard practice screens on 8–13-gram overlap
    *   (Lee et al. 2021; GPT-3 appendix C uses 13-grams), so the default
    *   tracks `spanK`'s verbatim-span scale, not the Jaccard shingle.
    * @param packShardCol INPUT column to shard the packing stage by
    *   (date, source, …) — re-acquired from `docs` by a slim (id, shard)
    *   join, since the curated frame carries only id+text by then. When
    *   None a `pack_shard` hash bucket (`pmod(xxhash64(id), shards)`) is
    *   DERIVED — packing is never allowed to fall into the global-window
    *   branch whose single task would own the whole corpus sort. Bins
    *   are (shard, bin) pairs.
    * @param packShards UPPER BOUND on the derived shard count (ignored
    *   when `packShardCol` is given). The actual count is
    *   `min(packShards, survivors/64)` (≥1), read off the final census —
    *   small corpora collapse to few shards so bins still pack full;
    *   at scale the 1024 cap keeps every shard a small fraction of the
    *   corpus. Deriving refuses to overwrite an existing `pack_shard`
    *   column (pass it as `packShardCol` instead).
    * @param sourceCol column of `docs` naming each document's source;
    *   enables the recipe stages below. The curated corpus itself only
    *   carries (id, text) — the source map rides a SLIM (id, source)
    *   join, so document text never enters these shuffles.
    * @param sourceWeights per-source keep fraction ([[graft.operators.Sampling.weightedMix]]):
    *   the deterministic hash gate that turns crawled sources into a
    *   recipe-weighted mix. Applied before the quota.
    * @param sourceQuota keep the N token-richest docs per source via the
    *   bounded-heap [[graft.functions.TopKBy]] aggregate (score
    *   n_tokens DESC, id ASC) — the domain-balancing cut, shipped as at
    *   most N entries per source per partition, never a corpus sort.
    * @param checkpointDir when set, per-stage checkpoints go to this
    *   RELIABLE location (`setCheckpointDir` + `checkpoint`) so stage
    *   frames survive executor loss at cluster scale; default None uses
    *   the cheaper executor-local checkpoint (right for local mode) —
    *   the same policy as [[TextDedup.dupClusters]]. Two Spark-inherent
    *   caveats, shared with dupClusters: `setCheckpointDir` is
    *   context-GLOBAL (last caller wins — use one dir per session), and
    *   reliable checkpoint files are only auto-deleted when
    *   `spark.cleaner.referenceTracking.cleanCheckpoints=true` (enable
    *   it, or use a per-run directory a deployment removes afterwards;
    *   local checkpoints free with their RDDs via the ContextCleaner). */
  def run(docs: DataFrame, benchmark: DataFrame,
          idCol: String = "doc_id", textCol: String = "text",
          shingleK: Int = 3, jaccardThreshold: Double = 0.5,
          spanK: Int = 8, minTokensAfterCut: Int = 5,
          packBudget: Int = 512, contamK: Int = 8,
          packShardCol: Option[String] = None, packShards: Int = 1024,
          sourceCol: Option[String] = None,
          sourceWeights: Option[Map[String, Double]] = None,
          sourceQuota: Option[Int] = None,
          checkpointDir: Option[String] = None): (DataFrame, Seq[StageCount]) = {
    val counts = Seq.newBuilder[StageCount]
    // each censused stage is EAGERLY CHECKPOINTED before its count: every
    // stage feeds both the census action and the next stage (often twice —
    // id-set derivation plus the semi join), so an unmaterialized chain
    // recomputes the whole pipeline prefix per stage, quadratic in stage
    // depth. A persist() is NOT enough here: with AQE the nested
    // InMemoryRelations of an 8-deep cached chain never finalize (the
    // cached partitions stay unmaterialized and every downstream action
    // replays the full lineage — measured 5× on the composed pipeline),
    // while an eager checkpoint both stores the partitions and truncates
    // the plan, exactly the dupClusters round treatment. Same reliability
    // policy too: a checkpointDir makes stage frames survive executor
    // loss at cluster scale; local mode keeps the cheaper local variant.
    // only touch the context-global checkpoint dir when it actually needs
    // to change: a caller that already configured the same (or another)
    // reliable dir for a different component keeps it unless this run's
    // explicit request differs — and a differing overwrite is logged loud
    checkpointDir.foreach { dir =>
      val sc = docs.sparkSession.sparkContext
      // getCheckpointDir returns the QUALIFIED path (file:/x for local /x)
      val same = sc.getCheckpointDir.exists(c =>
        c.stripSuffix("/") == dir.stripSuffix("/") ||
          c.stripPrefix("file:").stripSuffix("/") == dir.stripSuffix("/"))
      if (!same) {
        sc.getCheckpointDir.foreach(prev =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"CorpusPipeline replacing session checkpoint dir $prev with $dir " +
              "(setCheckpointDir is context-global)"))
        sc.setCheckpointDir(dir)
      }
    }
    // LAZY local checkpoints (r16): still a LogicalRDD leaf at
    // construction (the plan-truncation the pipeline needs — see the
    // eager-vs-persist note above, which is about persist()'s
    // UN-truncated plan, not about eagerness), but the materialization
    // job folds into the stage's census count future instead of running
    // as its own barrier job — one job per stage, not two. Reliable-dir
    // branch stays eager.
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(false)
    // Census counts run as FUTURES (guide §2.6; VERDICT r15 #4): each
    // stage's count reads that stage's just-materialized checkpoint and
    // feeds nothing downstream except the returned census (and the
    // derived pack-shard sizing, awaited where needed), so paying it as
    // a sequential job between stages serialized ~8 extra driver
    // round-trips per run. The counts are awaited IN STAGE ORDER at the
    // end, so the returned census is byte-identical.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val pending = Seq.newBuilder[(String, Future[Long])]
    var lastCensusF: Future[Long] = Future.successful(0L)
    def censusOf(stage: String, mat: DataFrame): Unit = {
      lastCensusF = Future(mat.count())
      pending += stage -> lastCensusF
    }
    def census(stage: String, df: DataFrame): DataFrame = {
      val mat = ckpt(df)
      censusOf(stage, mat)
      mat
    }
    // the input census is a bare count — materializing a copy of the raw
    // corpus would double the pipeline's storage for a number the scan
    // produces directly (and the scan, unlike a checkpoint, stays
    // column-prunable for the slim re-acquisition joins below)
    censusOf("input", docs)

    // A corpus arriving in FEWER partitions than cores (one small
    // parquet file in local mode) would run every text stage nearly
    // single-threaded — and since each checkpoint inherits its input's
    // partitioning, the whole pipeline would. Spread it ONCE up front;
    // at cluster scale a real corpus scan already has partitions >>
    // cores and this is a no-op (no shuffle ever added at 100 TB).
    val cores = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions >= cores) docs else docs.repartition(cores)

    // 1+2+2b FUSED (r12 #5): the quality gate rides the SAME codegen'd
    // scan as redaction and the within-doc span cut — one inline filter
    // ([[TextStats.qualityKeep]], the exact conjunction qualityFilter
    // emits), no flags frame, no semi join, and ONE checkpoint where
    // the composed path used to materialize the corpus twice. The
    // quality census comes off the materialized frame (the self-cut
    // shrinks tokens, never drops documents, so its row count IS the
    // gate's keep count). Checkpointed: three consumers (fingerprints,
    // the survivor semi join, and through it every later stage).
    val selfCut = ckpt(
      TextDedup.cutSelfSpans(
          spread.filter(TextStats.qualityKeep(col(textCol)))
            .withColumn(textCol, TextStats.redact(col(textCol))),
          idCol, textCol, spanK)
        .withColumnRenamed("text_dedup", textCol)
        .drop("n_tokens_removed"))
    censusOf("quality_gate", selfCut)

    // 3. exact dedup: survivors are min-id per fingerprint
    val exactIds = TextDedup.exactDedup(selfCut, idCol, textCol).select(idCol)
    val exact = census("exact_dedup",
      selfCut.join(exactIds, Seq(idCol), "left_semi"))

    // 4. near-dup removal: one representative per jaccard cluster; the
    // anti side is only the DROPPED ids, so the corpus never shuffles.
    // The PREFIX-FILTERED pair join (AllPairs/PPJoin) is the deliberate
    // choice here over the plain inverted index: the pipeline is the
    // production composition, and at corpus scale common shingles are
    // exactly where the plain index's Σ df² melts — the prefix path's
    // candidate join runs over rare shingles only (ExtSpec proves the
    // two return identical pairs)
    val pairs = TextDedup.ngramJaccardPairsPrefix(exact, idCol, textCol,
      shingleK, jaccardThreshold)
    // survivors are derived FROM the exact frame, so the slim id count
    // IS the stage census — and `near` has exactly one consumer (the
    // span cut feeding the checkpointed `sized`), so it carries no
    // checkpoint of its own: one less full-corpus materialization
    val nearIds = ckpt( // two consumers: the count + the semi join
      TextDedup.dedupSurvivors(exact, idCol, pairs))
    censusOf("near_dedup", nearIds)
    val near = exact.join(nearIds, Seq(idCol), "left_semi")

    // 5. span cut on the survivors + drop remnants too short to train on
    val cut = TextDedup.cutDupSpans(near, idCol, textCol, spanK)
      .withColumnRenamed("text_dedup", textCol)
    val sized = census("span_cut",
      cut.withColumn("n_tokens",
          size(TextStats.tokens(col(textCol))).cast("long"))
        .filter(col(textCol) =!= "" && col("n_tokens") >= minTokensAfterCut))

    // 6. contamination screen against the benchmark (broadcast semi join)
    val dirty = TextDedup.contaminatedIds(sized, benchmark, idCol, textCol, contamK)
    val clean = census("decontaminated",
      sized.join(dirty, Seq(idCol), "left_anti"))

    // 6b. recipe stages (optional): weighted mix then per-source quota.
    // The curated frame lost every non-text column at the self-cut, so
    // the source map is re-acquired as a slim (id, source) join — ids and
    // one label through the exchange, never document text. The kept-id
    // sides are at most the surviving corpus (quota: ≤ N·|sources|), so
    // the corpus rejoins them by semi join exactly like every other stage.
    def sourceOf(df: DataFrame, src: String): DataFrame =
      df.select(col(idCol), col("n_tokens"))
        .join(docs.select(col(idCol), col(src)), Seq(idCol))
    val afterMix = (sourceCol, sourceWeights) match {
      case (Some(src), Some(w)) =>
        val kept = graft.operators.Sampling.weightedMix(
          sourceOf(clean, src), col(idCol), col(src), w).select(idCol)
        census("source_mix", clean.join(kept, Seq(idCol), "left_semi"))
      case _ => clean
    }
    val afterQuota = (sourceCol, sourceQuota) match {
      case (Some(src), Some(n)) =>
        val kept = sourceOf(afterMix, src)
          .groupBy(col(src))
          .agg(graft.functions.TopKBy.topkBy(col("n_tokens"), col(idCol), n).as("top"))
          // alias the generator before getField — Spark refuses field
          // extraction directly on explode() at analysis (t19 form,
          // ExtQueries t19_source_quota)
          .select(explode(col("top")).as("e"))
          .select(col("e").getField("id").as(idCol))
        census("source_quota", afterMix.join(kept, Seq(idCol), "left_semi"))
      case _ => afterMix
    }

    // 7. pack into budget bins, assembled in id order WITHIN each shard:
    // the unsharded call would route into packSequences' global-window
    // branch — one task sorting the entire surviving corpus — so a shard
    // column is always supplied here (derived when the caller has none).
    // The derived shard count scales with the SURVIVING corpus (already
    // counted by the census, so sizing is free): ~64 docs per shard keeps
    // bins packing full on small corpora instead of ~1 doc rattling in
    // each of `packShards` buckets, while large corpora still cap at
    // `packShards` so no shard ever owns more than a sliver of the sort.
    // A caller-supplied shard column no longer exists on the curated frame
    // (the self-cut rebuilt it down to id+text), so it is re-acquired from
    // the INPUT by the same slim (id, shard) join the recipe stages use.
    val forPack = packShardCol match {
      case Some(name) =>
        require(docs.columns.contains(name),
          s"packShardCol '$name' is not a column of the input corpus")
        // the curated frame carries (id, text, n_tokens): a shard column
        // shadowing one of them would make the re-acquisition join
        // ambiguous at analysis — reject it with a direct message instead
        require(name != idCol && name != textCol && name != "n_tokens",
          s"packShardCol '$name' collides with a pipeline column; rename it on the input")
        afterQuota.join(docs.select(col(idCol), col(name)), Seq(idCol))
      case None =>
        require(!docs.columns.contains("pack_shard"),
          "input already has a pack_shard column; pass packShardCol = Some(\"pack_shard\") " +
            "to shard packing by it instead of silently overwriting it")
        // the shard sizing needs the FINAL census count — await just
        // that future (its job has been running since the last stage
        // materialized; every earlier count keeps overlapping)
        val derivedShards = math.max(1L, math.min(packShards.toLong,
          Await.result(lastCensusF, Duration.Inf) / 64L))
        afterQuota.withColumn("pack_shard",
          pmod(xxhash64(col(idCol)), lit(derivedShards)))
    }
    val shardName = packShardCol.getOrElse("pack_shard")
    val packed = TextStats.packedText(forPack, idCol, textCol,
      col("n_tokens"), packBudget, shardCol = Some(shardName))
    counts ++= pending.result().map { case (stage, f) =>
      StageCount(stage, Await.result(f, Duration.Inf))
    }
    (packed, counts.result())
  }
}
