package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{IngestPipeline, TextDedup}
import graft.ext.IngestPipeline._
import graft.run.RunIngest
import graft.sources.Tables

/** The composed incremental-ingest driver: screen composition vs the
  * standalone operators, sequential consistency of the greedy policy
  * (ingest twice ≡ batch once — proven on a planted chain where the
  * any-pair rule provably diverges), and the file-backed driver's
  * restartability/idempotency contract. */
class IngestSpec extends SparkSpecBase {

  private lazy val docs = Tables.load(spark, sfDir, "documents").cache()

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  // near-dup CHAIN fixture, built from 6-token blocks A..F with each doc
  // three blocks shifted one block per step: corpus=ABC, a=BCD, b=CDE,
  // c=DEF. Adjacent docs share 10 of 16 3-shingles (J = 10/22 ≈ 0.4545);
  // two steps apart share only the middle block's 4 (J = 4/28 ≈ 0.143) —
  // so at threshold 0.45 the near graph is the exact path
  // corpus–a–b–c. (J ≥ 0.5 is unreachable for equal-size one-block
  // shifts: boundary shingles cap adjacent J at (2m−2)/(4m−2) < 0.5.)
  private val ChainThreshold = 0.45
  private def chainFixture = {
    import spark.implicits._
    def block(p: String) = (1 to 6).map(i => s"$p$i").mkString(" ")
    val (a, b, c, d, e, f) =
      (block("a"), block("b"), block("c"), block("d"), block("e"), block("f"))
    val corpus = Seq((1L, s"$a $b $c")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, s"$b $c $d"),  // near the corpus doc
      (101L, s"$c $d $e"),  // near a only
      (102L, s"$d $e $f")). // near b only
      toDF("doc_id", "text")
    (corpus, batch)
  }

  test("chain fixture is the adversarial shape it claims (a~corpus, a~b, b~c only)") {
    val (corpus, batch) = chainFixture
    val corpusNear = ids(TextDedup.nearDupPairsAgainst(corpus, batch,
      "doc_id", "text", threshold = ChainThreshold)
      .select(col("new_id").as("doc_id")))
    assert(corpusNear == Set(100L), s"only a is near the corpus, got $corpusNear")
    val pairs = TextDedup.ngramJaccardPairs(batch, "doc_id", "text",
        threshold = ChainThreshold)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 101L), (101L, 102L)),
      s"the batch pair graph must be the exact 2-edge chain, got $pairs")
  }

  test("greedy ingest is sequentially consistent where the any-pair rule diverges") {
    val (corpus, batch) = chainFixture
    val state0 = IngestPipeline.bootstrap(corpus)
    def accepted(policy: BatchPolicy, batches: Seq[DataFrame]): Set[Long] = {
      var st = state0
      var acc = Set.empty[Long]
      batches.foreach { b =>
        val r = IngestPipeline.ingest(st, b, threshold = ChainThreshold,
          policy = policy, cutMode = NoCut)
        acc ++= ids(r.delta.docs)
        st = IngestPipeline.grow(st, r.delta)
      }
      acc
    }
    val whole = Seq(batch)
    val split = Seq(batch.filter(col("doc_id") <= 100),
      batch.filter(col("doc_id") > 100))
    // sequential ground truth (one doc at a time): a drops (corpus near),
    // b survives (its only near neighbor a was never accepted), c drops
    // (near the SURVIVING b)
    assert(accepted(Greedy, whole) == Set(101L),
      "greedy one-batch must keep exactly b")
    assert(accepted(Greedy, split) == Set(101L),
      "greedy split-batch must keep exactly b — sequential consistency")
    // the any-pair rule over-drops b (killed by the corpus-dropped a) in
    // the whole-batch run, and cannot see that kill across the split —
    // the divergence greedy exists to close
    assert(accepted(AnyPairDrops, whole) == Set.empty,
      "any-pair whole-batch drops the entire chain")
    assert(accepted(AnyPairDrops, split) == Set(101L),
      "any-pair split-batch keeps b — proving the rule is split-sensitive")
  }

  test("screen(AnyPairDrops) composition lands exactly on incrementalSurvivors (d16)") {
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val viaDriver = ids(IngestPipeline.screen(IngestPipeline.bootstrap(corpus),
      batch, policy = AnyPairDrops).filter(col("accepted")))
    val direct = ids(TextDedup.incrementalSurvivors(corpus, batch, "doc_id", "text"))
    assert(viaDriver == direct,
      s"driver composition diverged from the d16 operator: " +
        s"extra=${viaDriver -- direct} missing=${direct -- viaDriver}")
  }

  test("greedy over-accepts vs any-pair only through dropped-lower chains") {
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val state = IngestPipeline.bootstrap(corpus)
    val greedy = ids(IngestPipeline.screen(state, batch, policy = Greedy)
      .filter(col("accepted")))
    val anyPair = ids(IngestPipeline.screen(state, batch, policy = AnyPairDrops)
      .filter(col("accepted")))
    assert(anyPair.subsetOf(greedy),
      "any-pair can only drop MORE than greedy, never accept more")
  }

  test("ingest span-cut removes corpus-held spans from accepted docs and drops remnants") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12 s13 s14 s15 s16")).toDF("doc_id", "text")
    val batch = Seq(
      // fresh head, then 8 tokens verbatim from the corpus: the tail is cut,
      // 8 fresh tokens survive (>= minTokensAfterCut)
      (200L, "f1 f2 f3 f4 f5 f6 f7 f8 s1 s2 s3 s4 s5 s6 s7 s8"),
      // 3 fresh tokens + the same verbatim 8: the 3-token remnant drops
      (201L, "g1 g2 g3 s9 s10 s11 s12 s13 s14 s15 s16")).toDF("doc_id", "text")
    val r = IngestPipeline.ingest(IngestPipeline.bootstrap(corpus), batch,
      policy = Greedy, cutMode = SpanCut)
    val stored = r.delta.docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stored.keySet == Set(200L), s"only the long remnant survives, got ${stored.keySet}")
    assert(stored(200L) == "f1 f2 f3 f4 f5 f6 f7 f8",
      s"the corpus-held span must be cut, got '${stored(200L)}'")
    val census = r.census.map(c => c.stage -> c.docs).toMap
    assert(census("accepted") == 2L && census("stored") == 1L,
      s"census must show the remnant drop between accepted and stored: $census")
  }

  test("RunIngest file driver: bootstrap, ingest, idempotent re-run, restart safety") {
    val dir = Files.createTempDirectory("ingest_state").toString
    val corpusP = s"$dir/__corpus.parquet"
    val b1P = s"$dir/__b1.parquet"
    val b2P = s"$dir/__b2.parquet"
    docs.filter(col("doc_id") < 400).write.parquet(corpusP)
    docs.filter(col("doc_id") >= 400 && col("doc_id") < 450).write.parquet(b1P)
    docs.filter(col("doc_id") >= 450).write.parquet(b2P)
    // drive through the state layer directly (RunIngest.main builds its own
    // session; here we exercise the same IO helpers against the shared one)
    def step(args: String*): Unit = RunIngestHarness.run(spark, dir, args)
    step("bootstrap", corpusP)
    assert(RunIngest.committedVersions(dir) == Seq(0))
    step("ingest", b1P, "day1", "anypair", "nocut")
    val v1 = RunIngest.committedVersions(dir)
    assert(v1 == Seq(0, 1), s"batch day1 must commit as v1, got $v1")
    // idempotency: redelivering day1 is a no-op
    step("ingest", b1P, "day1", "anypair", "nocut")
    assert(RunIngest.committedVersions(dir) == Seq(0, 1),
      "re-running a committed batch_id must not create a new version")
    // restart safety: an orphan delta dir (crash before LOG append) is
    // ignored on load and overwritten by the next commit
    Files.createDirectories(Paths.get(s"$dir/delta_v2/docs"))
    step("ingest", b2P, "day2", "anypair", "nocut")
    assert(RunIngest.committedVersions(dir) == Seq(0, 1, 2))
    // final state ≡ the c3 in-memory composition (same policy/cut)
    val state = RunIngest.loadState(spark, dir, Seq(0, 1, 2))
    val viaFiles = ids(state.docs.filter(col("doc_id") >= 400))
    val state0 = IngestPipeline.bootstrap(docs.filter(col("doc_id") < 400))
    val r1 = IngestPipeline.ingest(state0,
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 450),
      policy = AnyPairDrops, cutMode = NoCut)
    val r2 = IngestPipeline.ingest(IngestPipeline.grow(state0, r1.delta),
      docs.filter(col("doc_id") >= 450),
      policy = AnyPairDrops, cutMode = NoCut)
    assert(viaFiles == ids(r1.delta.docs) ++ ids(r2.delta.docs),
      "the file-backed driver must land on the in-memory composition")
  }

  test("ingest with a reliable checkpointDir lands on the local-checkpoint result") {
    val ckptDir = Files.createTempDirectory("ingest_ckpt").toString
    val state = IngestPipeline.bootstrap(docs.filter(col("doc_id") < 400))
    val batch = docs.filter(col("doc_id") >= 400)
    val local = IngestPipeline.ingest(state, batch)
    val reliable = IngestPipeline.ingest(state, batch,
      checkpointDir = Some(ckptDir))
    assert(ids(reliable.delta.docs) == ids(local.delta.docs))
    assert(reliable.census == local.census)
    // the reliable path actually wrote checkpoint state to the dir
    def walk(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
    assert(walk(new java.io.File(ckptDir)) > 0,
      "reliable checkpoints must persist RDD state under checkpointDir")
  }

  test("compact folds live deltas into one version with identical screen decisions") {
    val dir = Files.createTempDirectory("ingest_compact").toString
    val corpusP = s"$dir/__corpus.parquet"
    val b1P = s"$dir/__b1.parquet"
    val b2P = s"$dir/__b2.parquet"
    docs.filter(col("doc_id") < 350).write.parquet(corpusP)
    docs.filter(col("doc_id") >= 350 && col("doc_id") < 420).write.parquet(b1P)
    docs.filter(col("doc_id") >= 420 && col("doc_id") < 460).write.parquet(b2P)
    def step(args: String*): Unit = RunIngestHarness.run(spark, dir, args)
    step("bootstrap", corpusP)
    step("ingest", b1P, "day1", "greedy", "span")
    step("ingest", b2P, "day2", "greedy", "span")
    assert(RunIngest.liveVersions(dir) == Seq(0, 1, 2))

    // the probe: an UNCOMMITTED ingest decision against the pre-compact state
    val probe = docs.filter(col("doc_id") >= 460)
    def decide(): (Seq[(String, Long)], Set[Long]) = {
      val live = RunIngest.liveVersions(dir)
      val state = RunIngest.loadState(spark, dir, live)
      val sketch = RunIngest.loadSketch(dir, live)
      val r = IngestPipeline.ingest(state, probe, sketch = sketch)
      (r.census.map(c => c.stage -> c.docs), ids(r.delta.docs).toSet)
    }
    val before = decide()

    step("compact")
    // live collapses to the single compacted version; full history intact
    assert(RunIngest.liveVersions(dir) == Seq(3),
      s"live must be just the compacted delta: ${RunIngest.liveVersions(dir)}")
    assert(RunIngest.committedVersions(dir) == Seq(0, 1, 2, 3))
    // screen decisions over the compacted state are IDENTICAL
    assert(decide() == before,
      "compaction must not change any screen decision (census + accepted ids)")
    // batch-id memory survives compaction: re-delivering day1 is still a no-op
    step("ingest", b1P, "day1", "greedy", "span")
    assert(RunIngest.committedVersions(dir) == Seq(0, 1, 2, 3),
      "a pre-compaction batch_id must stay a no-op after compaction")
    // compacting a single live delta is a no-op
    step("compact")
    assert(RunIngest.committedVersions(dir) == Seq(0, 1, 2, 3))
    // ingest continues on top of the compacted state
    step("ingest", b1P, "day1b", "greedy", "span")
    assert(RunIngest.liveVersions(dir) == Seq(3, 4))
    // window/chunk indexes lost no keys in the distinct fold (checked
    // BEFORE retention deletes the subsumed dirs)
    val pre = RunIngest.loadState(spark, dir, Seq(0, 1, 2))
    val post = RunIngest.loadState(spark, dir, Seq(3))
    assert(pre.windows.select("h").distinct().count() ==
      post.windows.select("h").distinct().count())
    assert(pre.docs.count() == post.docs.count() &&
      pre.posts.count() == post.posts.count())
    // retention: the subsumed delta dirs go, batch-id memory stays (the
    // LOG is never trimmed), and state reads keep working
    val retired = RunIngest.retireSubsumed(dir)
    assert(retired.toSet == Set(0, 1, 2), s"v0..v2 are subsumed: $retired")
    assert(!Files.exists(Paths.get(s"$dir/delta_v0")) &&
      Files.exists(Paths.get(s"$dir/delta_v3")))
    assert(RunIngest.committedVersions(dir) == Seq(0, 1, 2, 3, 4))
    step("ingest", b1P, "day1", "greedy", "span")
    assert(RunIngest.committedVersions(dir).size == 5,
      "pre-retire batch ids must stay no-ops after the sweep")
    assert(RunIngest.loadState(spark, dir,
      RunIngest.liveVersions(dir)).docs.count() > 0)
  }

  test("fullIngestStream with compactEvery folds state inline without changing results") {
    val dir = Files.createTempDirectory("graft_singc").toString
    val corpusP = s"$dir/__corpus.parquet"
    docs.filter(col("doc_id") < 400).write.parquet(corpusP)
    RunIngestHarness.run(spark, dir, Seq("bootstrap", corpusP))
    val srcDir = s"$dir/src"
    val b1 = docs.filter(col("doc_id") >= 400 && col("doc_id") < 450)
    val b2 = docs.filter(col("doc_id") >= 450)
    b1.coalesce(1).write.mode("overwrite").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(_.setLastModified(1000000L))
    b2.coalesce(1).write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles()
      .filter(_.lastModified() != 1000000L).foreach(_.setLastModified(2000000L))
    graft.streaming.Streams.fullIngestStream(spark, b1.schema, srcDir, dir,
      compactEvery = 1)
    // every batch commit was followed by a compaction epoch, so live
    // state is always ONE delta
    assert(RunIngest.liveVersions(dir).size == 1,
      s"live must be a single compacted delta: ${RunIngest.liveVersions(dir)}")
    // accepted docs equal the batch composition (compaction is invisible)
    val got = ids(RunIngest.loadState(spark, dir, RunIngest.liveVersions(dir))
      .docs.filter(col("doc_id") >= 400))
    val state0 = IngestPipeline.bootstrap(docs.filter(col("doc_id") < 400))
    val r1 = IngestPipeline.ingest(state0, b1)
    val r2 = IngestPipeline.ingest(IngestPipeline.grow(state0, r1.delta), b2)
    assert(got == ids(r1.delta.docs) ++ ids(r2.delta.docs),
      "inline compaction must not change any accepted-doc decision")
  }

  test("fullIngestStream: micro-batched ingest equals the batch composition; replays no-op") {
    val dir = Files.createTempDirectory("graft_sing").toString
    val corpusP = s"$dir/__corpus.parquet"
    docs.filter(col("doc_id") < 400).write.parquet(corpusP)
    RunIngestHarness.run(spark, dir, Seq("bootstrap", corpusP))
    // two micro-batches, file mod times force the order
    val srcDir = s"$dir/src"
    val b1 = docs.filter(col("doc_id") >= 400 && col("doc_id") < 450)
    val b2 = docs.filter(col("doc_id") >= 450)
    b1.coalesce(1).write.mode("overwrite").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(_.setLastModified(1000000L))
    b2.coalesce(1).write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles()
      .filter(_.lastModified() != 1000000L).foreach(_.setLastModified(2000000L))
    graft.streaming.Streams.fullIngestStream(spark, b1.schema, srcDir, dir)
    assert(RunIngest.committedVersions(dir) == Seq(0, 1, 2),
      "each micro-batch commits one state delta")
    val got = ids(RunIngest.loadState(spark, dir, Seq(0, 1, 2))
      .docs.filter(col("doc_id") >= 400))
    // ground truth: the same two batches through the in-memory pipeline
    // with the stream's defaults (Greedy policy, SpanCut)
    val state0 = IngestPipeline.bootstrap(docs.filter(col("doc_id") < 400))
    val r1 = IngestPipeline.ingest(state0, b1)
    val r2 = IngestPipeline.ingest(IngestPipeline.grow(state0, r1.delta), b2)
    assert(got == ids(r1.delta.docs) ++ ids(r2.delta.docs),
      "streamed micro-batches must land on the batch composition")
    // replaying the whole stream (fresh checkpoint → epochs restart at 0)
    // hits the commit log's already-committed check: byte-level no-op
    val logBefore = Files.readAllLines(Paths.get(s"$dir/LOG"))
    graft.streaming.Streams.fullIngestStream(spark, b1.schema, srcDir, dir)
    assert(RunIngest.committedVersions(dir) == Seq(0, 1, 2) &&
      Files.readAllLines(Paths.get(s"$dir/LOG")) == logBefore,
      "a replayed epoch must be a no-op against the commit log")
  }
}

/** Test-only twin of [[RunIngest.main]]'s command dispatch that reuses the
  * suite's shared session instead of building one (main would fight the
  * JVM-wide session and stop() it under later suites). Mirrors main's
  * logic 1:1 via the same public helpers. */
object RunIngestHarness {
  def run(spark: org.apache.spark.sql.SparkSession, stateDir: String,
          args: Seq[String]): Unit = args.head match {
    case "bootstrap" =>
      val corpus = spark.read.parquet(args(1))
      val state = IngestPipeline.bootstrap(corpus)
      RunIngest.writeDelta(stateDir, 0, state, None)
      RunIngest.commit(stateDir, 0, "__bootstrap__", Seq.empty)
    case "ingest" =>
      val (batchPath, batchId) = (args(1), args(2))
      if (RunIngest.committedBatchIds(stateDir).contains(batchId)) return
      val policy = if (args(3) == "greedy") Greedy else AnyPairDrops
      val cut = args(4) match {
        case "span" => SpanCut; case "chunk" => ChunkCut; case _ => NoCut
      }
      val committed = RunIngest.committedVersions(stateDir)
      val live = RunIngest.liveVersions(stateDir)
      val state = RunIngest.loadState(spark, stateDir, live)
      val sketch = RunIngest.loadSketch(stateDir, live)
      val batch = spark.read.parquet(batchPath)
      val result = IngestPipeline.ingest(state, batch,
        policy = policy, cutMode = cut, sketch = sketch)
      val version = committed.max + 1
      RunIngest.writeDelta(stateDir, version, result.delta, sketch)
      RunIngest.commit(stateDir, version, batchId,
        result.census.map(c => c.stage -> c.docs))
    case "compact" =>
      RunIngest.runCompact(spark, stateDir)
  }
}
