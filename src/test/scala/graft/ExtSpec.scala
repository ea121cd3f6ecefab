package graft

import org.apache.spark.sql.functions._
import graft.ext._
import graft.sources.Tables

/** North-star extension operators: the rows-only queries get their
  * correctness asserted here (LSH vs brute-force agreement, planted-dup
  * recall, determinism of hash-based fingerprints). */
class ExtSpec extends SparkSpecBase {

  private lazy val docs = Tables.load(spark, sfDir, "documents").cache()
  private lazy val emb = Tables.load(spark, sfDir, "embeddings").cache()

  test("contamination screen flags shared shingles and clears disjoint vocabulary") {
    import spark.implicits._
    import graft.ext.TextDedup
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "prefix words then the quick brown fox appears here"), // shares a 3-shingle
      (11L, "entirely disjoint vocabulary with zero overlap tokens"),
      (12L, "quick brown unrelated")) // bigrams overlap, no full 3-shingle
      .toDF("doc_id", "text")
    val flagged = TextDedup.contaminatedIds(corpus, bench, "doc_id", "text", k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(10L),
      s"only the doc sharing a full 3-shingle is contaminated, got $flagged")
  }

  test("decontamination n-grams: an 8-gram screen keeps docs sharing only a trigram") {
    import spark.implicits._
    import graft.ext.TextDedup
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // shares the trigram "alpha beta gamma" but no 8-gram run
      (10L, "alpha beta gamma unrelated words fill this document out"),
      // shares a full 8-gram with the benchmark
      (11L, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"))
      .toDF("doc_id", "text")
    val at3 = TextDedup.contaminatedIds(corpus, bench, "doc_id", "text", k = 3)
      .collect().map(_.getLong(0)).toSet
    val at8 = TextDedup.contaminatedIds(corpus, bench, "doc_id", "text", k = 8)
      .collect().map(_.getLong(0)).toSet
    assert(at3 == Set(10L, 11L), s"a trigram screen flags both, got $at3")
    assert(at8 == Set(11L),
      s"the 8-gram screen (CorpusPipeline's contamK default) must keep the " +
        s"trigram-only doc — over-dropping is the failure mode, got $at8")
  }

  test("minhash LSH pairs == exact-jaccard pairs at threshold (full recall on planted dups)") {
    val lsh = TextDedup.minhashDupPairs(docs, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth at the same shingle size
    val sh = docs.select(col("doc_id"), TextDedup.shingles(col("text")).as("sh"))
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(TextDedup.jaccard(col("sh_a"), col("sh_b")) >= 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates are jaccard-verified, so lsh ⊆ exact always; at ~0.99
    // planted similarity the banding (8 bands × 4 rows) must not miss any.
    assert(lsh == exact)
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
  }

  test("simhash separates near-dups from random pairs by hamming distance") {
    val fp = docs.select(col("doc_id"), TextDedup.simhash(col("text")).as("sh"))
    val pairs = TextDedup.minhashDupPairs(docs, "doc_id", "text", threshold = 0.7)
    val fa = fp.select(col("doc_id").as("id_a"), col("sh").as("fa"))
    val fb = fp.select(col("doc_id").as("id_b"), col("sh").as("fb"))
    val hamming = bit_count(col("fa").bitwiseXOR(col("fb")))
    val dupAvg = pairs.join(fa, "id_a").join(fb, "id_b")
      .agg(avg(hamming)).head().getDouble(0)
    val randAvg = fa.crossJoin(fb).filter(col("id_a") < col("id_b"))
      .agg(avg(hamming)).head().getDouble(0)
    // fixture texts share one tiny vocabulary, so even random pairs are
    // token-correlated — assert separation, not absolute distances
    assert(dupAvg < 8, s"near-dup avg hamming $dupAvg should be small")
    assert(randAvg > dupAvg + 4,
      s"random avg $randAvg should clearly exceed near-dup avg $dupAvg")
  }

  test("LSH ANN achieves reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, queries, "vec_id", "embedding",
        k = 5, bits = 6, tables = 8)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann intersect brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall $recall too low for 8 tables x 6-bit buckets")
  }

  test("rolling_hash native expression matches the reference implementation") {
    val got = docs.limit(20)
      .select(col("text"), graft.functions.RollingHash.rolling_hash(col("text")).as("h"))
      .collect()
    got.foreach { r =>
      val expected = graft.functions.RollingHash.hashBytes(
        r.getString(0).getBytes("UTF-8"))
      assert(r.getLong(1) == expected)
    }
  }

  test("multimodal stub decode: typed schema, deterministic, partition-wise") {
    val withPayload = docs.withColumn("payload", Multimodal.asPayload(col("text")))
    val feats = Multimodal.extractFeatures(withPayload, "doc_id", "payload")
    assert(feats.columns.toSeq == Seq("doc_id", "byte_len", "format", "width",
      "height", "checksum", "mean_luma", "feature_dim"))
    val twice = Multimodal.extractFeatures(withPayload.repartition(7), "doc_id", "payload")
    assert(feats.orderBy("doc_id").collect().toSeq ==
      twice.orderBy("doc_id").collect().toSeq) // partitioning-independent
    val n = docs.count()
    assert(feats.count() == n)
  }

  test("local near-dup verifier is bit-identical to the expression twin") {
    val fast = Similarity.nearDupPairsLocal(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expr = Similarity.nearDupPairsExpr(emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast == expr) // includes the doubles: same IEEE op order
    assert(fast.nonEmpty, "0.3 threshold should yield pairs at sf0.001")
  }

  test("default chunked near-dup path equals the local verifier bit-identically") {
    // the default path is exact and fully distributed: no collect() —
    // candidates come from the block-pair equi-join over the cached corpus
    for (threshold <- Seq(0.3, 0.5)) {
      val chunked = Similarity.nearDupPairs(emb, "vec_id", "embedding", threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = Similarity.nearDupPairsLocal(emb, "vec_id", "embedding", threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(chunked == exact, s"chunked all-pairs must equal the exact join at $threshold")
    }
    assert(Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.3).count() > 0,
      "0.3 threshold should yield pairs at sf0.001")
  }

  test("LSH near-dup path: exact precision, full recall on planted high-cosine dups") {
    import spark.implicits._
    // synthetic corpus: 200 random unit-ish vectors + 20 planted near-copies
    // (tiny perturbation -> cosine ≈ 0.999); LSH must find EVERY planted
    // pair and nothing the exact join would not emit
    val rng = new scala.util.Random(7)
    val base = (0 until 200).map(i => (i.toLong, Seq.fill(64)(rng.nextGaussian())))
    val planted = (0 until 20).map { i =>
      val (id, v) = base(i)
      (id + 1000L, v.map(_ + rng.nextGaussian() * 0.01))
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val lsh = Similarity.nearDupPairsLsh(corpus, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.nearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "verification makes LSH precision exact")
    val plantedPairs = (0 until 20).map(i => (i.toLong, i + 1000L)).toSet
    assert(plantedPairs.subsetOf(exact), "perturbed copies stay above 0.9 cosine")
    assert(plantedPairs.subsetOf(lsh), "LSH recall must be 1 on genuine near-dups")
  }

  test("IVF ANN beats random-bucket recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 3)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall too low for nprobe=3/8 cells")
  }

  test("PQ ANN with exact re-rank reaches high recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        k = 5, m = 8, ksub = 16, rerank = 32)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect brute).size.toDouble / brute.size
    assert(recall >= 0.5,
      s"PQ recall $recall too low for m=8 ksub=16 rerank=32 (re-rank should lift it)")
  }

  test("session extensions install every native expression without throwing") {
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("langid is deterministic and total") {
    val l1 = docs.select(col("doc_id"), TextStats.langId(col("text")).as("l"))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(l1.forall(Set("en", "es", "fr", "de", "und").contains))
  }
  test("dup clusters: connected components group transitive near-dups under min id") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),   // dup of 1
      (3L, "alpha beta gamma delta epsilon eta"),    // near-dup of 1/2
      (10L, "one two three four five six"),
      (11L, "one two three four five six"),          // dup of 10
      (20L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val pairs = TextDedup.ngramJaccardPairs(df, "doc_id", "text", k = 3, threshold = 0.5)
    val clusters = TextDedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
    assert(!clusters.contains(20L), "singletons (no pairs) are not emitted")
  }

  test("dup clusters converge on a chain (a-b, b-c, c-d all one component)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L)).toDF("id_a", "id_b")
    val got = TextDedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("hashed shingles are total on sub-k docs (ANSI-safe)") {
    import spark.implicits._
    val df = Seq(
      (1L, "one two"),   // 2 tokens < k=3: whole token list is the shingle
      (2L, "one two"),   // identical short doc -> jaccard 1 with doc 1
      (3L, "one"),       // single token
      (4L, ""),          // empty text (split yields [""])
      (5L, "one two three four five six")
    ).toDF("doc_id", "text")
    // ANSI mode is on by default in Spark 4: an unguarded element_at past
    // the array end would throw here instead of returning rows
    val pairs = TextDedup.ngramJaccardPairs(df, "doc_id", "text", k = 3, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), "identical short docs pair; lengths never cross")
    // minhash path must be total on the same corpus too
    TextDedup.minhashDupPairs(df, "doc_id", "text", threshold = 0.5).collect()
  }

  test("dup clusters: empty pair list returns an empty frame (no NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(TextDedup.dupClusters(empty).count() == 0)
  }

  test("dup clusters: worst-case chain converges under the default cap; a tight cap is honored") {
    import spark.implicits._
    // path graph 0-1-2-…-20: diameter 20, min-label propagation needs ~20
    // rounds — a lazily-chained loop would go exponential here; the
    // per-round checkpoint keeps every round constant-size
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val full = TextDedup.dupClusters(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(full.size == 21)
    assert(full.values.toSet == Set(0L), "default cap must let the chain converge")
    // a 3-round cap completes without error but cannot have converged
    // (driverMaxEdges = 0 forces the distributed loop this test is about)
    val capped = TextDedup.dupClusters(chain, maxRounds = 3,
        driverMaxEdges = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(capped.size == 21)
    assert(capped.values.toSet != Set(0L), "3 rounds cannot flood a 20-diameter chain")
  }

  test("redact scrubs emails, urls, and long digit runs; clean text is untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact bob.smith+x@corp-mail.example.org today"),
      (2L, "see https://example.com/path?q=1 and http://t.co/x for info"),
      (3L, "card 12345678901234 expires soon; pin 1234 stays"),
      (4L, "perfectly clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextStats.redact(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "contact <EMAIL> today")
    assert(got(2L) == "see <URL> and <URL> for info")
    assert(got(3L) == "card <NUMBER> expires soon; pin 1234 stays",
      "short digit runs (pins, years) must survive")
    assert(got(4L) == "perfectly clean text with no identifiers at all")
  }

  test("chunkSpans: overlapping fixed-width chunks reconstruct the document") {
    import spark.implicits._
    val text = ("a" * 150) + ("b" * 150) + ("c" * 150) + ("d" * 50) // 500 chars
    val df = Seq((1L, text), (2L, "short doc"), (3L, "")).toDF("doc_id", "text")
    val chunks = df.select(col("doc_id"),
        explode_outer(TextStats.chunkSpans(col("text"), 200, 50)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(doc1.length == 3, s"ceil((500-50)/150) = 3 chunks, got ${doc1.length}")
    assert(doc1(0) == text.substring(0, 200))
    assert(doc1(1) == text.substring(150, 350)) // 50-char overlap with chunk 0
    assert(doc1(2) == text.substring(300, 500))
    // stride-decode: dropping each chunk's 50-char overlap head (after the
    // first) reconstructs the document exactly
    assert(doc1.head + doc1.tail.map(_.substring(50)).mkString == text)
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0, "short doc")))
    assert(chunks.filter(_._1 == 3L).toSeq == Seq((3L, 0, "")))
  }

  test("chunk stride-decode reconstructs every fixture document") {
    val chunks = docs.select(col("doc_id"),
        explode_outer(TextStats.chunkSpans(col("text"), 200, 50)).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk"))
      .collect().groupBy(_.getLong(0))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, text) =>
      val cs = chunks(id).sortBy(_.getInt(1)).map(_.getString(2))
      // every chunk after the first repeats the previous chunk's 50-char
      // tail; dropping it must rebuild the document byte-for-byte
      assert(cs.head + cs.tail.map(_.drop(50)).mkString == text,
        s"doc $id did not survive chunk round-trip")
    }
  }

  test("packSequences: deterministic greedy bins, monotone, budget-shaped") {
    import spark.implicits._
    val df = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 300L), (5L, 10L))
      .toDF("doc_id", "n_tokens")
    val got = TextStats.packSequences(df, "doc_id", col("n_tokens"), 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // exclusive prefix sums: 0,100,200,300,600 -> bins 0,0,0,1,2
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L))
    // sharded: each shard packs independently (the parallel form)
    val sharded = Seq(("a", 1L, 200L), ("a", 2L, 200L), ("b", 3L, 200L), ("b", 4L, 200L))
      .toDF("shard", "doc_id", "n_tokens")
    val g2 = TextStats.packSequences(sharded, "doc_id", col("n_tokens"), 256,
        shardCol = Some("shard"))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(g2 == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L),
      "each shard's prefix sum restarts at zero")
  }

  test("cache registry: identical plans share one entry; releaseAll drops them") {
    graft.util.Caches.releaseAll()
    val a = TextDedup.shingleFrame(docs, "doc_id", "text")
    val b = TextDedup.shingleFrame(docs, "doc_id", "text")
    assert(a eq b, "repeat calls with identical args must return the same frame")
    val n = graft.util.Caches.size
    TextDedup.shingleFrame(docs, "doc_id", "text", k = 2) // distinct args
    assert(graft.util.Caches.size == n + 1)
    graft.util.Caches.releaseAll()
    assert(graft.util.Caches.size == 0)
  }

  test("tfidf top terms rank doc-distinctive terms first") {
    import spark.implicits._
    val df = Seq(
      (1L, "common common unicorn"),
      (2L, "common common common"),
      (3L, "common dragon dragon")
    ).toDF("doc_id", "text")
    val top = TextStats.tfidfTopTerms(df, "doc_id", "text", topK = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'common' appears in every doc -> idf ln(4/4)=0; unique terms win
    assert(top(1L) == "unicorn")
    assert(top(3L) == "dragon")
  }

  test("bm25 ranks term-dense short docs first; non-matching docs never rank") {
    import spark.implicits._
    val df = Seq(
      (1L, "hash join vector hash join vector"),
      (2L, "hash filler filler filler filler filler filler filler filler filler"),
      (3L, "banana orange pear"),
      (4L, "hash join filler")
    ).toDF("doc_id", "text")
    val r = TextStats.bm25TopDocs(df, "doc_id", "text",
        Seq("hash", "join", "vector"), topK = 10)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r(1L) == 1, "the doc matching all terms densely must rank first")
    assert(r(4L) == 2, "two matched terms beat one tf-heavy-diluted term")
    assert(!r.contains(3L), "docs with no query term must not appear")
    assert(r.size == 3)
  }

  test("native dot_product is bit-identical to the HOF fold and handles nulls") {
    import spark.implicits._
    graft.functions.DotProduct.register(spark)
    val rng = new scala.util.Random(11)
    val vecs = (1 to 300).map { i =>
      (i.toLong, Seq.fill(64)(rng.nextGaussian()), Seq.fill(64)(rng.nextGaussian()))
    }.toDF("id", "a", "b")
    val both = vecs.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotFold(col("a"), col("b")).as("fold")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"bitwise mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
    // null array, null element, unequal length -> null (fold semantics)
    val edge = Seq(
      (1L, null, Seq(1.0)),
      (2L, Seq(1.0, 2.0), Seq(1.0)),
      (3L, Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0)))
    )
    val e1r = spark.sql("SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) v").head.isNullAt(0)
    val e2r = spark.sql("SELECT dot_product(array(1.0d,2.0d), array(1.0d)) v").head.isNullAt(0)
    val e3r = spark.sql("SELECT dot_product(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d,2.0d)) v").head.isNullAt(0)
    assert(e1r && e2r && e3r)
  }

  test("native simhash64 is bit-identical to the HOF fold") {
    graft.functions.SimHash64.register(spark)
    val both = docs.limit(100).select(
      TextDedup.simhash(col("text")).as("native"),
      TextDedup.simhashFold(col("text")).as("fold")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"mismatch: ${r.getLong(0)} vs ${r.getLong(1)}"))
  }

  test("prefix-filtered jaccard join equals the full inverted-index join") {
    val full = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = TextDedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref == full, "prefix filtering must be lossless at the threshold")
    assert(full.nonEmpty)
    // and at a low threshold where prefixes are long
    val full2 = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", k = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pref2 = TextDedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", k = 2, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pref2 == full2)
  }

  test("dedup survivors: one representative per cluster, everything else untouched") {
    val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
    val survivors = TextDedup.dedupSurvivors(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    val clusters = TextDedup.dupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val clustered = clusters.map(_._1).toSet
    // every cluster keeps exactly its min-id representative
    clusters.groupBy(_._2).foreach { case (rep, members) =>
      assert(rep == members.map(_._1).min)
      assert(survivors.contains(rep), s"representative $rep must survive")
      members.map(_._1).filter(_ != rep).foreach(m =>
        assert(!survivors.contains(m), s"non-representative $m must be dropped"))
    }
    // unclustered documents all survive: survivors = (all \ clustered) ∪ reps
    assert(survivors == (allIds -- clustered) ++ clusters.map(_._2).toSet)
    assert(clustered.nonEmpty, "fixtures must contain near-dups for this test to bite")
  }

  test("semantic dedup at nlist=1 equals the exact lower-id-mate policy") {
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.3, nlist = 1)
      .collect().map(_.getLong(0)).toSet
    val dropped = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.3)
      .select("id_b").distinct().collect().map(_.getLong(0)).toSet
    val allIds = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == allIds -- dropped,
      "single-cell semantic dedup must drop exactly the ids with a lower-id mate at threshold")
    assert(dropped.nonEmpty, "fixtures must contain embedding near-dups")
  }

  test("semantic dedup keeps exactly one survivor per planted duplicate group at nlist>1") {
    import spark.implicits._
    // identical vectors always share a nearest centroid, so planted exact-
    // duplicate groups can never straddle cells — recall on them is 1 at
    // ANY nlist, which is the property that makes the approximation safe
    val rng = new scala.util.Random(11)
    val base = (0 until 120).map(i => (i.toLong, Seq.fill(16)(rng.nextGaussian())))
    val copies = (0 until 10).flatMap { g =>
      val (_, v) = base(g)
      Seq((1000L + g * 2, v), (1001L + g * 2, v)) // two extra exact copies each
    }
    val corpus = (base ++ copies).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(corpus, "vec_id", "embedding",
        threshold = 0.999, nlist = 8)
      .collect().map(_.getLong(0)).toSet
    (0 until 10).foreach { g =>
      val group = Set(g.toLong, 1000L + g * 2, 1001L + g * 2)
      assert((kept & group) == Set(g.toLong),
        s"group $g must keep only its lowest id, got ${kept & group}")
    }
  }

  test("dedupSurvivorsBy keeps the argmax-priority member of every cluster") {
    val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
    val byLen = TextDedup.dedupSurvivorsBy(docs, "doc_id", pairs,
        docs.select("doc_id", "n_chars"), "n_chars")
      .collect().map(_.getLong(0)).toSet
    val minId = TextDedup.dedupSurvivors(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(byLen.size == minId.size, "policy changes WHICH doc survives, never how many")
    val clusters = TextDedup.dupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val chars = docs.select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    clusters.groupBy(_._2).foreach { case (_, members) =>
      val ids = members.map(_._1)
      val winner = ids.maxBy(id => (chars(id), -id))
      assert((byLen & ids.toSet) == Set(winner),
        s"cluster $ids must keep longest-doc $winner, got ${byLen & ids.toSet}")
    }
    val clustered = clusters.map(_._1).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((allIds -- clustered).subsetOf(byLen), "unclustered docs always survive")
  }

  test("packedText reassembles exactly the corpus, bins in pack order") {
    val slim = docs.select(col("doc_id"), col("text"),
      size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
    val packed = TextStats.packedText(slim, "doc_id", "text", col("n_tokens"), 256)
      .orderBy("bin").collect()
    val originals = slim.orderBy("doc_id")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    // splitting every bin on the separator, in bin order, replays the
    // corpus in doc_id order — nothing lost, duplicated, or reordered
    val replay = packed.flatMap(_.getString(3).split("\n\n", -1))
    assert(replay.toSeq == originals.map(_._1).toSeq)
    packed.foreach { r =>
      assert(r.getLong(1) == r.getString(3).split("\n\n", -1).length,
        "n_docs manifest must match the assembled bin")
    }
    assert(packed.map(_.getLong(2)).sum == originals.map(_._2).sum,
      "token totals are conserved across bins")
  }

  test("approx_top_k past its tracking budget still surfaces the true heavy hitters") {
    // synthetic Zipf stream (the fixture vocabulary is tiny): token i
    // appears 6000/i times over a 2000-token vocabulary, sketch budget
    // far below it → genuinely approximate, with a well-separated head
    val budget = 64
    val toks = spark.range(1, 2001)
      .select(concat(lit("tok_"), format_string("%04d", col("id"))).as("tok"),
        (lit(6000) / col("id")).cast("int").as("n"))
      .select(col("tok"), explode(sequence(lit(1), col("n"))).as("rep"))
      .select("tok")
    val approx = toks
      .agg(call_function("approx_top_k", col("tok"), lit(5), lit(budget)).as("tk"))
      .select(explode(col("tk")).as("e")).select(col("e.item"))
      .collect().map(_.getString(0)).toSet
    val exact = toks.groupBy("tok").count()
      .orderBy(col("count").desc, col("tok")).limit(5)
      .collect().map(_.getString(0)).toSet
    assert(approx == exact,
      s"sketched top-5 $approx must equal the exact top-5 $exact on a skewed corpus")
  }

  test("theta set algebra stays within 5% in the approximate regime") {
    import spark.implicits._
    // two overlapping sets of 20k ids each — far beyond the 4096-entry
    // exact threshold, so estimates are genuinely probabilistic
    val a = (0L until 20000L).toDF("id").select(col("id"), lit("a").as("s"))
    val b = (10000L until 30000L).toDF("id").select(col("id"), lit("b").as("s"))
    val sk = a.union(b).groupBy("s")
      .agg(call_function("theta_sketch_agg", col("id")).as("sk"))
    val pa = sk.filter(col("s") === "a").select(col("sk").as("p"))
    val pb = sk.filter(col("s") === "b").select(col("sk").as("e"))
    val r = pa.crossJoin(pb).select(
      call_function("theta_sketch_estimate",
        call_function("theta_union", col("p"), col("e"))).as("u"),
      call_function("theta_sketch_estimate",
        call_function("theta_intersection", col("p"), col("e"))).as("i"),
      call_function("theta_sketch_estimate",
        call_function("theta_difference", col("p"), col("e"))).as("d"))
      .head()
    def within(est: Long, truth: Long, pct: Double): Boolean =
      math.abs(est - truth).toDouble / truth <= pct
    assert(within(r.getLong(0), 30000L, 0.05), s"union est ${r.getLong(0)} vs 30000")
    assert(within(r.getLong(1), 10000L, 0.05), s"intersection est ${r.getLong(1)} vs 10000")
    assert(within(r.getLong(2), 10000L, 0.05), s"difference est ${r.getLong(2)} vs 10000")
  }

  test("corpus pipeline: each stage only ever shrinks the corpus, output packs losslessly") {
    val corpus = docs.filter(col("doc_id") >= 25)
    val benchmark = docs.filter(col("doc_id") < 25)
    val (packed, counts) = CorpusPipeline.run(corpus, benchmark)
    val byStage = counts.map(c => c.stage -> c.docs).toMap
    assert(counts.map(_.stage) == Seq("input", "quality_gate", "exact_dedup",
      "near_dedup", "span_cut", "decontaminated"))
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b.docs <= a.docs, s"${b.stage} grew the corpus: ${a.docs} -> ${b.docs}")
    }
    assert(byStage("near_dedup") < byStage("exact_dedup"),
      "fixture plants near-dups; the cluster stage must drop some")
    assert(byStage("decontaminated") < byStage("span_cut"),
      "fixture shares shingles across the id split; the screen must drop some")
    assert(byStage("decontaminated") > 0, "a real corpus must survive")
    // packing is lossless over the surviving docs
    val p = packed.agg(sum("n_docs"), sum("bin_tokens")).head()
    assert(p.getLong(0) == byStage("decontaminated"),
      "every surviving doc lands in exactly one bin")
    assert(p.getLong(1) > 0)
    // the derived pack_shard scales with the surviving corpus
    // (survivors/64 capped at packShards): this corpus is large enough
    // for >1 shard, and bins are (shard, bin)-unique
    val nShards = packed.select("pack_shard").distinct().count()
    assert(nShards > 1 && nShards <= byStage("decontaminated") / 64 + 1,
      s"expected >1 derived shards sized from ${byStage("decontaminated")} survivors, got $nShards")
    assert(packed.groupBy("pack_shard", "bin").count().filter(col("count") > 1).isEmpty,
      "(shard, bin) must be unique across the packed output")
    // deterministic end to end: same inputs, same census
    val (_, counts2) = CorpusPipeline.run(corpus, benchmark)
    assert(counts2 == counts)
  }

  test("corpus pipeline recipe stages: mix gates the census, quota equals the standalone topk_by cut") {
    import spark.implicits._
    // a corpus engineered so every pre-recipe stage is a PROVABLE no-op
    // (stopwords interleaved with per-doc-unique words: quality passes,
    // no exact/near dups, no repeated or shared k-token spans, benchmark
    // vocabulary disjoint) — the quota stage's input is then exactly the
    // input corpus and the expected cut is computable standalone
    val stop = Seq("the", "of", "and", "to", "in", "a", "is", "it", "you")
    def mkText(doc: Int, extra: Int): String =
      (0 until (10 + extra)).flatMap(j => Seq(s"w${doc}x$j", stop(j % stop.size)))
        .mkString(" ")
    val rows = Seq(
      // source a: 4 docs, token counts 40,36,32,28 (ids 1..4)
      (1L, mkText(1, 10), "a"), (2L, mkText(2, 8), "a"),
      (3L, mkText(3, 6), "a"), (4L, mkText(4, 4), "a"),
      // source b: 1 doc — quota of 2 keeps it whole
      (5L, mkText(5, 2), "b"),
      // source c: 3 docs with TIED token counts — id ASC breaks the tie
      (6L, mkText(6, 5), "c"), (7L, mkText(7, 5), "c"), (8L, mkText(8, 5), "c"))
    val corpus = rows.toDF("doc_id", "text", "source")
    val benchmark = Seq((100L, "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10"))
      .toDF("doc_id", "text")
    val n = 2
    val keepAll = Seq("a", "b", "c").map(_ -> 1.0).toMap

    val (packed, counts) = CorpusPipeline.run(corpus, benchmark,
      sourceCol = Some("source"), sourceWeights = Some(keepAll), sourceQuota = Some(n))
    assert(counts.map(_.stage) == Seq("input", "quality_gate", "exact_dedup",
      "near_dedup", "span_cut", "decontaminated", "source_mix", "source_quota"),
      s"recipe stages must appear in the census, got ${counts.map(_.stage)}")
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b.docs <= a.docs, s"${b.stage} grew the corpus: ${a.docs} -> ${b.docs}")
    }
    val byStage = counts.map(c => c.stage -> c.docs).toMap
    assert(byStage("decontaminated") == 8L,
      s"the engineered corpus survives every pre-recipe stage intact, got $byStage")
    assert(byStage("source_mix") == 8L, "weight 1.0 on every source is a keep-all mix")

    // the quota census must equal the standalone topk_by cut over the
    // same frame: score = n_tokens DESC, id ASC ties
    val standaloneIds = corpus
      .select(col("source"), col("doc_id"),
        size(TextStats.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy("source")
      .agg(graft.functions.TopKBy.topkBy(col("n_tokens"), col("doc_id"), n).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e").getField("id")).collect().map(_.getLong(0)).toSet
    assert(standaloneIds == Set(1L, 2L, 5L, 6L, 7L),
      s"standalone quota: 2 longest per source, id ASC on the c-source tie, got $standaloneIds")
    assert(byStage("source_quota") == standaloneIds.size,
      s"pipeline quota census ${byStage("source_quota")} != standalone ${standaloneIds.size}")
    // the packed output carries exactly the quota survivors
    assert(packed.agg(sum("n_docs")).head().getLong(0) == standaloneIds.size)

    // a 0-weight source is dropped ENTIRELY by the mix before the quota
    val (_, counts0) = CorpusPipeline.run(corpus, benchmark,
      sourceCol = Some("source"), sourceWeights = Some(keepAll + ("c" -> 0.0)),
      sourceQuota = Some(n))
    val byStage0 = counts0.map(c => c.stage -> c.docs).toMap
    assert(byStage0("source_mix") == 5L, s"weight 0.0 drops all of source c, got $byStage0")
    assert(byStage0("source_quota") == 3L,
      s"quota over the mixed corpus: 2 from a + 1 from b, got $byStage0")
  }

  test("corpus pipeline refuses to silently overwrite an existing pack_shard column") {
    import spark.implicits._
    val corpus = docs.filter(col("doc_id") >= 25).withColumn("pack_shard", lit(0L))
    val benchmark = docs.filter(col("doc_id") < 25)
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline.run(corpus, benchmark)
    }
    assert(e.getMessage.contains("pack_shard"))
    // ... but shard-by-it explicitly works
    val (packed, _) = CorpusPipeline.run(corpus, benchmark,
      packShardCol = Some("pack_shard"))
    assert(packed.select("pack_shard").distinct().count() == 1L)
  }

  test("cutDupSpans removes exactly the shared coverage from the higher-id copy") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "u1 u2 s1 s2 s3 s4 s5 u3 u4"),  // canonical — keeps everything
      (2L, "v1 v2 s1 s2 s3 s4 s5 v3 v4"),  // loses the shared 5-token run
      (3L, "u1 u2 s1 s2 s3 s4 s5 u3 u4"))  // full duplicate — loses all
      .toDF("doc_id", "text")
    val got = TextDedup.cutDupSpans(fixture, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got(0) == ((1L, "u1 u2 s1 s2 s3 s4 s5 u3 u4", 0L)),
      s"the lowest id keeps its text verbatim, got ${got(0)}")
    assert(got(1) == ((2L, "v1 v2 v3 v4", 5L)),
      s"only the shared run is cut, unique prose survives, got ${got(1)}")
    assert(got(2) == ((3L, "", 9L)),
      s"a full duplicate is cut to empty, got ${got(2)}")
  }

  test("cutSelfSpans keeps the first occurrence of repeated boilerplate") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "b1 b2 b3 b4 x1 x2 b1 b2 b3 b4 y1 y2"), // 4-token block repeats once
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8"))             // no self-repeat
      .toDF("doc_id", "text")
    val got = TextDedup.cutSelfSpans(fixture, "doc_id", "text", k = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got(0) == ((1L, "b1 b2 b3 b4 x1 x2 y1 y2", 4L)),
      s"the second block occurrence is cut, the first kept, got ${got(0)}")
    assert(got(1) == ((2L, "a1 a2 a3 a4 a5 a6 a7 a8", 0L)),
      s"a repeat-free doc passes through verbatim, got ${got(1)}")
  }

  test("dupSpans: diagonal islands recover exact span lengths and counts") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "x1 w3 w4 w5 w6 w7 x2 x3"),          // one 5-token run with doc 1
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8"),          // disjoint
      (4L, "w1 w2 w3 w4 q1 q2 w6 w7 w8 w9"))    // two 4-token runs with doc 1
      .toDF("doc_id", "text")
    val got = TextDedup.dupSpans(fixture, "doc_id", "text", k = 4, minSpanTokens = 4)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 5L, 1L), (1L, 4L, 4L, 2L)),
      s"expected the planted (pair, max_span, n_spans) set, got ${got.toSeq}")
    // a higher floor drops the pair whose longest run is below it
    val strict = TextDedup.dupSpans(fixture, "doc_id", "text", k = 4, minSpanTokens = 5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(strict.toSeq == Seq((1L, 2L)))
  }

  // --- round-5 hardening: skew caps, cut linearity, reliable checkpoint ---

  /** 300 docs sharing one boilerplate window (df=300) + one pair sharing a
    * rare window: the planted hot-window fixture for the skew specs. */
  private def hotWindowFixture = {
    import spark.implicits._
    val boiler = (0 until 300).map { i =>
      (i.toLong, s"b1 b2 b3 b4 b5 b6 b7 b8 u${i}a u${i}b u${i}c u${i}d")
    }
    val rare = Seq(
      (1000L, "p1 p2 s1 s2 s3 s4 s5 s6 s7 s8 p3 p4"),
      (1001L, "r1 r2 s1 s2 s3 s4 s5 s6 s7 s8 r3 r4"))
    (boiler ++ rare).toDF("doc_id", "text")
  }

  test("dupSpans maxDf cap drops saturated-window pairs, keeps under-cap results identical") {
    val capped = TextDedup.dupSpans(hotWindowFixture, "doc_id", "text",
        k = 8, minSpanTokens = 8, maxDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the only under-cap window (df=2) is the planted s1..s8 run — its pair
    // attribution is bit-identical to the uncapped run's row for that pair
    assert(capped.toSeq == Seq((1000L, 1001L, 8L, 1L)),
      s"cap=100 must keep exactly the rare-window pair, got ${capped.toSeq}")
    val uncapped = TextDedup.dupSpans(hotWindowFixture, "doc_id", "text",
        k = 8, minSpanTokens = 8)
    // without the cap the df=300 boilerplate window attributes all C(300,2)
    // pairs — the Σdf² volume the cap exists to bound
    assert(uncapped.count() == 300L * 299L / 2 + 1,
      "uncapped run must attribute every boilerplate pair plus the rare pair")
    val sat = TextDedup.saturatedWindows(hotWindowFixture, "doc_id", "text",
        k = 8, maxDf = 100).collect()
    assert(sat.length == 1 && sat.head.getLong(1) == 300L,
      "exactly the boilerplate window is saturated, with its true df")
  }

  test("cutDupSpans handles a corpus-wide hot window without a pair join blowup") {
    val got = TextDedup.cutDupSpans(hotWindowFixture, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 0 (global min id for the boilerplate window) keeps it verbatim
    assert(got(0L) == ("b1 b2 b3 b4 b5 b6 b7 b8 u0a u0b u0c u0d", 0L))
    // every other boilerplate doc loses exactly the 8 shared tokens
    (1 until 300).foreach { i =>
      assert(got(i.toLong) == (s"u${i}a u${i}b u${i}c u${i}d", 8L),
        s"doc $i must lose only the boilerplate window, got ${got(i.toLong)}")
    }
    assert(got(1000L)._2 == 0L, "lower id of the rare pair keeps its text")
    assert(got(1001L) == ("r1 r2 r3 r4", 8L), "higher id loses the shared run")
  }

  test("applyCut is near-linear: a 50k-token doc with a ~100% cut completes fast") {
    import spark.implicits._
    // 10-token period repeated 5000x: every window past the first period is
    // a repeat, so the cut set covers 49,990 of 50,000 tokens — the exact
    // boilerplate-heavy shape where the old per-token array_contains scan
    // was O(|toks|·|cut|) ≈ 2.5e9 interpreted comparisons (minutes); the
    // array_except formulation is O(|toks|+|cut|) and finishes in seconds.
    val period = (1 to 10).map(i => s"x$i").mkString(" ")
    val big = Seq((1L, Seq.fill(5000)(period).mkString(" "))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val r = TextDedup.cutSelfSpans(big, "doc_id", "text", k = 8).head()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.getString(1) == period,
      "only the first period survives the within-doc cut")
    assert(r.getLong(2) == 49990L)
    // generous ceiling (host stalls): quadratic would take minutes
    assert(secs < 60, s"50k-token near-total cut took ${secs}s — quadratic regression?")
  }

  test("incremental ingest: each screen drops exactly its planted case") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "settled corpus document about alpha beta gamma topics"),
      (2L, "another settled document covering delta epsilon zeta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "settled corpus document about alpha beta gamma topics"), // exact corpus dup
      (11L, "settled corpus document about alpha beta gamma material"), // near-dup of corpus 1
      (12L, "fresh unique content with entirely new vocabulary here"),
      (13L, "fresh unique content with entirely new vocabulary here"), // exact batch dup of 12
      (14L, "fresh unique content with entirely new vocabulary there"), // near-dup of 12 (batch)
      (15L, "completely independent subject matter nothing shared at all"))
      .toDF("doc_id", "text")
    val exact = TextDedup.incrementalExactIds(corpus, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(exact == Set(11L, 12L, 14L, 15L),
      s"exact screen drops the corpus dup and the batch repeat, got $exact")
    val nearPairs = TextDedup.nearDupPairsAgainst(corpus, batch, "doc_id", "text",
        k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nearPairs.contains((11L, 1L)) && nearPairs.contains((10L, 1L)),
      s"cross near-dups must pair batch docs with corpus doc 1, got $nearPairs")
    assert(!nearPairs.exists(_._2 == 2L), "nothing resembles corpus doc 2")
    val survivors = TextDedup.incrementalSurvivors(corpus, batch, "doc_id", "text",
        k = 3, threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(12L, 15L),
      s"only the first fresh doc and the independent doc join the corpus, got $survivors")
  }

  test("cutSpansAgainst removes exactly the corpus-shared windows from a batch") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"s$i").mkString(" ") // 8-token corpus span
    val corpus = Seq(
      (1L, s"settled leading words $span settled trailing words"),
      (2L, "unrelated settled material nothing shared with batch"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"fresh intro tokens here $span fresh outro tokens here"),
      (11L, "entirely new vocabulary with no settled overlap at all"))
      .toDF("doc_id", "text")
    val out = TextDedup.cutSpansAgainst(corpus, batch, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(10L, 11L), "one row per batch doc, corpus never emitted")
    val (text10, removed10) = out(10L)
    assert(text10 == "fresh intro tokens here fresh outro tokens here",
      s"the shared span must be cut, surrounding prose kept, got '$text10'")
    assert(removed10 == 8L)
    assert(out(11L) == (("entirely new vocabulary with no settled overlap at all", 0L)),
      "a batch doc sharing nothing is returned verbatim")
  }

  test("bloom screen: exact verdicts, no false negatives at the prefilter") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "settled corpus document about alpha beta gamma topics"),
      (2L, "another settled document covering delta epsilon zeta"),
      (3L, "third settled text with its own distinct vocabulary"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "settled corpus document about alpha beta gamma topics"), // verbatim redelivery
      (11L, "Settled   Corpus document ABOUT alpha beta gamma topics "), // normalizes equal
      (12L, "entirely fresh content sharing nothing with the corpus"),
      (13L, "another settled document covering delta epsilon zeta plus"))  // edited → not a dup
      .toDF("doc_id", "text")
    val verdicts = BloomScreen.screen(corpus, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(verdicts == Map(10L -> true, 11L -> true, 12L -> false, 13L -> false),
      s"verdicts must be exact after confirmation, got $verdicts")
    // no-false-negatives: every true dup must already pass the sketch probe
    val sk = BloomScreen.corpusSketch(corpus, "text")
    assert(sk.isDefined)
    val prefilter = batch
      .filter(graft.functions.BloomSketch.mightContain(sk.get,
        xxhash64(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))))
      .select("doc_id").as[Long].collect().toSet
    assert(Set(10L, 11L).subsetOf(prefilter),
      s"bloom must never reject a true duplicate, prefilter passed $prefilter")
    // empty corpus → sketch absent → all verdicts exact negatives
    val empty = BloomScreen.screen(corpus.filter(lit(false)), batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(empty.values.forall(_ == false) && empty.size == 4)
  }

  test("window index: index-fed span cut == text-fed, and the index grows mergeably") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val corpus = Seq((1L, s"settled head $span settled tail here")).toDF("doc_id", "text")
    val b1 = Seq((10L, s"first batch fresh opening $span fresh closing words")).toDF("doc_id", "text")
    val b2 = Seq(
      (20L, s"second batch other prose $span more other prose"), // span still settled
      (21L, "first batch fresh opening words shifted so no full window repeats"))
      .toDF("doc_id", "text")
    val idx1 = TextDedup.windowIndex(corpus, "doc_id", "text", k = 8)
    val viaIdx = TextDedup.cutSpansAgainstIndex(idx1, b1, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val viaText = TextDedup.cutSpansAgainst(corpus, b1, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(viaIdx.toSeq == viaText.toSeq,
      "a prebuilt index must cut identically to hashing the corpus text")
    // accept b1, grow the index, screen b2: the settled span is still cut,
    // and b1's own windows now count as settled too
    val idx2 = idx1.union(TextDedup.windowIndex(b1, "doc_id", "text", k = 8)).distinct()
    val out2 = TextDedup.cutSpansAgainstIndex(idx2, b2, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out2(20L)._1 == "second batch other prose more other prose" &&
      out2(20L)._2 == 8L, s"settled span cut from the later batch, got ${out2(20L)}")
    assert(out2(21L)._2 == 0L,
      s"doc sharing no full 8-token window with the grown index stays whole, got ${out2(21L)}")
  }

  test("bloom sketches merge: sharded index == whole-corpus index") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "settled corpus document about alpha beta gamma topics"),
      (2L, "another settled document covering delta epsilon zeta"),
      (3L, "third settled text with its own distinct vocabulary"),
      (4L, "fourth settled entry concluding the sharded corpus"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "another settled document covering delta epsilon zeta"), // dup of shard-A doc
      (11L, "fourth settled entry concluding the sharded corpus"),   // dup of shard-B doc
      (12L, "content the corpus has never seen in any shard"))
      .toDF("doc_id", "text")
    val shardA = corpus.filter(col("doc_id") <= 2)
    val shardB = corpus.filter(col("doc_id") > 2)
    val merged = BloomScreen.mergeSketches(
      BloomScreen.corpusSketch(shardA, "text").get,
      BloomScreen.corpusSketch(shardB, "text").get)
    val viaMerged = BloomScreen.screenExact(corpus, Some(merged), batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val viaWhole = BloomScreen.screen(corpus, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(viaMerged == Map(10L -> true, 11L -> true, 12L -> false))
    assert(viaMerged == viaWhole,
      "merging per-shard sketches must screen identically to one corpus sketch")
  }

  test("dupClustersStar labels == min-label labels on real near-dup pairs") {
    val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
    val star = TextDedup.dupClustersStar(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val label = TextDedup.dupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == label, "both algorithms must produce the identical " +
      "(doc_id, cluster_id = component min) labeling")
    assert(star.nonEmpty, "fixture plants near-dup pairs")
  }

  test("dupClustersStar collapses a 10k-node chain in logarithmic rounds") {
    import spark.implicits._
    // diameter 10,000: min-label propagation moves the minimum ONE hop per
    // round, so at any practical cap it must surrender partial labels —
    // this graph is the reason the star variant exists
    val n = 10000
    val chain = (0 until n).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val star = TextDedup.dupClustersStar(chain, maxRounds = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == (0L to n.toLong).map(i => (i, 0L)).toSet,
      "every chain node must reach the global minimum label within the cap")
    val capped = TextDedup.dupClusters(chain, maxRounds = 20,
        driverMaxEdges = 0) // the distributed loop is the subject here
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped != star,
      "min-label at the same cap cannot finish a diameter-10k chain — " +
        "if it ever does, the star variant's reason-to-exist changed")
  }

  test("driver union-find fast path == the distributed loop on seeded random graphs") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val n = 30 + rnd.nextInt(60)
      val m = 15 + rnd.nextInt(90)
      val pairs = Seq.fill(m) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(p => p._1 != p._2).toDF("id_a", "id_b")
      val fast = TextDedup.dupClusters(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val loop = TextDedup.dupClusters(pairs, driverMaxEdges = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == loop, s"seed $seed: fast path diverged from the loop")
    }
  }

  test("dupClustersStar == min-label on seeded random graphs (forests, cliques, mixtures)") {
    import spark.implicits._
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(40)
      val m = 20 + rnd.nextInt(80)
      val pairs = Seq.fill(m) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (a.toLong, b.toLong)
      }.filter(p => p._1 != p._2).toDF("id_a", "id_b")
      val star = TextDedup.dupClustersStar(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val label = TextDedup.dupClusters(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(star == label, s"seed=$seed: star and min-label labelings diverge")
    }
  }

  test("dupClusters through a reliable checkpoint dir matches the local-checkpoint labels") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // an 11-node chain needs multiple propagation rounds — each one
    // round-trips through the reliable checkpoint
    val chain = (0 until 10).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val reliable = TextDedup.dupClusters(chain, checkpointDir = Some(dir),
        driverMaxEdges = 0) // force the loop: the reliable dir is the subject
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reliable == (0L to 10L).map(i => (i, 0L)).toSet,
      "every chain node must collapse to the min label through the reliable path")
    val local = TextDedup.dupClusters(chain, driverMaxEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reliable == local)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir)).count() > 0,
      "checkpoint data must actually land in the reliable dir")
  }

  test("kll sketch: exact under k, rank-bounded past it, merge == whole") {
    import spark.implicits._
    import graft.functions.KllQuantile._
    import org.apache.spark.sql.functions._
    // approximate regime: 50k uniform values through a tiny k=128 sketch —
    // the returned quantile's TRUE rank must sit within the published
    // ~1.65σ normalized-rank error for k=128 (≈ 1.7%; allow 3%)
    val n = 50000
    val df = (0 until n).map(i => ((i * 2654435761L) % n).toDouble).toDF("x")
    val q = df.agg(kllAgg(col("x"), 128).as("sk"))
      .select(kllQuantile(col("sk"), 0.5).as("p50"), kllN(col("sk")).as("cnt"))
      .head()
    assert(q.getLong(1) == n.toLong)
    val trueRank = q.getDouble(0) / n  // values are a permutation of 0..n-1
    assert(math.abs(trueRank - 0.5) < 0.03,
      s"p50 rank error too large: got value ${q.getDouble(0)} (rank $trueRank)")
    // sharded accumulate + merge must agree with the one-shot sketch's
    // guarantees: same count, and in the EXACT regime identical quantiles
    val small = (1 to 1000).map(_.toDouble).toDF("x")
      .withColumn("seg", pmod(col("x"), lit(7)))
    val whole = small.agg(kllAgg(col("x"), 4096).as("sk"))
      .select(kllQuantile(col("sk"), 0.25), kllQuantile(col("sk"), 0.75), kllN(col("sk")))
      .head()
    val merged = small.groupBy("seg").agg(kllAgg(col("x"), 4096).as("sk"))
      .agg(kllMerge(col("sk"), 4096).as("m"))
      .select(kllQuantile(col("m"), 0.25), kllQuantile(col("m"), 0.75), kllN(col("m")))
      .head()
    assert(whole == merged, s"exact-regime merge must be lossless: $whole vs $merged")
    assert(whole.getDouble(0) == 250.0 && whole.getDouble(1) == 750.0,
      "inclusive order statistic at ceil(q*n)")
    // inverse read: exact-regime rank is count(<= x) / n as one division
    val rk = small.agg(kllAgg(col("x"), 4096).as("sk"))
      .select(kllRank(col("sk"), lit(250.0)).as("r"), kllRank(col("sk"), lit(0.5)).as("r0"))
      .head()
    assert(rk.getDouble(0) == 0.25, s"rank(250) over 1..1000 must be 0.25, got $rk")
    assert(rk.getDouble(1) == 0.0, "rank below the minimum is 0")
  }

  test("topk_by: bounded-heap quota == window row_number, combined map-side") {
    import spark.implicits._
    import graft.functions.TopKBy._
    import org.apache.spark.sql.functions._
    // scores collide on purpose (mod 97) so the id tie-break is exercised
    val df = (0 until 10000).map { i =>
      ((i % 7).toLong, (i * 2654435761L) % 97, i.toLong)
    }.toDF("g", "score", "id").repartition(8)
    val viaAgg = df.groupBy("g")
      .agg(topkBy(col("score"), col("id"), 10).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), col("pos"),
        col("e").getField("score").as("score"), col("e").getField("id").as("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("g"), (col("rn") - 1).as("pos"), col("score"), col("id"))
    assert(viaAgg.collect().toSet == viaWindow.collect().toSet,
      "heap quota must reproduce the window formulation EXACTLY, order included")
    // the scale claim: partial aggregation runs before the exchange, so the
    // shuffle carries <= k entries per group per partition, not the corpus
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert("partial_topk_by".r.findFirstIn(plan).isDefined,
      s"expected a partial (map-side) topk_by before the exchange:\n$plan")
  }

  // ---- content-defined chunking ----

  /** Local reference model of the md5 boundary gate ('0'/'1' leading hex
    * digit closes a chunk) — same md5, so deterministic on both sides. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def modelChunks(text: String): Vector[Vector[String]] =
    text.trim.toLowerCase.split("\\s+").toVector
      .foldLeft(Vector(Vector.empty[String])) { (acc, tok) =>
        val cur = acc.last :+ tok
        if (md5hex(tok).head == '0' || md5hex(tok).head == '1')
          acc.init :+ cur :+ Vector.empty[String]
        else acc.init :+ cur
      }.filter(_.nonEmpty)

  test("cdcChunks matches the reference model and partitions every token") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "one"))
      .toDF("doc_id", "text")
    val got = TextDedup.cdcChunks(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    val want = docs.collect().flatMap { r =>
      modelChunks(r.getString(1)).zipWithIndex.map { case (c, i) =>
        (r.getLong(0), i.toLong, c.size.toLong, c.mkString(" "), md5hex(c.mkString(" ")))
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq, "chunk census must equal the reference model")
    // partition property: concatenating a doc's chunks restores its text
    val rebuilt = got.groupBy(_._1).map { case (id, cs) =>
      id -> cs.sortBy(_._2).map(_._4).mkString(" ")
    }
    docs.collect().foreach { r =>
      assert(rebuilt(r.getLong(0)) == r.getString(1).trim.toLowerCase.split("\\s+").mkString(" "))
    }
  }

  test("cdc chunking is shift-resistant: a prepended token perturbs only the head") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    // any prepended token works; the suffix past the first boundary realigns
    val shifted = "prelude " + base
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val fps = TextDedup.cdcChunks(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val a = fps.filter(_._1 == 1L).map(_._2).toVector
    val b = fps.filter(_._1 == 2L).map(_._2).toVector
    assert(a.size > 2, "fixture must produce several chunks for the tail claim to bite")
    // everything after each side's head chunk run is identical — fixed-width
    // chunking would instead shift EVERY chunk edge by one token
    assert(a.tail == b.takeRight(a.size - 1),
      s"chunk tails must realign after the first boundary: $a vs $b")
  }

  test("cutChunksAgainst: corpus-stored blocks cut from the batch, index-fed == text-fed") {
    import spark.implicits._
    val shared = "lambda mu nu xi omicron pi rho sigma gamma tau upsilon chi"
    val corpus = Seq((1L, s"alpha beta $shared delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"epsilon zeta $shared eta theta"), // carries the stored block
      (11L, "one two three four five six"))     // all fresh
      .toDF("doc_id", "text")
    val viaText = TextDedup.cutChunksAgainst(corpus, batch, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(viaText(0)._3 > 0, "the corpus-shared interior chunks must be cut")
    assert(viaText(0)._2.contains("epsilon") && viaText(0)._2.contains("theta"),
      "the batch doc's unique prose survives")
    assert(viaText(1) == ((11L, "one two three four five six", 0L)),
      "a fresh doc passes through verbatim")
    // the maintained-index form is the same operator
    val idx = TextDedup.chunkIndex(corpus, "doc_id", "text")
    val viaIndex = TextDedup.cutChunksAgainstIndex(idx, batch, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(viaText.toSeq == viaIndex.toSeq)
    // index growth is union + distinct: growing by the accepted batch
    // equals rebuilding from scratch
    val grown = idx.union(TextDedup.chunkIndex(batch, "doc_id", "text")).distinct()
    val scratch = TextDedup.chunkIndex(corpus.union(batch), "doc_id", "text")
    assert(grown.collect().map(_.getString(0)).toSet ==
      scratch.collect().map(_.getString(0)).toSet)
  }

  test("cdcDedup keeps each chunk fingerprint once corpus-wide, rebuilds in order") {
    import spark.implicits._
    // 'nu', 'gamma', 'chi' are boundary tokens (md5 leading digit 0/1), so
    // the block carries two complete interior chunks that dedup wherever
    // the block lands — the CDC self-alignment property under test
    val shared = "lambda mu nu xi omicron pi rho sigma gamma tau upsilon chi"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"epsilon zeta $shared eta theta"), // shares the interior block
      (3L, s"alpha beta $shared gamma delta")) // full duplicate of doc 1
      .toDF("doc_id", "text")
    // reference model: first occurrence by (doc_id, chunk_idx) survives
    val seen = scala.collection.mutable.Set.empty[String]
    val want = docs.collect().sortBy(_.getLong(0)).map { r =>
      val cs = modelChunks(r.getString(1))
      val kept = cs.filter { c => seen.add(md5hex(c.mkString(" "))) }
      val removed = cs.map(_.size).sum - kept.map(_.size).sum
      (r.getLong(0), kept.map(_.mkString(" ")).mkString(" "), removed.toLong)
    }
    val got = TextDedup.cdcDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq, s"dedup must equal the reference model: ${got.toSeq}")
    assert(got(2)._2 == "" && got(2)._3 > 0, "a full duplicate doc comes back empty")
    assert(got(1)._3 > 0, "the shared interior block must cost doc 2 tokens")
  }

  test("unigram LM score: common-token docs outscore rare-token soup; identical docs tie") {
    import spark.implicits._
    val toy = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "zyx qwv jkl pqr xxz vvq"), // six singleton tokens
      (4L, "the the the the the the")).toDF("doc_id", "text")
    val got = TextStats.unigramLogProb(toy, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1) == got(2), "identical documents score identically")
    assert(got(1)._1 == 6, "n_tokens is the whitespace token count")
    assert(got(4)._2 > got(1)._2 && got(1)._2 > got(3)._2,
      s"frequent tokens score above mixed above rare soup: $got")
    // hand check doc 4: N=24 corpus tokens, V=11 distinct, c(the)=10,
    // every token contributes ln((10+1)/(24+11))
    val want = math.log(11.0 / 35.0)
    assert(math.abs(got(4)._2 - want) < 1e-6, s"${got(4)._2} vs $want")
    // score is invariant to partitioning (the ordered fold, not sum order)
    val re = TextStats.unigramLogProb(toy.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.forall { case (id, (_, s)) => re(id) == s })
  }

  test("cluster-balanced sample: exact per-cell quota, covers every cell, flattens skew") {
    val got = Similarity.clusterBalancedSample(emb, "vec_id", "embedding",
      bits = 3, perCell = 5).cache()
    // recompute the cell partition the sampler used
    val planes = Similarity.hyperplanes(64, 3, 42L)
    val cells = emb.withColumn("cell",
      Similarity.lshBucket(col("embedding").cast("array<double>"), planes))
    val full = cells.groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val samp = got.groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(samp.keySet == full.keySet, "every populated cell is represented")
    samp.foreach { case (c, n) =>
      assert(n == math.min(5L, full(c)), s"cell $c quota: $n of ${full(c)}")
    }
    // the point of the op: sampled counts are flatter than the corpus's
    assert(samp.values.max - samp.values.min <= full.values.max - full.values.min)
    val again = Similarity.clusterBalancedSample(emb, "vec_id", "embedding",
      bits = 3, perCell = 5)
    assert(got.select("vec_id").except(again.select("vec_id")).isEmpty,
      "deterministic: identical reruns keep identical vectors")
    got.unpersist()
  }

  test("data card: content hash is partition-invariant and duplicate-sensitive") {
    import spark.implicits._
    def card(df: org.apache.spark.sql.DataFrame) =
      TextStats.dataCard(df, "doc_id", "text", "source").collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val a = Seq((1L, "alpha beta gamma", "s"), (2L, "delta epsilon zeta", "s"))
      .toDF("doc_id", "text", "source")
    val ca = card(a)
    assert(ca("s")._1 == 2 && ca("s")._3 == 2)
    // partitioning must not move the hash (mergeable orderless aggregate)
    assert(card(a.repartition(7)) == ca)
    // adding a COPY of an existing doc must change the hash — the xor
    // terms embed multiplicity, so even counts cannot cancel out
    val b = a.unionByName(
      Seq((3L, "alpha beta gamma", "s")).toDF("doc_id", "text", "source"))
    val cb = card(b)
    assert(cb("s")._1 == 3 && cb("s")._3 == 2, "copy adds a doc, not a fingerprint")
    assert(cb("s")._4 != ca("s")._4, "duplicate multiplicity must move the hash")
    // different content, same counts → different hash
    val c = Seq((1L, "alpha beta gamma", "s"), (2L, "other words here", "s"))
      .toDF("doc_id", "text", "source")
    assert(card(c)("s")._4 != ca("s")._4)
  }

  test("compression ratio: repetitive < prose < random, byte counts exact, deterministic") {
    import spark.implicits._
    val rep = ("spam " * 200).trim
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "wanders home through quiet autumn streets before supper ") * 10
    val rand = new scala.util.Random(42).alphanumeric.take(2000).mkString
    val df = Seq((1L, rep), (2L, prose), (3L, rand)).toDF("doc_id", "text")
    val rows = TextStats.compressionRatio(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(1)._1 == rep.getBytes("UTF-8").length.toLong,
      "n_bytes is the exact UTF-8 byte count")
    assert(rows(1)._3 < rows(2)._3 && rows(2)._3 < rows(3)._3,
      s"repetition compresses below prose below randomness: $rows")
    assert(rows(1)._3 > 0.0 && rows(3)._3 < 1.2, s"ratios stay plausible: $rows")
    val again = TextStats.compressionRatio(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows.forall { case (id, (_, _, ratio)) => again(id) == ratio },
      "the JDK deflater is deterministic for identical input")
  }

  test("prefix-filtered cross-sided near-dup pairs equal the plain postings join") {
    import graft.ext.TextDedup
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val plain = TextDedup.nearDupPairsAgainst(corpus, batch,
      "doc_id", "text", k = 3, threshold = 0.5).select("new_id", "corpus_id")
    val pref = TextDedup.nearDupPairsAgainstPrefix(corpus, batch,
      "doc_id", "text", k = 3, threshold = 0.5).select("new_id", "corpus_id")
    assert(plain.except(pref).isEmpty && pref.except(plain).isEmpty,
      "the prefix filter is exact: identical pair sets")
    assert(plain.count() == pref.count())
  }

  test("bigram LM: penalizes shuffled word order that unigram scoring cannot see") {
    import spark.implicits._
    val natural = "the cat sat on the mat"
    val shuffled = "mat the on sat cat the" // same token multiset
    val toy = Seq((1L, natural), (2L, natural), (3L, natural),
      (4L, shuffled), (5L, "solo")).toDF("doc_id", "text")
    val uni = TextStats.unigramLogProb(toy, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(4) == uni(1),
      "unigram scoring is order-blind: shuffled text ties the natural one")
    val bi = TextStats.bigramLogProb(toy, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(bi(1) == bi(2) && bi(1)._1 == 5, "identical docs tie; 6 tokens → 5 bigrams")
    assert(bi(4)._2 < bi(1)._2,
      s"rare transitions must score below the corpus-frequent order: $bi")
    assert(!bi.contains(5L), "a single-token doc has no transitions and drops")
    val re = TextStats.bigramLogProb(toy.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bi.forall { case (id, (_, s)) => re(id) == s },
      "the ordered fold makes the score partition-invariant")
  }

  test("split leakage: planted cross-boundary duplicate found, clean docs stay silent") {
    import spark.implicits._
    def nib(id: Long): Char = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      "%02x".format(d(0)).charAt(0)
    }
    val testId = (1L to 200L).find(i => "012".contains(nib(i))).get
    val trainId = (1L to 200L).find(i => !"012".contains(nib(i))).get
    val cleanId = (1L to 200L).filter(i => !"012".contains(nib(i)))
      .find(_ != trainId).get
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val toy = Seq(
      (testId, dupText),
      (trainId, dupText),
      (cleanId, "completely unrelated vocabulary occupies this document body"))
      .toDF("doc_id", "text")
    val got = TextDedup.splitLeakage(toy, "doc_id", "text", Seq("0", "1", "2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((testId, trainId, "exact"), (testId, trainId, "near")),
      s"exactly the planted pair leaks (as exact AND near): $got")
  }

  // ---- BPE tokenizer induction ----

  /** Reference Sennrich BPE on a word-frequency map: overlapping adjacent
    * pair counts, argmax with (count DESC, pair ASC), greedy left-to-right
    * non-overlapping merge. */
  private def refBpe(words: Map[String, Long], k: Int)
      : Seq[(Int, String, String, Long)] = {
    def mergeGreedy(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.result()
    }
    var vocab: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (w.toVector.map(_.toString), f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var stop = false
    while (r <= k && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) stop = true
      else {
        val ((l, rt), c) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        out += ((r, l, rt, c))
        vocab = vocab.map { case (syms, f) => (mergeGreedy(syms, l, rt), f) }
        r += 1
      }
    }
    out.toSeq
  }

  test("bpeTrain reproduces the reference Sennrich loop on the real fixture") {
    val docs = Tables.load(spark, sfDir, "documents")
    val texts = docs.select("text").collect().map(_.getString(0))
    val freqs = texts.flatMap(t => t.toLowerCase.trim.split("\\s+"))
      .filter(w => w.nonEmpty && !w.contains("|"))
      .groupBy(identity).map { case (w, a) => (w, a.length.toLong) }
    val expect = refBpe(freqs, 6)
    val got = TextStats.bpeTrain(docs, "text", 6).orderBy("merge_rank")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expect, s"distributed trainer must equal the reference loop:\n$got\nvs\n$expect")
  }

  test("bpe counts overlapping pairs but merges greedily left-to-right") {
    import spark.implicits._
    val toy = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val m = TextStats.bpeTrain(toy, "text", 2).orderBy("merge_rank").collect()
    // 'aaaa' has THREE overlapping (a,a) adjacencies but the greedy merge
    // leaves [aa, aa]; round 2 then merges (aa, aa) once
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(3)) == ("a", "a", 3L))
    assert((m(1).getString(1), m(1).getString(2), m(1).getLong(3)) == ("aa", "aa", 1L))
    val enc1 = TextStats.bpeEncode(toy, "doc_id", "text",
      TextStats.bpeTrain(toy, "text", 1)).collect()(0)
    assert(enc1.getInt(1) == 2 && enc1.getString(2) == "aa aa",
      s"one merge must yield the greedy [aa, aa] split: $enc1")
  }

  test("bpeEncode chunk-applies a >=1k-rule merge table exactly (codegen depth unbounded)") {
    import spark.implicits._
    // enrich the fixture with once-seen random words so >=1k merges exist
    // before exhaustion — random letters keep the symbol PAIRS distinct
    // across words (structured words share merges and exhaust early)
    val rng = new scala.util.Random(5)
    val extra = (0 until 250).map(i => (100000L + i,
        Vector.fill(10)(('a' + rng.nextInt(26)).toChar).mkString))
      .toDF("doc_id", "text")
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").unionByName(extra)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val freqs = texts.flatMap(_._2.toLowerCase.trim.split("\\s+"))
      .filter(w => w.nonEmpty && !w.contains("|"))
      .groupBy(identity).map { case (w, a) => (w, a.length.toLong) }
    // reference trainer, extended to also return the final word splits;
    // its merge table IS bpeTrain's on this corpus (equality proven at 6
    // rounds by the fixture test above, and re-linked at 30 below — the
    // trainer applies ONE rule per round, so its plan depth never grows
    // with the rule count; only the APPLY side needed chunking)
    def mergeGreedy(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.result()
    }
    var vocab: Map[String, Vector[String]] =
      freqs.keys.map(w => w -> w.toVector.map(_.toString)).toMap
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var r = 1
    var stop = false
    while (r <= 1100 && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, syms) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += freqs(w)
      if (counts.isEmpty) stop = true
      else {
        val ((l, rt), _) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        rules += ((r, l, rt))
        vocab = vocab.map { case (w, syms) => w -> mergeGreedy(syms, l, rt) }
        r += 1
      }
    }
    assert(rules.size >= 1000, s"corpus must sustain >=1k merges, got ${rules.size}")
    // the distributed trainer lands on the same table prefix on this corpus
    val trained = TextStats.bpeTrain(docs, "text", 30).orderBy("merge_rank")
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSeq
    assert(trained == rules.take(30).toSeq,
      "bpeTrain must agree with the reference loop on the enriched corpus")
    val mergesDf = rules.toSeq.toDF("merge_rank", "left_sym", "right_sym")
    val expect = texts.map { case (id, text) =>
      val syms = text.toLowerCase.trim.split("\\s+")
        .filter(w => w.nonEmpty && !w.contains("|"))
        .flatMap(vocab).toSeq
      id -> ((syms.length, syms.mkString(" ")))
    }.toMap
    // two DIFFERENT chunkings (5 and 12 passes) both land on the reference
    for (cs <- Seq(256, 97)) {
      val got = TextStats.bpeEncode(docs, "doc_id", "text", mergesDf, chunkSize = cs)
        .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getString(2)))).toMap
      assert(got == expect, s"chunkSize=$cs apply must equal the reference encode")
    }
  }

  test("bpeEncode is a lossless partition of each doc and shrinks with merges") {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = TextStats.bpeTrain(docs, "text", 6)
    val enc = TextStats.bpeEncode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- raw) {
      val words = text.toLowerCase.trim.split("\\s+")
        .filter(w => w.nonEmpty && !w.contains("|"))
      val (n, bpe) = enc(id)
      assert(bpe.replace(" ", "") == words.mkString(""),
        s"concatenated symbols must reproduce doc $id's characters")
      assert(n == bpe.split(" ").length)
      assert(n <= words.map(_.length).sum,
        "symbol count can never exceed character count")
    }
    // zero merges = pure character tokenization
    val none = TextStats.bpeEncode(docs, "doc_id", "text",
      TextStats.bpeTrain(docs, "text", 0))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, text) <- raw) {
      val chars = text.toLowerCase.trim.split("\\s+")
        .filter(w => w.nonEmpty && !w.contains("|")).map(_.length).sum
      assert(none(id) == chars, s"0-merge encode of doc $id must be characters")
      assert(enc(id)._1 <= none(id))
    }
    assert(enc.values.map(_._1.toLong).sum < none.values.map(_.toLong).sum,
      "6 corpus-trained merges must strictly compress the corpus")
  }

  test("hard negatives: near-dups excluded, most-similar clean vector ranks first") {
    import spark.implicits._
    val anchor = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val emb = Seq(
      (0L, anchor),
      (1L, Array(0.999f, 0.01f, 0f, 0f)),   // near-dup (cos ~1) — poison
      (2L, Array(0.4f, 0.9f, 0f, 0f)),      // similar but clean (cos ~0.41)
      (3L, Array(0.1f, 0.99f, 0f, 0f)),     // less similar
      (4L, Array(-1.0f, 0f, 0f, 0f)))       // opposite
      .toDF("vec_id", "embedding")
    val got = Similarity.hardNegatives(emb, emb.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 3, dupThreshold = 0.9)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    assert(got.map(_._1).toSeq == Seq(2L, 3L, 4L),
      s"the near-dup must be excluded and clean vectors rank by similarity: ${got.toSeq}")
    // threshold 1.01 disables the exclusion: the near-dup tops the list
    val all = Similarity.hardNegatives(emb, emb.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 1, dupThreshold = 1.01)
      .collect()(0).getLong(1)
    assert(all == 1L, "without the cut this is plain brute-force top-k")
  }

  test("length buckets: sorted batches cut padding vs arrival order, batches full") {
    import spark.implicits._
    // alternating long/short arrivals — the worst case for arrival-order
    // batching, which pads every short doc to its batch's long max
    val docs = (0L until 160L).map(id => (id, "s", if (id % 2 == 0) 100 else 10))
      .toDF("doc_id", "source", "n_tok")
    val got = TextStats.lengthBuckets(docs, "doc_id", "n_tok",
      batchSize = 8, shardCol = Some("source")).collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5)))
    assert(got.length == 160 && got.map(_._1).distinct.length == 160)
    val perBatch = got.groupBy(_._3)
    assert(perBatch.values.forall(_.length == 8), "160/8: every batch full")
    assert(got.forall { case (_, n, _, padTo, pad) => pad == padTo - n })
    val sortedPad = got.map(_._5).sum
    // arrival-order reference: batch = doc_id/8 → 4 longs + 4 shorts per
    // batch → pad = 4*90 per batch * 20 batches
    val arrivalPad = (0L until 160L).groupBy(_ / 8).values.map { b =>
      val lens = b.map(id => if (id % 2 == 0) 100 else 10)
      lens.map(lens.max - _).sum
    }.sum
    assert(sortedPad == 0 && arrivalPad == 7200,
      s"equal-length batches pad zero; arrival order pays: $sortedPad vs $arrivalPad")
  }

  test("diversity census: unique corpus maxes ratios, cloned corpus floors them") {
    import spark.implicits._
    val docs = (
      (0 until 20).map(i => (i.toLong, "cloned", "alpha beta gamma delta epsilon")) ++
      (0 until 20).map(i => (100L + i, "unique",
        s"w${i}a w${i}b w${i}c w${i}d w${i}e"))).toDF("doc_id", "source", "text")
    val got = TextStats.diversityCensus(docs, "doc_id", "text", "source", k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    val (cn, cd, cttr, csn, csd, cshd) = got("cloned")
    val (un, ud, uttr, usn, usd, ushd) = got("unique")
    assert(cn == 100 && cd == 5 && cttr == 0.05, s"cloned unigrams: ${got("cloned")}")
    assert(csn == 60 && csd == 3 && cshd == 0.05, "20 copies of 3 shingles")
    assert(un == 100 && ud == 100 && uttr == 1.0, "all-unique tokens")
    assert(usn == 60 && usd == 60 && ushd == 1.0, "all-unique shingles")
    assert(cshd < ushd && cttr < uttr)
  }

  test("contrastive triplets: best dup is the positive, negatives exclude all dups") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.05f, 0f, 0f)),   // dup of 0 (closer)
      (2L, Array(0.9f, 0.3f, 0f, 0f)),     // dup of 0 AND of 1 (farther from 0)
      (3L, Array(0.3f, 0.95f, 0f, 0f)),    // clean, somewhat similar
      (4L, Array(0f, 0f, 1f, 0f)))         // orthogonal
      .toDF("vec_id", "embedding")
    val got = Similarity.contrastiveTriplets(emb, "vec_id", "embedding",
      dupThreshold = 0.9, kNeg = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byAnchor = got.groupBy(_._1)
    // anchor 0: positive must be its CLOSEST dup (1, not 2)
    assert(byAnchor(0L).head._2 == 1L, s"closest dup is the positive: ${got.toSeq}")
    // negatives never include any of the anchor's dups
    assert(byAnchor(0L).forall(t => t._3 != 1L && t._3 != 2L && t._3 != 0L))
    // first negative of anchor 0 is the most-similar clean vector
    assert(byAnchor(0L).find(_._4 == 1).get._3 == 3L)
    // every vector in a dup pair becomes an anchor; clean vectors do not
    assert(byAnchor.keySet == Set(0L, 1L, 2L), s"anchors: ${byAnchor.keySet}")
  }

  test("chat pack: mask spans select exactly the assistant responses; turns lossless") {
    import spark.implicits._
    val turns = Seq(
      (1L, 0, "user", "hello there"),
      (1L, 1, "assistant", "hi how are you"),
      (1L, 2, "user", "good"),
      (1L, 3, "assistant", "great"))
      .toDF("conv_id", "turn_idx", "role", "turn_text")
    val got = TextStats.chatPack(turns, "conv_id", "turn_idx", "role", "turn_text")
      .collect()(0)
    val rendered = got.getString(1)
    val mask = got.getString(2)
    assert(rendered ==
      "<|user|>hello there<|assistant|>hi how are you<|user|>good<|assistant|>great")
    val spans = mask.split(";").map { sp =>
      val Array(a, b) = sp.split(":"); (a.toInt, b.toInt)
    }
    assert(spans.map { case (a, b) => rendered.substring(a, b) }.toSeq ==
      Seq("hi how are you", "great"),
      s"the mask must recover exactly the responses: $mask")
    assert(got.getInt(3) == rendered.length)
    // chatTurns is a lossless partition of the token stream
    val docs = Tables.load(spark, sfDir, "documents")
    val t4 = TextStats.chatTurns(docs, "doc_id", "text", turns = 4)
    val joined = t4.groupBy("conv_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("turn_idx"), col("turn_text")))),
        x => x.getField("turn_text")), " ").as("re"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.trim
        .split("\\s+").mkString(" ")).toMap
    assert(raw.forall { case (id, s) => joined(id) == s },
      "concatenated turns must reproduce every doc's token stream")
  }

  test("cleanText: strips invisibles, collapses whitespace, idempotent") {
    import spark.implicits._
    val dirty = Seq(
      (1L, "a\u200bb\u200cc\u200dd\ufeffe"),    // zero-widths vanish
      (2L, "x\u0001y\u0007z\u007fw"),            // controls vanish
      (3L, "  a\t\tb\n\nc\r\n d  "),          // runs collapse, ends trim
      (4L, "a\u000bb"),                          // \x0B strips (RE2 \s gap)
      (5L, "already clean text"))
      .toDF("doc_id", "text")
    val got = dirty.select(col("doc_id"), TextStats.cleanText(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "abcde", s"zero-widths: ${got(1L)}")
    assert(got(2L) == "xyzw", s"controls: ${got(2L)}")
    assert(got(3L) == "a b c d", s"whitespace: '${got(3L)}'")
    assert(got(4L) == "ab", s"vertical tab: '${got(4L)}'")
    assert(got(5L) == "already clean text")
    // idempotence: cleaning a cleaned corpus is the identity
    val twice = dirty.select(col("doc_id"),
      TextStats.cleanText(TextStats.cleanText(col("text"))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice == got, "cleanText must be idempotent")
  }

  test("pmi collocations: association beats co-frequency, min-count kills rare pairs") {
    import spark.implicits._
    // frequency-CONTROLLED design (PMI rewards rarity, so compare pairs
    // whose words are equally frequent): aa/bb are always adjacent,
    // cc/dd adjacent in only half the docs — every word appears exactly
    // once per doc. 'rare pair' appears once and must be floored.
    val docs = ((0 until 30).map { i =>
      val text = if (i % 2 == 0) "aa bb pad cc dd qq" else "aa bb pad cc qq dd"
      (i.toLong, text)
    } :+ (99L, "rare pair")).toDF("doc_id", "text")
    val top = TextStats.pmiCollocations(docs, "doc_id", "text",
      minCount = 5, topK = 20).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    val m = top.toMap
    assert(m(("aa", "bb"))._1 == 30L && m(("cc", "dd"))._1 == 15L)
    assert(m(("aa", "bb"))._2 > m(("cc", "dd"))._2,
      s"with equal word frequencies, the stronger association must score higher: $m")
    assert(!m.contains(("rare", "pair")),
      "a once-seen pair must be killed by the min-count floor")
    // exact value: ln(c12·N1² / (N12·c1·c2)) with N1 = 30·6+2 = 182,
    // N12 = 30·5+1 = 151, c12=30, c1=c2=30 — engine-independent replay
    val expect = BigDecimal(math.log(30.0 * 182 * 182 / (151.0 * 30 * 30)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(("aa", "bb"))._2 == expect,
      s"PMI must equal the closed form: ${m(("aa", "bb"))._2} vs $expect")
  }

  test("char entropy: exact on known distributions, orders soup > prose > runs") {
    import spark.implicits._
    val toy = Seq(
      (1L, "aaaaaaaa"),                    // single symbol: 0 nats
      (2L, "abababab"),                    // two equiprobable: ln 2
      (3L, "the cat sat on the mat here"), // natural text
      (4L, "qzjxkvbwpfygmdhcl urnotiase")) // alphabet soup
      .toDF("doc_id", "text")
    val e = TextStats.charEntropy(toy, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(e(1L) == 0.0)
    assert(math.abs(e(2L) - math.log(2)) < 1e-6, s"ln2 expected: ${e(2L)}")
    assert(e(1L) < e(3L) && e(3L) < e(4L),
      s"runs < prose < soup must hold: $e")
    // 27 distinct chars each once: exactly ln 27 (the distribution max)
    assert(math.abs(e(4L) - math.log(27)) < 1e-6)
  }

  test("FFD packing: budget-bounded, lossless, fewer bins than next-fit, invariant") {
    import spark.implicits._
    // adversarial for whole-doc next-fit: every shard sees all its sixes
    // before any four (a six never pairs with a six under budget 10)
    val docs = (0L until 400L)
      .map(id => (id, "s" + (id % 4), if (id < 200) 6L else 4L))
      .toDF("doc_id", "source", "n_tok")
    val ffd = TextStats.packSequencesFFD(docs, "doc_id", "n_tok",
      budget = 10L, shardCol = Some("source"))
    val rows = ffd.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).distinct.length == 400, "every doc packed exactly once")
    val perBin = rows.groupBy(t => (t._1, t._4)).values
    assert(perBin.forall(_.map(_._3).sum <= 10L), "no bin exceeds the budget")
    // whole-doc next-fit reference in arrival order: 50 solo sixes, then
    // 25 paired-four bins = 75 bins; FFD pairs every 6 with a 4 → 50
    val s0 = rows.filter(_._1 == "s0")
    val nfBins = s0.sortBy(_._2).foldLeft((0, 0L)) { case ((bins, room), (_, _, tok, _)) =>
      if (tok <= room) (bins, room - tok) else (bins + 1, 10L - tok)
    }._1
    val ffdBins = s0.map(_._4).distinct.length
    assert(nfBins == 75 && ffdBins == 50,
      s"FFD must beat arrival-order next-fit: $ffdBins vs $nfBins")
    // partition invariance
    val re = TextStats.packSequencesFFD(docs.repartition(13), "doc_id", "n_tok",
      budget = 10L, shardCol = Some("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(re == rows.toSet, "assignments must not depend on input partitioning")
    // an oversized doc opens its own overfull bin and poisons nothing
    val over = TextStats.packSequencesFFD(
      Seq((1L, 50L), (2L, 6L), (3L, 4L)).toDF("doc_id", "n_tok"),
      "doc_id", "n_tok", budget = 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(over(1L) != over(2L) && over(2L) == over(3L),
      s"oversized solo, small docs still pair: $over")
  }

  test("moore-lewis: hand-computed scores on a toy corpus; target docs score higher on the fixture") {
    import spark.implicits._
    // vocab {x, y}; target slice = doc 1. cb: x=2,y=2, nb=4, V=2; ct: x=2, nt=2
    val toy = Seq((1L, "x x", "en"), (2L, "y y", "de")).toDF("doc_id", "text", "lang")
    val got = TextStats.mooreLewisScore(toy, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // doc1: lp_t = ln(3/4), lp_b = ln(1/2), ml = ln(3/2)
    assert(math.abs(got(1L)._1 - math.log(0.75)) < 1e-6)
    assert(math.abs(got(1L)._2 - math.log(0.5)) < 1e-6)
    assert(math.abs(got(1L)._3 - math.log(1.5)) < 1e-6)
    // doc2's y never occurs in the target slice: backoff lp_t = ln(1/4)
    assert(math.abs(got(2L)._1 - math.log(0.25)) < 1e-6)
    assert(math.abs(got(2L)._3 - math.log(0.5)) < 1e-6)
    // on the fixture, English docs must out-score non-English on average —
    // the selection property the method exists for
    val scored = TextStats.mooreLewisScore(docs, "doc_id", "text",
        col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("ml_score").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(scored(true) > scored(false),
      s"en mean ${scored(true)} must exceed non-en mean ${scored(false)}")
    // partition invariance of the ordered fold
    val a = TextStats.mooreLewisScore(docs, "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id").collect().toSeq
    val b = TextStats.mooreLewisScore(docs.repartition(7), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("kneser-ney: exact toy probabilities, per-history mass sums to 1, finite on the fixture") {
    import spark.implicits._
    // corpus: (a,b)x2, (a,c)x1 → P(b|a) = (2-.75)/3 + .75*(2/3)*(1/2) = 2/3,
    // P(c|a) = (1-.75)/3 + .75*(2/3)*(1/2) = 1/3 — they sum to 1 exactly,
    // the mass-conservation property interpolated KN guarantees
    val toy = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = TextStats.kneserNeyBigram(toy, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(got(1L) - math.log(2.0 / 3)) < 1e-6)
    assert(math.abs(got(2L) - math.log(2.0 / 3)) < 1e-6)
    assert(math.abs(got(3L) - math.log(1.0 / 3)) < 1e-6)
    // fixture: every score strictly negative and finite (P in (0,1)),
    // every doc with >=2 tokens present
    val f = TextStats.kneserNeyBigram(docs, "doc_id", "text").cache()
    val bad = f.filter(col("avg_logprob") >= 0 || isnan(col("avg_logprob")) ||
      col("avg_logprob") === Double.NegativeInfinity).count()
    assert(bad == 0)
    assert(f.count() == docs.filter(size(TextStats.tokens(col("text"))) >= 2).count())
    f.unpersist()
  }

  test("quality classifier: GD reduces loss, separates the labeled slice, sum path == fold path") {
    val label = col("lang") === "en"
    def loss(m: TextStats.TextClassifierModel): Double = {
      val s = TextStats.scoreTextClassifier(docs, "doc_id", "text", m)
        .join(docs.select(col("doc_id"), label.cast("double").as("y")), "doc_id")
      s.select(avg(-(col("y") * log(col("score")) +
          (lit(1.0) - col("y")) * log(lit(1.0) - col("score")))))
        .collect()(0).getDouble(0)
    }
    def train(steps: Int, det: Boolean) =
      TextStats.trainTextClassifier(docs, "doc_id", "text", label,
        buckets = 64, steps = steps, lr = 0.5, deterministic = det)
    val m1 = train(1, det = false)
    val m6 = train(6, det = false)
    val (l0, l1, l6) = (math.log(2.0), loss(m1), loss(m6)) // loss at w=0 is ln 2
    assert(l1 < l0 && l6 < l1, s"GD must descend: $l0 -> $l1 -> $l6")
    // separation: the positive slice scores higher on average
    val ms = TextStats.scoreTextClassifier(docs, "doc_id", "text", m6)
      .join(docs.select(col("doc_id"), label.as("en")), "doc_id")
      .groupBy("en").agg(avg("score").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(ms(true) > ms(false),
      s"positive-slice mean ${ms(true)} must exceed ${ms(false)}")
    // the scale path (plain sums) and the oracle path (ordered folds)
    // train the same model to ~ulp: scores agree far inside the 6 dp gate
    val det = train(6, det = true)
    val a = TextStats.scoreTextClassifier(docs, "doc_id", "text", m6)
      .orderBy("doc_id").collect().map(_.getDouble(1))
    val b = TextStats.scoreTextClassifier(docs, "doc_id", "text", det,
        deterministic = true)
      .orderBy("doc_id").collect().map(_.getDouble(1))
    assert(a.length == b.length &&
      a.zip(b).forall { case (x, yv) => math.abs(x - yv) < 1e-9 })
    assert(m6.weights.length == 64)
  }

  test("leak-proof split: zero cross-split near-dups by construction where the doc split leaks") {
    val split = TextDedup.leakProofSplit(docs, "doc_id", "text", Seq("0", "1"))
      .cache()
    assert(split.count() == docs.count(), "every doc gets an assignment")
    assert(split.select("split").distinct().count() == 2,
      "both splits populated on the fixture")
    val pairs = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .cache()
    assert(!pairs.isEmpty, "fixture must contain near-dups for this to bite")
    def leaks(asg: org.apache.spark.sql.DataFrame): Long = pairs
      .join(asg.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(asg.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(leaks(split) == 0, "cluster-keyed split must never separate near-dups")
    // the same hex gate applied per-DOC does leak on the planted-dup fixture
    val naive = docs.select(col("doc_id"),
      when(substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"),
        "test").otherwise("train").as("split"))
    assert(leaks(naive) > 0,
      "per-doc hash split must leak here, or the fixture lost its planted dups")
    // cluster-mates always share a split (the invariant the gate hashes on)
    val mixed = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(mixed == 0)
    split.unpersist(); pairs.unpersist()
    // a non-numeric id column fails LOUDLY (a silent null-cast would put
    // every singleton in 'train' and skew the split invisibly)
    val e = intercept[IllegalArgumentException] {
      TextDedup.leakProofSplit(
        docs.withColumn("doc_id", concat(lit("doc-"), col("doc_id"))),
        "doc_id", "text", Seq("0", "1"))
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("preference pairs: per-group argmax vs argmin with margin, singletons emit nothing") {
    import spark.implicits._
    val scored = Seq(
      ("g1", 1L, 0.9), ("g1", 2L, 0.2), ("g1", 3L, 0.5),
      ("g2", 4L, 0.4),                       // singleton: no pair
      ("g3", 5L, 0.7), ("g3", 6L, 0.7))      // tie: id-ordered, still a pair
      .toDF("grp", "id", "s")
    val got = TextStats.preferencePairs(scored, "grp", "id", "s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getDouble(5))).sortBy(_._1)
    assert(got.toSeq == Seq(("g1", 1L, 2L, 0.7), ("g3", 5L, 6L, 0.0)))
    // fixture composition: chosen always outscores (or ties) rejected
    val m = TextStats.trainTextClassifier(docs, "doc_id", "text",
      col("lang") === "en", buckets = 64, steps = 3, lr = 0.5)
    val sc = TextStats.scoreTextClassifier(docs, "doc_id", "text", m)
      .join(docs.select("doc_id", "source"), "doc_id")
      .withColumn("score", round(col("score"), 6))
    val pp = TextStats.preferencePairs(sc, "source", "doc_id", "score")
    assert(pp.filter(col("margin") < 0).count() == 0 && pp.count() > 0)
  }

  test("winnowing: coverage guarantee, density band, shared-run detection") {
    import spark.implicits._
    val fp = TextDedup.winnowFingerprints(docs, "doc_id", "text", k = 3,
      window = 4).cache()
    // the winnowing guarantee: EVERY window of 4 consecutive k-gram
    // positions contains a selected fingerprint (checked per doc against
    // the true k-gram count)
    val nkg = docs.select(col("doc_id"),
        (size(TextStats.tokens(col("text"))) - 2).as("n"))
      .filter(col("n") >= 1)
    val sel = fp.groupBy("doc_id")
      .agg(collect_list("pos").as("ps"), count(lit(1)).as("nsel"))
      .join(nkg, "doc_id")
      .collect()
    sel.foreach { r =>
      val ps = r.getSeq[Int](1).toSet
      val n = r.getInt(3)
      (0 to math.max(0, n - 4)).foreach { s =>
        assert((s until math.min(s + 4, n)).exists(ps.contains),
          s"doc ${r.getLong(0)}: window at $s has no fingerprint")
      }
      // density: never more than one per position, and the 2/(w+1)
      // expectation keeps the sketch a bounded fraction of the stream
      assert(r.getLong(2) <= n)
    }
    val dens = fp.count().toDouble /
      nkg.agg(sum("n")).collect()(0).getLong(0).toDouble
    assert(dens > 0.2 && dens < 0.6, s"density $dens outside the 2/(w+1) band")
    // detection guarantee: docs sharing a run of >= w + k - 1 = 6 tokens
    // share a selected fingerprint
    val toy = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii"),
      (2L, "zz yy cc dd ee ff gg hh xx")).toDF("doc_id", "text")
    val tf = TextDedup.winnowFingerprints(toy, "doc_id", "text", 3, 4)
    val shared = tf.filter(col("doc_id") === 1).select("h")
      .intersect(tf.filter(col("doc_id") === 2).select("h")).count()
    assert(shared >= 1, "a 6-token shared run must share a fingerprint")
    fp.unpersist()
  }

  test("jl projection: norm preservation in expectation, near-dups stay near, deterministic") {
    val proj = Similarity.randomProjection(emb, "vec_id", "embedding",
      outDim = 8).cache()
    assert(proj.select(size(col("proj"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))
    // E||y||^2 = ||x||^2 with unit-variance entries / sqrt(k): the mean
    // ratio over 2000 vectors concentrates near 1
    val ratio = proj.join(emb, "vec_id")
      .select((aggregate(col("proj"), lit(0.0), (a, x) => a + x * x) /
        aggregate(col("embedding"),
          lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")))
        .as("r"))
      .agg(avg("r")).collect()(0).getDouble(0)
    assert(math.abs(ratio - 1.0) < 0.1, s"mean norm ratio $ratio should be ~1")
    // planted near-dups stay nearer in the projection than random pairs
    val pd = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b")
    assert(!pd.isEmpty, "fixture must contain embedding near-dups")
    def projDist(pairs: org.apache.spark.sql.DataFrame): Double = pairs
      .join(proj.select(col("vec_id").as("id_a"), col("proj").as("pa")), "id_a")
      .join(proj.select(col("vec_id").as("id_b"), col("proj").as("pb")), "id_b")
      .select(aggregate(zip_with(col("pa"), col("pb"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (a, x) => a + x).as("d2"))
      .agg(avg("d2")).collect()(0).getDouble(0)
    val rand = emb.select(col("vec_id").as("id_a")).limit(50)
      .crossJoin(emb.select(col("vec_id").as("id_b")).limit(50))
      .filter(col("id_a") < col("id_b"))
    assert(projDist(pd) < projDist(rand),
      "planted high-cosine pairs must be closer in the projection")
    val again = Similarity.randomProjection(emb.repartition(7), "vec_id",
      "embedding", outDim = 8)
    assert(proj.orderBy("vec_id").collect().toSeq ==
      again.orderBy("vec_id").collect().toSeq)
    proj.unpersist()
  }

  test("calibration report: perfect-calibration identity, full partition, ordered means") {
    import spark.implicits._
    // 10 score levels x 10 rows, exactly k positives at score k/10:
    // a perfectly calibrated scorer, so mean_score == frac_pos per bin
    val toy = (0 until 10).flatMap(k => (0 until 10).map(i =>
      (k * 10L + i, k / 10.0, if (i < k) 1.0 else 0.0)))
      .toDF("id", "score", "label")
    val rep = TextStats.calibrationReport(toy, "id", "label", "score")
      .orderBy("bin").collect()
    assert(rep.map(_.getLong(1)).sum == 100, "bins partition the frame")
    rep.foreach(r => assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9,
      s"perfectly calibrated input: mean==frac in bin ${r.getInt(0)}"))
    val means = rep.map(_.getDouble(2))
    assert(means.sameElements(means.sorted), "score-ordered bins")
    // fixture classifier: the top score bin must be purer in positives
    // than the bottom one (better than random)
    val m = TextStats.trainTextClassifier(docs, "doc_id", "text",
      col("lang") === "en", buckets = 64, steps = 6, lr = 0.5)
    val sc = TextStats.scoreTextClassifier(docs, "doc_id", "text", m)
      .join(docs.select(col("doc_id"),
        (col("lang") === "en").cast("double").as("label")), "doc_id")
    val f = TextStats.calibrationReport(sc, "doc_id", "label", "score")
      .orderBy("bin").collect()
    assert(f.last.getDouble(3) > f.head.getDouble(3),
      "top score bin should hold more positives than the bottom bin")
  }

  test("feature-label MI: zero under a constant label, maximal on a perfect marker, nonnegative") {
    import spark.implicits._
    val mi0 = TextStats.featureLabelMI(docs, "doc_id", "text", lit(false),
      buckets = 64)
    assert(mi0.filter(abs(col("mi")) > 1e-12).count() == 0,
      "a constant label carries no information about any feature")
    // 'zzmarker' appears iff label: its bucket's MI is the full label
    // entropy H(y); unrelated tokens carry ~0
    val toy = (0 until 40).map(i =>
      (i.toLong, if (i < 10) "zzmarker common words here"
                 else "common words here", i < 10))
      .toDF("doc_id", "text", "is_pos")
    val mi = TextStats.featureLabelMI(toy, "doc_id", "text", col("is_pos"),
      buckets = 256)
    val p = 0.25
    val hy = -p * math.log(p) - (1 - p) * math.log(1 - p)
    val top = mi.orderBy(col("mi").desc).limit(1).collect()(0).getDouble(2)
    assert(math.abs(top - hy) < 1e-9,
      s"perfect marker MI $top must equal label entropy $hy")
    assert(mi.filter(col("mi") < -1e-9).count() == 0, "MI is nonnegative")
  }

  test("doremi mix: underserved domains gain weight, excess spread contracts, weights sum to 1") {
    import spark.implicits._
    // two disjoint-vocab domains, 9:1 in size: the uniform-start mixture
    // is dominated by A, so B's excess loss is larger and its weight
    // must RISE — the exponentiated update doing its one job
    val toy = ((0 until 90).map(i => (i.toLong, "aa bb cc", "A")) ++
      (0 until 10).map(i => (100L + i, "xx yy zz", "B")))
      .toDF("doc_id", "text", "src")
    def run(rounds: Int) = TextStats.doremiMix(toy, "doc_id", "text", "src",
        rounds = rounds)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val m = run(4)
    assert(m("B")._1 > m("A")._1,
      s"the underserved domain must out-weight the dominant one: $m")
    assert(math.abs(m.values.map(_._1).sum - 1.0) < 1e-12)
    // the fixed point BALANCES excess loss: more rounds, tighter spread
    def spread(mm: Map[String, (Double, Double)]) =
      math.abs(mm("A")._2 - mm("B")._2)
    assert(spread(run(8)) < spread(run(1)),
      "iterating must contract the excess-loss gap")
    // fixture: a proper distribution over all 20 sources, deterministic
    val f = TextStats.doremiMix(docs, "doc_id", "text", "source", rounds = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(f.size == 20 && f.values.forall(_ > 0) &&
      math.abs(f.values.sum - 1.0) < 1e-12)
    val again = TextStats.doremiMix(docs.repartition(7), "doc_id", "text",
        "source", rounds = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(f == again, "driver-state training must be partition-invariant")
  }

  test("bpeTrain is partition-invariant and delimiter words are excluded") {
    import spark.implicits._
    val toy = Seq((1L, "banana bandana"), (2L, "banana x|y"),
      (3L, "bandana banana")).toDF("doc_id", "text")
    val a = TextStats.bpeTrain(toy, "text", 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val b = TextStats.bpeTrain(toy.repartition(7), "text", 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(a == b, "merge table must not depend on partitioning")
    val enc = TextStats.bpeEncode(toy, "doc_id", "text",
      TextStats.bpeTrain(toy, "text", 4)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(!enc(2L).replace(" ", "").contains("|"),
      "delimiter-carrying words are excluded from the encode output")
  }

}
