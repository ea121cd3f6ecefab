package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Streams
import graft.sources.Tables

class StreamingSpec extends SparkSpecBase {

  private lazy val events = Tables.events(spark, sfDir)
    .select("event_id", "ts", "user_id", "event_type", "value").cache()

  test("streaming tumbling agg over bounded input equals the batch twin") {
    // stage decoded events as a parquet stream source
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    events.write.mode("overwrite").parquet(dir)
    val schema = events.schema
    val got = Streams.runToMemory(spark, schema, dir, "tumbling_out",
      df => Streams.tumblingCounts(df, "1 hour", "10 minutes"),
      org.apache.spark.sql.streaming.OutputMode.Append())
    val expected = Streams.tumblingCountsBatch(events, "1 hour")
    // watermark append-mode may hold back the final (max-ts) windows; all
    // emitted windows must match the batch result exactly
    val g = got.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
    val e = expected.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
    assert(g.subsetOf(e))
    assert(g.size >= e.size - 10, s"emitted ${g.size} of ${e.size} windows")
  }

  test("streaming sliding agg over bounded input equals the batch twin") {
    val dir = java.nio.file.Files.createTempDirectory("graft_slide").toString
    events.write.mode("overwrite").parquet(dir)
    val got = Streams.runToMemory(spark, events.schema, dir, "sliding_out",
      df => Streams.slidingCounts(df, "1 hour", "15 minutes", "10 minutes"),
      org.apache.spark.sql.streaming.OutputMode.Append())
    val expected = Streams.slidingCountsBatch(events, "1 hour", "15 minutes")
    val g = got.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val e = expected.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(g.subsetOf(e), "emitted sliding windows must match the batch twin")
    assert(g.size >= e.size - 40, s"emitted ${g.size} of ${e.size} windows")
  }

  test("streaming ingest screen: evolving bloom index catches cross-micro-batch redelivery") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val srcDir = s"$base/src"; val outPath = s"$base/out"
    val corpus = Seq(
      (1L, "settled corpus document about alpha beta gamma topics"),
      (2L, "another settled document covering delta epsilon zeta"))
      .toDF("doc_id", "text")
    // one parquet file per micro-batch (maxFilesPerTrigger=1):
    // batch 1: a corpus dup + fresh docA; batch 2: docA REDELIVERED + fresh docB
    val b1 = Seq(
      (10L, "settled corpus document about alpha beta gamma topics"),
      (11L, "fresh document alpha arriving in the first micro batch"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (12L, "fresh document alpha arriving in the first micro batch"),
      (13L, "fresh document beta arriving in the second micro batch"))
      .toDF("doc_id", "text")
    b1.coalesce(1).write.mode("overwrite").parquet(srcDir)
    b2.coalesce(1).write.mode("append").parquet(srcDir)
    Streams.ingestScreenStream(spark, b1.schema, srcDir, corpus,
      "doc_id", "text", outPath)
    val verdicts = spark.read.parquet(s"$outPath/verdicts")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(verdicts == Map(
      10L -> true,  // corpus duplicate
      11L -> false, // fresh on arrival
      12L -> true,  // caught ONLY because the index absorbed batch 1
      13L -> false),
      s"evolving index must flag the redelivered doc, got $verdicts")
    // accepted set = the fresh fingerprints, deduplicated across batches
    assert(spark.read.parquet(s"$outPath/accepted_fps").distinct().count() == 2)
  }

  test("state-store dedup stream (corpus-seeded initial state) equals the batch twin") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 400)
    // the fixture's 400+ docs are all fresh — plant both reject paths:
    // 9400 redelivers a CORPUS text, 9500 redelivers a STREAM text (and
    // lands in the second micro-batch, so it must hit cross-batch state)
    val planted = corpus.filter(col("doc_id") === 5)
      .select(lit(9400L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") === 400)
        .select(lit(9500L).as("doc_id"), col("text")))
    val stream = docs.filter(col("doc_id") >= 400).unionByName(planted)
    // initial state = the settled corpus's fingerprint owners
    val initial = corpus
      .groupBy(graft.ext.TextStats.fingerprintMd5(col("text")).as("fingerprint"))
      .agg(min("doc_id").as("owner_id"))
    // two id-ascending micro-batches (file mod times force the order)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_st6").toString
    stream.filter(col("doc_id") < 450).coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    new java.io.File(srcDir).listFiles().foreach(_.setLastModified(1000000L))
    stream.filter(col("doc_id") >= 450).coalesce(1)
      .write.mode("append").parquet(srcDir)
    new java.io.File(srcDir).listFiles()
      .filter(_.lastModified() != 1000000L).foreach(_.setLastModified(2000000L))
    val in = spark.readStream.schema(stream.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = Streams.dedupStateStream(in, "doc_id", "text", initial)
      .writeStream.format("memory").queryName("st6_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("st6_out")
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    val expect = Streams.dedupStateBatch(stream, "doc_id", "text", corpus, "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(got.size == 102 && got == expect,
      "stream decisions must equal the batch min-id/anti-corpus rule")
    // the fixture plants both reject paths: corpus dups and in-stream dups
    assert(got.values.exists(!_), "some stream doc must be rejected")
    assert(got.values.exists(identity), "some stream doc must be accepted")
  }

  test("foreachBatch streaming upsert converges to batch merge result") {
    val base = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val srcDir = s"$base/src"
    val target = s"$base/target"
    // batch 1: events before the 20th; start the stream over it
    val ev = events
    ev.filter(col("ts") < lit("2024-01-20").cast("timestamp"))
      .write.mode("overwrite").parquet(srcDir)
    Streams.incrementalUpsertStream(spark, ev.schema, srcDir, target,
      Seq("event_id"), "ts")
    val n1 = spark.read.parquet(target).count()
    // batch 2: overlapping re-extraction (19th onward) lands as new files
    ev.filter(col("ts") >= lit("2024-01-19").cast("timestamp"))
      .write.mode("append").parquet(srcDir)
    Streams.incrementalUpsertStream(spark, ev.schema, srcDir, target,
      Seq("event_id"), "ts")
    val finalCount = spark.read.parquet(target).count()
    assert(finalCount == ev.count(), s"upsert converges: $finalCount")
    assert(n1 < finalCount)
  }

  test("mapGroupsWithState sessionization matches batch aggregation") {
    import spark.implicits._
    val ds = events.as[Streams.Event]
    val sessions = Streams.userSessions(ds).collect().map(s => s.user_id -> s).toMap
    val batch = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))))
    batch.foreach { case (uid, (n, first, last)) =>
      val s = sessions(uid)
      assert(s.n_events == n && s.first_ts == first && s.last_ts == last)
    }
  }
  test("watermarked streaming dedup equals batch distinct-by-key") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    // plant exact duplicates: the same events written twice
    events.write.mode("overwrite").parquet(dir)
    events.write.mode("append").parquet(dir)
    val got = Streams.runToMemory(spark, events.schema, dir, "dedup_out",
      df => Streams.dedupStream(df, Seq("event_id"), "2 hours"))
    assert(got.count() == events.count(),
      "every duplicated event id must surface exactly once")
    assert(got.select("event_id").distinct().count() == events.count())
  }

  test("watermark dedup: horizon duplicates drop, state is evicted beyond it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_wmdedup").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def file(rows: (Long, java.sql.Timestamp)*): Unit = {
      rows.toSeq.toDF("event_id", "ts").coalesce(1)
        .write.mode("append").parquet(dir)
      Thread.sleep(1100) // distinct mtimes -> deterministic batch order
    }
    // batch 1: first occurrence. batch 2: a retry INSIDE the 2h horizon
    // (must drop) plus an unrelated event 10h later (advances watermark).
    // batch 3: another event while the advanced watermark evicts expired
    // state (eviction lags one batch behind the watermark update).
    // batch 4: the same id re-delivered at +10h — state long evicted, so
    // it SURFACES: bounded state trades eternal dedup for horizon dedup,
    // by design.
    file(1L -> ts("2024-01-01 00:00:00"))
    file(1L -> ts("2024-01-01 00:30:00"), 2L -> ts("2024-01-01 10:00:00"))
    file(3L -> ts("2024-01-01 10:30:00"))
    file(1L -> ts("2024-01-01 10:00:00"))
    val schema = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("event_id", "ts").schema
    val in = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Streams.dedupStream(in, Seq("event_id"), "2 hours")
      .writeStream.format("memory").queryName("wm_dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("wm_dedup_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(got == Set(
      (1L, "2024-01-01 00:00:00.0"),   // first occurrence
      (2L, "2024-01-01 10:00:00.0"),   // unrelated; pushes the watermark
      (3L, "2024-01-01 10:30:00.0"),   // rides the eviction batch
      (1L, "2024-01-01 10:00:00.0")),  // beyond horizon: state evicted
      s"horizon semantics violated: $got")
  }

  test("flatMapGroupsWithState finalizes a session once when the watermark passes its gap") {
    import spark.implicits._
    import graft.streaming.Streams.Event
    val dir = java.nio.file.Files.createTempDirectory("graft_finalsess").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def file(rows: Event*): Unit = {
      rows.toSeq.toDF().coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100) // distinct mtimes -> deterministic batch order
    }
    // batch 1: two users' sessions. batch 2: a far-future event advances
    // the watermark past both sessions' (last_ts + gap). batch 3: timeout
    // processing fires on the trigger AFTER the watermark update, flushing
    // both finalized sessions exactly once; user 9's session stays open
    // (and unemitted) because nothing outlasts ITS gap.
    file(Event(1L, ts("2024-01-01 00:00:00"), 1L, "view", 2.0),
      Event(2L, ts("2024-01-01 00:10:00"), 1L, "buy", 3.0),
      Event(3L, ts("2024-01-01 00:05:00"), 7L, "view", 5.0))
    file(Event(4L, ts("2024-01-01 12:00:00"), 9L, "view", 1.0))
    file(Event(5L, ts("2024-01-01 12:01:00"), 9L, "view", 1.0))
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    val in = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(dir).as[Event]
    val q = Streams.finalizedSessions(in, gapMinutes = 30, watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName("final_sessions")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("final_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3).toString, r.getTimestamp(4).toString)).toSet
    assert(got == Set(
      (1L, 2L, 5.0, "2024-01-01 00:00:00.0", "2024-01-01 00:10:00.0"),
      (7L, 1L, 5.0, "2024-01-01 00:05:00.0", "2024-01-01 00:05:00.0")),
      s"finalized sessions wrong: $got")
  }

  test("streaming medallion chain: dedup then windowed agg equals the batch twin") {
    // the streaming face of bronze->silver->gold in ONE query: watermarked
    // exact dedup (silver) chained into a tumbling event-time aggregation
    // (gold) — two stateful operators back to back, both watermark-bounded
    val dir = java.nio.file.Files.createTempDirectory("graft_medallion").toString
    val dirty = events.unionAll(events.orderBy("event_id").limit(500)) // planted dups
    dirty.write.mode("overwrite").parquet(dir)
    // dedupStream owns the (single) watermark; the downstream aggregation
    // reuses it, so the batch-shaped agg chains on unchanged — redefining
    // the watermark between stateful operators is disallowed
    val got = Streams.runToMemory(spark, events.schema, dir, "medallion_out",
      df => Streams.tumblingCountsBatch(
        Streams.dedupStream(df, Seq("event_id"), "10 minutes"), "1 hour"),
      org.apache.spark.sql.streaming.OutputMode.Append())
    val expected = Streams.tumblingCountsBatch(events, "1 hour") // batch silver = exact rows
    val g = got.collect().map(r =>
      (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
    val e = expected.collect().map(r =>
      (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDecimal(3))).toSet
    assert(g.subsetOf(e),
      "every emitted window must equal the deduped batch twin (dups removed upstream)")
    assert(g.size >= e.size - 10, s"emitted ${g.size} of ${e.size} windows")
  }

  test("stream-static enrichment joins a dimension into each micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_enrich").toString
    events.write.mode("overwrite").parquet(dir)
    val dim = events.groupBy("user_id").count().withColumnRenamed("count", "user_events")
    val got = Streams.runToMemory(spark, events.schema, dir, "enrich_out",
      df => Streams.enrichStream(df, dim, Seq("user_id")))
    assert(got.count() == events.count())
    assert(got.filter(col("user_events").isNull).count() == 0,
      "every event's user exists in the static dim")
  }

  test("watermarked stream-stream join equals the batch twin") {
    val base = java.nio.file.Files.createTempDirectory("graft_ss").toString
    val lDir = s"$base/l"; val rDir = s"$base/r"
    val purchases = events.filter(col("event_type") === "purchase")
    purchases.write.mode("overwrite").parquet(lDir)
    events.write.mode("overwrite").parquet(rDir)
    val schema = events.schema
    val lStream = spark.readStream.schema(schema).parquet(lDir)
    val rStream = spark.readStream.schema(schema).parquet(rDir)
    val q = Streams.joinStreams(lStream, rStream, "user_id", "1 hour", "2 hours")
      .select("event_id", "r_event_id")
      .writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ss_join_out").count()
    val expected = Streams.joinStreams(purchases, events, "user_id", "1 hour", "2 hours")
      .count()
    assert(got == expected, s"stream $got vs batch $expected")
    assert(expected > 0, "fixture must produce matches")
  }

  test("left-outer stream-stream join emits unmatched rows null-padded on watermark") {
    val base = java.nio.file.Files.createTempDirectory("graft_sslo").toString
    val lDir = s"$base/l"; val rDir = s"$base/r"
    // scale-free split: all purchases vs clicks of the lower half of the
    // user domain — upper-half purchases can never match and must
    // surface null-padded
    val half = events.agg(max("user_id")).head().getLong(0) / 2
    val purchases = events.filter(col("event_type") === "purchase")
    val clicks = events.filter(col("event_type") === "click" && col("user_id") < half)
    purchases.write.mode("overwrite").parquet(lDir)
    clicks.write.mode("overwrite").parquet(rDir)
    val schema = events.schema
    val q = Streams.joinStreams(
        spark.readStream.schema(schema).parquet(lDir),
        spark.readStream.schema(schema).parquet(rDir),
        "user_id", "1 hour", "2 hours", joinType = "left_outer")
      .select("event_id", "r_event_id")
      .writeStream.format("memory").queryName("ss_lojoin_out")
      .outputMode("append").start()
    q.processAllAvailable()
    // unmatched rows emit only once the watermark PROVES no partner can
    // arrive; a far-future sentinel on both sides drives it past every
    // real event (filtered out of the assertion by its id)
    // two waves: eviction happens in the micro-batch AFTER the watermark
    // advances, so the second wave's batch flushes rows the first one
    // only unlocked
    Seq("30", "60").foreach { days =>
      val sentinel = events.orderBy("event_id").limit(1)
        .withColumn("event_id", lit(-1L))
        .withColumn("ts", col("ts") + expr(s"INTERVAL $days DAYS"))
      sentinel.write.mode("append").parquet(lDir)
      sentinel.write.mode("append").parquet(rDir)
      q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("ss_lojoin_out").filter(col("event_id") =!= -1L)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -999L else r.getLong(1))).toSet
    val expected = Streams.joinStreams(purchases, clicks, "user_id",
        "1 hour", "2 hours", joinType = "left_outer")
      .select("event_id", "r_event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -999L else r.getLong(1))).toSet
    assert(got == expected, s"stream emitted ${got.size} rows vs batch ${expected.size}")
    assert(expected.exists(_._2 == -999L), "fixture must contain unmatched left rows")
    assert(expected.exists(_._2 != -999L), "fixture must contain matched rows too")
  }

  test("full-outer stream-stream join surfaces unmatched rows from BOTH sides") {
    val base = java.nio.file.Files.createTempDirectory("graft_ssfo").toString
    val lDir = s"$base/l"; val rDir = s"$base/r"
    // scale-free split of the user domain into thirds: left covers the
    // lower two, right the upper two — each side owns one exclusive third
    // so BOTH unmatched directions are guaranteed at any fixture SF
    val maxUser = events.agg(max("user_id")).head().getLong(0)
    val (lo, hi) = (maxUser / 3, 2 * maxUser / 3)
    val purchases = events.filter(col("event_type") === "purchase" && col("user_id") < hi)
    val clicks = events.filter(col("event_type") === "click" && col("user_id") >= lo)
    purchases.write.mode("overwrite").parquet(lDir)
    clicks.write.mode("overwrite").parquet(rDir)
    val schema = events.schema
    val q = Streams.joinStreams(
        spark.readStream.schema(schema).parquet(lDir),
        spark.readStream.schema(schema).parquet(rDir),
        "user_id", "1 hour", "2 hours", joinType = "full_outer")
      .select("event_id", "r_event_id")
      .writeStream.format("memory").queryName("ss_fojoin_out")
      .outputMode("append").start()
    q.processAllAvailable()
    Seq("30", "60").foreach { days =>
      val sentinel = events.orderBy("event_id").limit(1)
        .withColumn("event_id", lit(-1L))
        .withColumn("ts", col("ts") + expr(s"INTERVAL $days DAYS"))
      sentinel.write.mode("append").parquet(lDir)
      sentinel.write.mode("append").parquet(rDir)
      q.processAllAvailable()
    }
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (if (r.isNullAt(0)) -999L else r.getLong(0), if (r.isNullAt(1)) -999L else r.getLong(1))
    val got = spark.table("ss_fojoin_out")
      .filter(coalesce(col("event_id"), lit(0L)) =!= -1L &&
        coalesce(col("r_event_id"), lit(0L)) =!= -1L)
      .collect().map(key).toSet
    val expected = Streams.joinStreams(purchases, clicks, "user_id",
        "1 hour", "2 hours", joinType = "full_outer")
      .select("event_id", "r_event_id").collect().map(key).toSet
    assert(got == expected, s"stream emitted ${got.size} rows vs batch ${expected.size}")
    assert(expected.exists(p => p._1 == -999L), "right-only rows must surface")
    assert(expected.exists(p => p._2 == -999L), "left-only rows must surface")
  }

  test("streaming quantile monitor: merged blobs equal the one-shot sketch, snapshots per batch") {
    import graft.functions.KllQuantile._
    val base = java.nio.file.Files.createTempDirectory("graft_kllstream").toString
    val srcDir = s"$base/src"
    val outPath = s"$base/out"
    val ev = events.select("event_type", "value")
    // three micro-batches as three files (maxFilesPerTrigger = 1)
    ev.filter(col("value") < 3).coalesce(1).write.mode("append").parquet(srcDir)
    ev.filter(col("value") >= 3 && col("value") < 7).coalesce(1).write.mode("append").parquet(srcDir)
    ev.filter(col("value") >= 7).coalesce(1).write.mode("append").parquet(srcDir)
    Streams.quantileMonitorStream(spark, ev.schema, srcDir,
      "event_type", "value", outPath, k = 65535)
    // exact regime: the evolved per-group blobs answer exactly what a
    // one-shot sketch over all history answers — without ever rescanning
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), kllN(col("sk")).as("n"),
        kllQuantile(col("sk"), 0.5).as("p50"), kllQuantile(col("sk"), 0.99).as("p99"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val evolved = snap(graft.sources.VersionedTable.read(spark, s"$outPath/sketches"))
    val oneShot = snap(ev.groupBy("event_type").agg(kllAgg(col("value"), 65535).as("sk")))
    assert(evolved == oneShot, s"evolved blobs must equal the one-shot sketch:\n$evolved\n$oneShot")
    // one quantile snapshot per (epoch, group); counts grow monotonically
    val snaps = spark.read.parquet(s"$outPath/quantiles")
    assert(snaps.select("epoch").distinct().count() == 3, "one snapshot per micro-batch")
    val perEpochTotals = snaps.groupBy("epoch").agg(sum("n").as("tot"))
      .orderBy("epoch").collect().map(_.getLong(1))
    assert(perEpochTotals.sameElements(perEpochTotals.sorted),
      "running counts only ever grow as batches absorb")
    assert(perEpochTotals.last == ev.filter(col("value").isNotNull).count())
  }

  test("streaming cms monitor: merged grid equals the one-shot sketch, hot snapshots per batch") {
    import graft.operators.Profile
    val base = java.nio.file.Files.createTempDirectory("graft_cmsstream").toString
    val srcDir = s"$base/src"
    val outPath = s"$base/out"
    val ev = events.select(col("event_id"), col("event_type").as("k"))
    ev.filter(col("event_id") % 3 === 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    ev.filter(col("event_id") % 3 =!= 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    Streams.cmsMonitorStream(spark, ev.schema, srcDir, "k", outPath,
      depth = 4, width = 64, seed = "s7")
    // the evolved grid answers exactly what one pass over all history
    // answers — counters merged by sums, history never rescanned
    val evolved = graft.sources.VersionedTable.read(spark, s"$outPath/grid")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = Profile.countMinSketch(ev, "k", depth = 4, width = 64,
        seed = "s7")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(evolved == whole, "streamed grid must equal the one-shot sketch")
    // one hot-key snapshot per micro-batch epoch
    val hot = spark.read.parquet(s"$outPath/hot")
    assert(hot.select("epoch").distinct().count() == 2)
  }

  test("streaming weighted reservoir: k-row state converges to the one-shot draw bit-for-bit") {
    import graft.operators.Sampling
    val base = java.nio.file.Files.createTempDirectory("graft_resstream").toString
    val srcDir = s"$base/src"
    val outPath = s"$base/out"
    val ev = events.select(col("event_id"), col("value"))
    ev.filter(col("event_id") % 3 === 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    ev.filter(col("event_id") % 3 === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    ev.filter(col("event_id") % 3 === 2).coalesce(1)
      .write.mode("append").parquet(srcDir)
    Streams.reservoirStream(spark, ev.schema, srcDir, "event_id", "value",
      k = 40, seed = "rs8", outPath)
    val streamed = graft.sources.VersionedTable.read(spark, s"$outPath/reservoir")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val oneShot = Sampling.weightedSampleWithoutReplacement(
        ev, col("event_id"), "value", k = 40, seed = "rs8")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(streamed == oneShot,
      "the evolved reservoir must equal the one-shot whole-history draw")
    assert(streamed.size == 40)
  }

  test("versioned sink: whole-stream replay adds zero versions, rows exactly once") {
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_vsink").toString
    val srcDir = s"$base/src"
    val root = s"$base/table"
    val ev = events.select(col("event_id"), col("event_type"))
    ev.filter(col("event_id") % 3 === 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    ev.filter(col("event_id") % 3 === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    ev.filter(col("event_id") % 3 === 2).coalesce(1)
      .write.mode("append").parquet(srcDir)
    Streams.versionedSinkStream(spark, ev.schema, srcDir, root, "w1")
    val vs1 = VersionedTable.versions(root)
    assert(vs1.size == 3, s"one commit per micro-batch: $vs1")
    val n = VersionedTable.read(spark, root).count()
    assert(n == ev.count(), "every source row landed exactly once")
    // the at-least-once case: replay the WHOLE stream (fresh query, same
    // writer — batchIds restart at 0) — every epoch is a detected
    // redelivery, so zero new versions and an identical row multiset
    Streams.versionedSinkStream(spark, ev.schema, srcDir, root, "w1")
    assert(VersionedTable.versions(root) == vs1,
      "replayed epochs must all no-op")
    assert(VersionedTable.read(spark, root).count() == n)
    // a DIFFERENT writer's epoch 0 is its own transaction, not a dup
    import spark.implicits._
    val v = VersionedTable.appendIdempotent(spark, root,
      Seq((99999L, "extra")).toDF("event_id", "event_type"), "w2", 0L)
    assert(v == vs1.max + 1 &&
      VersionedTable.read(spark, root).count() == n + 1)
    // direct redelivery returns -1 and leaves no orphan data files
    val before = new java.io.File(s"$root/data").listFiles().length
    assert(VersionedTable.appendIdempotent(spark, root,
      Seq((99999L, "extra")).toDF("event_id", "event_type"), "w2", 0L) == -1L)
    assert(new java.io.File(s"$root/data").listFiles().length == before)
  }

  test("cdc upsert stream: final state equals the batch fold, whole-stream replay no-ops, history time-travels") {
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val srcDir = s"$base/src"
    val root = s"$base/state"
    val ev = events.select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val slices = Seq(
      ev.filter(pmod(col("event_id"), lit(3)) === 0),
      ev.filter(pmod(col("event_id"), lit(3)) === 1),
      ev.filter(pmod(col("event_id"), lit(3)) === 2))
    slices.foreach(_.coalesce(1).write.mode("append").parquet(srcDir))
    val keys = Seq("user_id")
    val ord = Seq(col("event_id").desc)
    Streams.cdcUpsertStream(spark, ev.schema, srcDir, root, keys, ord, "cdc1")
    val streamed = VersionedTable.read(spark, root)
    val folded = Streams.cdcUpsertBatch(slices, keys, ord)
    assert(streamed.count() == folded.count())
    assert(streamed.exceptAll(folded).isEmpty && folded.exceptAll(streamed).isEmpty,
      "streamed CDC state must equal the batch fold row-for-row")
    // one state version per epoch, each a time-travelable checkpoint:
    // version 0 = keep-latest of slice 0 alone
    val vs = VersionedTable.versions(root)
    assert(vs.size == 3)
    val v0 = VersionedTable.read(spark, root, Some(vs.head))
    val w0 = graft.operators.Dedup.keepLatest(slices.head, keys, ord)
    assert(v0.exceptAll(w0).isEmpty && w0.exceptAll(v0).isEmpty)
    // at-least-once: replaying the WHOLE stream (fresh query, batchIds
    // restart at 0) re-merges nothing — every epoch is a detected
    // redelivery of already-folded state
    Streams.cdcUpsertStream(spark, ev.schema, srcDir, root, keys, ord, "cdc1")
    assert(VersionedTable.versions(root) == vs, "replayed epochs must no-op")
    assert(VersionedTable.read(spark, root).count() == folded.count())
  }

  test("bounded merge sink: stream == batch fold == direct window, deletes land, replay no-ops") {
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_msink").toString
    val srcDir = s"$base/src"
    val stream = s"$base/via_stream"
    val batch = s"$base/via_batch"
    // ascending event_id ranges (so the version guard always admits the
    // newer slice) + delete markers on 'error' events
    val ev = events.select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .withColumn("op",
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
    val m = ev.agg(max("event_id")).collect()(0).getLong(0)
    val slices = Seq(
      ev.filter(col("event_id") <= m / 3),
      ev.filter(col("event_id") > m / 3 && col("event_id") <= 2 * m / 3),
      ev.filter(col("event_id") > 2 * m / 3))
    slices.foreach(_.coalesce(1).write.mode("append").parquet(srcDir))
    Streams.mergeSinkStream(spark, ev.schema, srcDir, stream,
      Seq("user_id"), "event_id", "op", "w1")
    val n = Streams.mergeSinkBatch(spark, slices, batch,
      Seq("user_id"), "event_id", "op", "w1")
    assert(n == 3L)
    val viaStream = VersionedTable.read(spark, stream)
    val viaBatch = VersionedTable.read(spark, batch)
    assert(viaStream.exceptAll(viaBatch).isEmpty && viaBatch.exceptAll(viaStream).isEmpty,
      "engine-driven sink must equal the batch fold row-for-row")
    // direct one-shot twin: the globally-latest row per user decides,
    // a latest delete removes the user; the op column never lands
    val direct = graft.operators.Dedup.keepLatest(
        ev, Seq("user_id"), Seq(col("event_id").desc))
      .filter(col("op") =!= "D").drop("op")
    assert(viaBatch.exceptAll(direct).isEmpty && direct.exceptAll(viaBatch).isEmpty)
    assert(!viaStream.columns.contains("op"), "condition-only extras never land")
    // the sink's commit kinds: one bootstrap overwrite, then MERGE per
    // epoch (boundedness itself is pinned by the PipelineSpec merge
    // cases — here the unclustered bootstrap gives the probe nothing
    // to prune)
    val hist = VersionedTable.history(spark, batch).collect()
    assert(hist.length == 3 && hist.count(_.getString(3) == "MERGE") == 2,
      s"bootstrap overwrite + 2 merges expected, got ${hist.map(_.getString(3)).mkString(",")}")
    // whole-stream replay (fresh query, batchIds restart at 0): no-ops
    val vs = VersionedTable.versions(stream)
    Streams.mergeSinkStream(spark, ev.schema, srcDir, stream,
      Seq("user_id"), "event_id", "op", "w1")
    assert(VersionedTable.versions(stream) == vs, "replayed epochs must no-op")
  }

  test("bounded merge sink: a STALE delete marker no-ops like a stale update — newer state never regresses") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_msink_stale").toString
    val root = s"$base/state"
    // epoch 0 bootstraps keys k1..k3 at versions 10/20/30
    val s0 = Seq(("k1", 10L, "a", "U"), ("k2", 20L, "b", "U"), ("k3", 30L, "c", "U"))
      .toDF("k", "ver", "payload", "op")
    // epoch 1 arrives OUT OF ORDER: a stale delete for k1 (ver 5 < 10),
    // a stale update for k2 (ver 7 < 20), a FRESH delete for k3
    // (ver 31 > 30), and a fresh insert k4
    val s1 = Seq(("k1", 5L, "x", "D"), ("k2", 7L, "y", "U"),
                 ("k3", 31L, "z", "D"), ("k4", 40L, "d", "U"))
      .toDF("k", "ver", "payload", "op")
    val n = Streams.mergeSinkBatch(spark, Seq(s0, s1), root,
      Seq("k"), "ver", "op", "stale1")
    assert(n == 2L)
    val got = VersionedTable.read(spark, root).select("k", "ver", "payload")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.get("k1").contains((10L, "a")),
      s"stale delete (ver 5 < committed 10) must NO-OP, got ${got.get("k1")}")
    assert(got.get("k2").contains((20L, "b")),
      s"stale update (ver 7 < committed 20) must no-op, got ${got.get("k2")}")
    assert(!got.contains("k3"), "fresh delete (ver 31 >= 30) must remove k3")
    assert(got.get("k4").contains((40L, "d")), "fresh insert must land")
  }

  test("evolving merge sink: a CDC slice that grows a column evolves the target; the op marker never lands") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_msink_ev").toString
    val root = s"$base/state"
    val s0 = Seq(("k1", 1L, "a", "U"), ("k2", 2L, "b", "U"))
      .toDF("k", "ver", "payload", "op")
    // slice 1 grows `note` — with evolveSchema the column joins the
    // target (old rows NULL); `op` stays condition-only via evolveExcept
    val s1 = Seq(("k1", 10L, "a2", "U", "n1"), ("k3", 30L, "c", "U", "n3"))
      .toDF("k", "ver", "payload", "op", "note")
    // the bootstrap slice lacks `note`: align the fold by passing both
    // through the same evolving sink
    val n = Streams.mergeSinkBatch(spark, Seq(s0, s1), root,
      Seq("k"), "ver", "op", "ev1", evolveSchema = true)
    assert(n == 2L)
    val got = VersionedTable.read(spark, root)
    assert(got.columns.contains("note") && !got.columns.contains("op"),
      s"note must evolve in, op must stay out; got ${got.columns.mkString(",")}")
    val m = got.collect().map(r => r.getString(0) ->
      (r.getString(2), if (r.isNullAt(got.columns.indexOf("note"))) null
                       else r.getString(got.columns.indexOf("note")))).toMap
    assert(m("k1") == (("a2", "n1")), s"updated row carries the new column: ${m("k1")}")
    assert(m("k2") == (("b", null)), "pre-evolution row serves NULL")
    assert(m("k3") == (("c", "n3")), "insert lands with the new column")
  }

  test("feed source starting pins: version 0 replays history, timestamps resolve to the first commit at-or-after, future pins serve nothing") {
    import spark.implicits._
    import graft.sources.{SkippingIndex, VersionedTable}
    val base = java.nio.file.Files.createTempDirectory("graft_feedpin").toString
    val src = s"$base/src"
    VersionedTable.withClock(() => 1000L) {
      VersionedTable.overwrite(spark, src,
        (0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    }
    VersionedTable.withClock(() => 2000L) {
      VersionedTable.append(spark, src,
        (10 until 20).map(i => (i.toLong, s"b$i")).toDF("id", "v"))
    }
    VersionedTable.withClock(() => 3000L) {
      VersionedTable.deleteWhere(spark, src, Seq(SkippingIndex.ColRange("id", 0, 4)))
    }
    // startingVersion = 0 replays the whole history (commit 0's changes
    // ARE its content as inserts) — identical to the unpinned stream
    val f0 = Streams.feedDump(spark, src, s"$base/f0", startingVersion = Some(0L))
    val fAll = Streams.feedDump(spark, src, s"$base/fa")
    assert(f0.count() == 25, s"10 + 10 inserts + 5 deletes, got ${f0.count()}")
    assert(f0.exceptAll(fAll).isEmpty && fAll.exceptAll(f0).isEmpty,
      "startingVersion=0 must equal the unpinned stream's full feed")
    // startingTimestamp resolves INCLUSIVELY to the first commit stamped
    // at-or-after it: 2000 → v1 (skipping v0), 2500 → v2
    val ft = Streams.feedDump(spark, src, s"$base/ft", startingTimestamp = Some(2000L))
    assert(ft.count() == 15 &&
      ft.select("_commit_version").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val ft2 = Streams.feedDump(spark, src, s"$base/ft2", startingTimestamp = Some(2500L))
    assert(ft2.count() == 5 &&
      ft2.select("_change_type").distinct().collect().map(_.getString(0)).toSet == Set("delete"))
    // a pin past the head serves nothing (tail-from-the-future)
    assert(Streams.feedDump(spark, src, s"$base/ff", startingVersion = Some(99L)).count() == 0)
    // the two pin options are mutually exclusive
    val e = intercept[Exception] {
      Streams.feedDump(spark, src, s"$base/fx",
        startingVersion = Some(1L), startingTimestamp = Some(2000L))
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("at most one")), s"got: ${chain(e).mkString(" | ")}")
  }

  test("a checkpointed pinned stream restarts after vacuum retires the pin's predecessor (WAL wins)") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_pinrestart").toString
    val src = s"$base/src"
    val out = s"$base/out"
    val ckpt = s"$base/ckpt"
    VersionedTable.overwrite(spark, src,
      (0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    VersionedTable.append(spark, src,
      (10 until 20).map(i => (i.toLong, s"b$i")).toDF("id", "v"))
    def run(): Long = {
      var reader = spark.readStream.format("versioned-feed").option("path", src)
        .option("startingVersion", "1")
      val q = reader.load().writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(out); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(out)))
        spark.read.parquet(out).count()
      else 0L
    }
    assert(run() == 10L, "the pinned fresh stream serves v1's changes only")
    // the source advances; vacuum retires everything before the head —
    // INCLUDING v0, the pin's predecessor
    VersionedTable.append(spark, src,
      (20 until 25).map(i => (i.toLong, s"c$i")).toDF("id", "v"))
    // keep = 2: v0 (the pin's predecessor) retires, but the WAL offset's
    // onward diffs (v1 → v2) stay readable — the restart is legitimate
    VersionedTable.vacuum(src, keep = Some(2), minAgeMs = 0L)
    assert(VersionedTable.versions(src).head == 1L)
    // the restart must NOT re-validate the pin: the WAL's offset (v1,
    // already consumed) wins, and only v2's diff is needed — readable
    assert(run() == 15L, "restart folds exactly the new commit's changes")
  }

  test("a FRESH pinned stream whose predecessor was vacuumed fails loudly with the pin message") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_pinfresh").toString
    val src = s"$base/src"
    VersionedTable.overwrite(spark, src,
      (0 until 10).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    VersionedTable.append(spark, src,
      (10 until 20).map(i => (i.toLong, s"b$i")).toDF("id", "v"))
    VersionedTable.append(spark, src,
      (20 until 30).map(i => (i.toLong, s"c$i")).toDF("id", "v"))
    VersionedTable.vacuum(src, keep = Some(1), minAgeMs = 0L)
    val e = intercept[Exception] {
      Streams.feedDump(spark, src, s"$base/out", startingVersion = Some(1L))
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("startingVersion") &&
      m.contains("retired by vacuum")),
      s"the pin message must surface, got: ${chain(e).mkString(" | ")}")
  }

  test("change-feed consumer: stream fold == batch changeFeed fold == direct state; replay no-ops") {
    import graft.sources.{SkippingIndex, VersionedTable}
    val base = java.nio.file.Files.createTempDirectory("graft_cfc").toString
    val src = s"$base/src"
    val tgt = s"$base/tgt"
    val tgt2 = s"$base/tgt2"
    val ev = events.select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    // source history: overwrite, append, bounded delete, and a dynamic
    // partition-overwrite-shaped append of REVISED rows (same keys) — the
    // consumer must treat the re-insert as an update
    VersionedTable.overwrite(spark, src, ev.filter(col("event_id") < 600)
      .repartitionByRange(4, col("event_id")).sortWithinPartitions("event_id"))
    VersionedTable.append(spark, src, ev.filter(col("event_id") >= 600))
    VersionedTable.deleteWhere(spark, src,
      Seq(SkippingIndex.ColRange("event_id", 100, 299)))
    val keys = Seq("event_id")
    val ord = Seq(col("value").desc_nulls_last, col("event_id").desc)
    val folded = Streams.changeFeedConsume(spark, src, tgt, keys, ord, "cdc")
    assert(folded == 3L, s"one slice per source commit, got $folded")
    val streamed = VersionedTable.read(spark, tgt)
    // equivalence 1: the consumed target equals the source's final state
    val direct = VersionedTable.read(spark, src)
    assert(streamed.count() == direct.count())
    assert(streamed.exceptAll(direct).isEmpty && direct.exceptAll(streamed).isEmpty,
      "consumed target must equal the source's current snapshot")
    // equivalence 2: folding the batch changeFeed slices by hand into a
    // SECOND target gives the same state (applyChangeSlice is the shared
    // fold; this pins consume's slicing to the batch feed's)
    val vs = VersionedTable.versions(src)
    val s0 = Streams.applyChangeSlice(None,
      VersionedTable.read(spark, src, Some(vs.head)).withColumn("_change_type", lit("insert")),
      keys, ord)
    val byHand = vs.sliding(2).foldLeft(s0) { case (st, Seq(a, b)) =>
      Streams.applyChangeSlice(Some(st),
        VersionedTable.changeFeed(spark, src, a, b), keys, ord)
    }
    VersionedTable.overwrite(spark, tgt2, byHand)
    val manual = VersionedTable.read(spark, tgt2)
    assert(streamed.exceptAll(manual).isEmpty && manual.exceptAll(streamed).isEmpty,
      "consumer fold must equal the hand-rolled batch changeFeed fold")
    // exactly-once: a full replay over the same history commits nothing
    assert(Streams.changeFeedConsume(spark, src, tgt, keys, ord, "cdc") == 0L)
    assert(VersionedTable.versions(tgt).size == 3)
    // and the consumer catches up INCREMENTALLY after a new source commit
    VersionedTable.append(spark, src,
      ev.filter(col("event_id") >= 100 && col("event_id") < 150))
    assert(Streams.changeFeedConsume(spark, src, tgt, keys, ord, "cdc") == 1L)
    assert(VersionedTable.read(spark, tgt).count() ==
      VersionedTable.read(spark, src).select("event_id").distinct().count())
  }

  test("versioned-feed source: engine-driven stream equals direct state; checkpointed restart resumes at the WAL offset") {
    import graft.sources.{SkippingIndex, VersionedTable}
    val base = java.nio.file.Files.createTempDirectory("graft_vfs").toString
    val src = s"$base/src"
    val tgt = s"$base/tgt"
    val ckpt = s"$base/ckpt"
    val ev = events.select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    VersionedTable.overwrite(spark, src, ev.filter(col("event_id") < 600)
      .repartitionByRange(4, col("event_id")).sortWithinPartitions("event_id"))
    VersionedTable.append(spark, src, ev.filter(col("event_id") >= 600))
    VersionedTable.deleteWhere(spark, src,
      Seq(SkippingIndex.ColRange("event_id", 100, 299)))
    val keys = Seq("event_id")
    val ord = Seq(col("event_id").desc)
    // one micro-batch per source commit through the REAL engine
    Streams.changeFeedStream(spark, src, tgt, keys, ord, "vfs",
      checkpoint = Some(ckpt), maxVersionsPerTrigger = Some(1L))
    val direct = VersionedTable.read(spark, src)
    val streamed = VersionedTable.read(spark, tgt)
    assert(streamed.count() == direct.count())
    assert(streamed.exceptAll(direct).isEmpty && direct.exceptAll(streamed).isEmpty,
      "engine-driven feed must equal the source's current snapshot")
    assert(VersionedTable.versions(tgt).size == 3,
      "maxVersionsPerTrigger=1 => one target commit per source commit")
    // RESTART from the checkpoint after a new source commit: the WAL
    // resumes at the stored offset, so exactly the new slice folds
    VersionedTable.append(spark, src,
      ev.filter(col("event_id") >= 100 && col("event_id") < 150))
    Streams.changeFeedStream(spark, src, tgt, keys, ord, "vfs",
      checkpoint = Some(ckpt))
    assert(VersionedTable.versions(tgt).size == 4,
      "the resumed stream must fold exactly the one new commit")
    assert(VersionedTable.read(spark, tgt).count() ==
      VersionedTable.read(spark, src).count())
    // and a drained stream resumed with NOTHING new commits nothing
    Streams.changeFeedStream(spark, src, tgt, keys, ord, "vfs",
      checkpoint = Some(ckpt))
    assert(VersionedTable.versions(tgt).size == 4, "no new offsets => no commits")
  }

  test("feed source admission control: native ReadLimit pacing + Trigger.AvailableNow drains to the pinned head and stops (VERDICT r14 #4)") {
    import spark.implicits._
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_vfadm").toString
    val src = s"$base/src"
    val ckpt = s"$base/ckpt"
    (0 until 4).foreach { i =>
      val df = Seq((i * 10L, s"c$i"), (i * 10L + 1, s"c$i")).toDF("id", "v")
      if (i == 0) VersionedTable.overwrite(spark, src, df)
      else VersionedTable.append(spark, src, df)
    }
    def drain(): Int = {
      var batches = 0
      val q = spark.readStream.format("versioned-feed").option("path", src)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          if (b.count() > 0) batches += 1; ()
        }.start()
      // the source implements SupportsTriggerAvailableNow: the engine
      // pins the head at prepare time, drains it in ReadLimit-paced
      // batches, and terminates ON ITS OWN — no processAllAvailable
      assert(q.awaitTermination(180000L),
        "Trigger.AvailableNow must terminate once the pinned head drains")
      batches
    }
    assert(drain() == 4,
      "maxVersionsPerTrigger=1 through native admission control: v0..v3 = 4 paced batches")
    // a later commit is OUTSIDE the drained pin: the next AvailableNow
    // run serves exactly that one new version from the WAL offset
    VersionedTable.append(spark, src, Seq((100L, "late")).toDF("id", "v"))
    assert(drain() == 1, "the resumed drain must serve exactly the new commit")
  }

  test("versioned-feed source: a consumer fallen behind retention fails loudly; a fresh stream bootstraps from the snapshot") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.streaming.StreamingQueryException
    val base = java.nio.file.Files.createTempDirectory("graft_vfr").toString
    val src = s"$base/src"
    val ckpt = s"$base/ckpt"
    val ev = events.select(col("event_id"), col("user_id"), col("value"))
    def run(checkpoint: Option[String]): Long = {
      val reader = spark.readStream.format("versioned-feed").option("path", src).load()
      var rows = 0L
      val writer = reader.writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) => rows += b.count(); ()
      }
      val q = checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
      try { q.processAllAvailable(); rows } finally q.stop()
    }
    VersionedTable.overwrite(spark, src, ev.filter(col("event_id") < 300))
    // a checkpointed consumer drains v0, then goes away
    assert(run(Some(ckpt)) == ev.filter(col("event_id") < 300).count())
    // meanwhile the source advances two commits and retention retires
    // everything before the head — the consumer is now PAST the window
    VersionedTable.append(spark, src,
      ev.filter(col("event_id") >= 300 && col("event_id") < 400))
    VersionedTable.append(spark, src, ev.filter(col("event_id") >= 400))
    VersionedTable.vacuum(src, keep = Some(1), minAgeMs = 0L)
    // resuming must fail LOUDLY: changeFeed(v1, v2) needs retired v1, and
    // silently serving a snapshot would skip the window's deletes
    val e = intercept[StreamingQueryException] { run(Some(ckpt)) }
    val msg = Option(e.getCause).fold(e.getMessage)(_.getMessage)
    assert(msg != null && msg.contains("retired by vacuum"),
      s"the feed must fail loudly past retention, got: $msg")
    // a FRESH stream (no checkpoint) is fine: the earliest readable
    // version bootstraps as an all-insert snapshot
    assert(run(None) == VersionedTable.read(spark, src).count())
  }

  test("soak: versioned sink under CONCURRENT optimize + vacuum — rows exactly once, replay no-ops, retention spares in-flight files") {
    import graft.sources.VersionedTable
    val base = java.nio.file.Files.createTempDirectory("graft_vsoak").toString
    val srcDir = s"$base/src"
    val root = s"$base/table"
    val ev = events.select(col("event_id"), col("event_type"), col("value"))
    val nEpochs = 12
    (0 until nEpochs).foreach { i =>
      ev.filter(col("event_id") % nEpochs === i).coalesce(1)
        .write.mode("append").parquet(srcDir)
    }
    // maintenance loop racing the live sink: OPTIMIZE commits clustered
    // rewrites between the sink's epochs, and vacuum runs with a WIDE
    // retention window — an age-0 vacuum here could delete files the
    // racing append has staged but not yet committed (on disk,
    // "in flight" and "orphan" are indistinguishable; the retention
    // window is how Delta's VACUUM stays safe under live writers)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val optimized = new java.util.concurrent.atomic.AtomicInteger(0)
    val maint = new Thread(() => {
      try {
        while (!stop.get()) {
          if (VersionedTable.isVersioned(root)) {
            VersionedTable.optimize(spark, root, Seq("event_id", "value"), 2)
            optimized.incrementAndGet()
            VersionedTable.vacuum(root, keep = Some(4), minAgeMs = 600000L)
          }
          Thread.sleep(20)
        }
      } catch { case t: Throwable => maintErr.set(t) }
    })
    maint.start()
    try Streams.versionedSinkStream(spark, ev.schema, srcDir, root, "w1")
    finally { stop.set(true); maint.join() }
    assert(maintErr.get() == null,
      s"maintenance must survive racing the sink: ${maintErr.get()}")
    assert(optimized.get() >= 1, "at least one optimize interleaved the epochs")
    // exactly once despite the rewrites: the table's row MULTISET equals
    // the source's (an optimize that raced an append and resurrected or
    // dropped rows would break either direction)
    val got = VersionedTable.read(spark, root)
    assert(got.count() == ev.count())
    assert(got.exceptAll(ev).isEmpty && ev.exceptAll(got).isEmpty,
      "post-soak table must equal the source row-for-row")
    // the retention window spared every in-flight file: nothing the soak
    // vacuums deleted is referenced by the surviving snapshot (implied by
    // the multiset check) AND replaying the whole stream no-ops — the
    // writer's txn header survived every rewrite and retirement
    val vs = VersionedTable.versions(root)
    Streams.versionedSinkStream(spark, ev.schema, srcDir, root, "w1")
    assert(VersionedTable.versions(root) == vs, "replayed epochs must all no-op")
    assert(VersionedTable.read(spark, root).count() == ev.count())
    // quiesced: an age-0 keep-1 vacuum reclaims the soak's history;
    // the survivor still reads clean and retired versions fail fast
    VersionedTable.vacuum(root, keep = Some(1))
    assert(VersionedTable.read(spark, root).count() == ev.count())
    val e = intercept[IllegalStateException] {
      VersionedTable.read(spark, root, Some(vs.head))
    }
    assert(e.getMessage.contains("retired by vacuum"))
  }

  test("streaming psi monitor: per-batch scores equal their batch twins, drift alarms") {
    import graft.operators.Profile
    val base = java.nio.file.Files.createTempDirectory("graft_psistream").toString
    val srcDir = s"$base/src"
    val outPath = s"$base/out"
    val ev = events.select("event_type", "value")
    val ref = ev // the frozen settled-corpus census: the full distribution
    // batch 1 resembles the reference; batch 2 is a sliced (shifted) tail
    val b1 = ev.limit(400)
    val b2 = ev.filter(col("value") >= 8)
    b1.coalesce(1).write.mode("append").parquet(srcDir)
    b2.coalesce(1).write.mode("append").parquet(srcDir)
    Streams.psiMonitorStream(spark, ev.schema, srcDir, ref, "value",
      binWidth = 1.0, outPath)
    def readOut() = spark.read.parquet(outPath)
      .select(col("epoch").cast("long"), col("psi"))
      .orderBy("epoch").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val got = readOut()
    assert(got.length == 2, s"one psi row per micro-batch: ${got.toSeq}")
    // at-least-once retry safety: replaying the whole stream (fresh
    // checkpoint, epochs restart at 0) dynamic-overwrites each epoch's
    // partition instead of appending duplicates
    Streams.psiMonitorStream(spark, ev.schema, srcDir, ref, "value",
      binWidth = 1.0, outPath)
    assert(readOut().length == 2,
      "a replayed epoch must overwrite its partition, not append")
    // stream ≡ batch: each micro-batch's score equals the direct call.
    // File-source epoch ORDER is not pinned to write order, so compare
    // the score MULTISET and check the drifting batch alarms.
    val twins = Seq(b1, b2)
      .map(b => Profile.psi(ref, b, "value", 1.0).collect()(0).getDouble(3))
    assert(got.map(_._2).sorted.toSeq == twins.sorted,
      s"stream scores must equal their batch twins: ${got.toSeq} vs $twins")
    assert(twins.max > 0.25, s"the sliced batch must alarm as shifted: $twins")
    assert(twins.min < twins.max, "the resembling batch scores lower")
  }

  test("readStream.table: plain append stream through the catalog; change commits refuse or skip; CDF via readChangeFeed") {
    import graft.sources.VersionedTable
    import org.apache.spark.sql.streaming.StreamingQueryException
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_rst").toString
    spark.conf.set("spark.sql.catalog.gs", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gs.root", wh)
    val root = s"$wh/t"
    val ckpt = s"$wh/ckpt"
    VersionedTable.overwrite(spark, root,
      (0 until 100).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    VersionedTable.append(spark, root,
      (100 until 150).map(i => (i.toLong, s"b$i")).toDF("id", "v"))
    def run(opts: Map[String, String], checkpoint: String): Seq[(Long, String)] = {
      val got = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      var reader = spark.readStream
      opts.foreach { case (k, x) => reader = reader.option(k, x) }
      val q = reader.table("gs.t").select("id", "v").writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.select("id", "v").as[(Long, String)].collect(); ()
        }.start()
      try { q.processAllAvailable(); got.toSeq } finally q.stop()
    }
    // fresh plain stream: snapshot + the append, in the TABLE's schema
    val first = run(Map.empty, ckpt)
    assert(first.size == 150 && first.map(_._1).sorted == (0L until 150L),
      s"plain stream must serve the table's rows, got ${first.size}")
    // resume after one more append: exactly the new rows
    VersionedTable.append(spark, root,
      (150 until 170).map(i => (i.toLong, s"c$i")).toDF("id", "v"))
    assert(run(Map.empty, ckpt).map(_._1).sorted == (150L until 170L),
      "the checkpointed stream must resume with only the new commit")
    // a DELETE commit cannot be an append batch: loud failure ...
    VersionedTable.deleteWherePredicate(spark, root, col("id") < 10)
    val e = intercept[StreamingQueryException] { run(Map.empty, ckpt) }
    val msg = Option(e.getCause).fold(e.getMessage)(_.getMessage)
    assert(msg != null && msg.contains("skipChangeCommits"), s"got: $msg")
    // ... or an explicit skip (Delta's option), after which appends flow
    assert(run(Map("skipChangeCommits" -> "true"), ckpt).isEmpty)
    VersionedTable.append(spark, root, Seq((500L, "d")).toDF("id", "v"))
    assert(run(Map("skipChangeCommits" -> "true"), ckpt) == Seq((500L, "d")))
    // CDF mode through the same surface: feed columns + commit versions
    val cdf = spark.readStream.option("readChangeFeed", "true").table("gs.t")
    assert(cdf.columns.contains("_change_type") &&
      cdf.columns.contains("_commit_version"))
    val changes = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val q2 = cdf.writeStream.option("checkpointLocation", s"$wh/ckpt_cdf")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        changes ++= b.select("id", "_change_type", "_commit_version")
          .as[(Long, String, Long)].collect(); ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    // initial snapshot (earliest readable) + each later diff, deletes included
    assert(changes.count(_._2 == "delete") == 10,
      s"the CDF stream must carry the delete diff: ${changes.take(5)}")
    assert(changes.map(_._3).distinct.sorted.size == 5,
      "one slice per readable version (v0 snapshot + four later diffs)")
    // the two surfaces agree on the final state: plain-folded rows ==
    // snapshot (CDF inserts minus deletes land the same place)
    val folded = (first ++ Seq((500L, "d")) ++
      (150L until 170L).map(i => (i, s"c$i"))).toMap -- (0L until 10L)
    assert(folded.size == VersionedTable.read(spark, root).count().toInt)
  }

}
