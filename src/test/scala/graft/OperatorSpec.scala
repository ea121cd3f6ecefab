package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.operators._

class OperatorSpec extends SparkSpecBase {
  import spark.implicits._

  test("epochDecode: ns vs s heuristic, including the 1e12 edge") {
    val df = Seq(
      1704067200000000000L, // 2024-01-01 in ns -> ns path
      1704067200L,          // 2024-01-01 in s  -> s path
      999999999999L,        // just under threshold -> s path (reference quirk)
      1000000000001L        // just over  -> ns path
    ).toDF("v").select(Standardize.epochDecode(col("v")).as("ts"))
    val got = df.collect().map(_.getTimestamp(0).toInstant.toString)
    assert(got(0) == "2024-01-01T00:00:00Z")
    assert(got(1) == "2024-01-01T00:00:00Z")
    assert(got(2) == "+33658-09-27T01:46:39Z")  // seconds path, NOT "fixed"
    assert(got(3) == "1970-01-01T00:16:40Z") // ns path, sub-us floored away
  }

  test("epochDecode property: matches a JDK reference over random longs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = Gen.oneOf(
      Gen.choose(0L, 4102444800L),                      // plausible seconds
      Gen.choose(1000000000000000000L, 1900000000000000000L)) // plausible ns
    val prop = Prop.forAll(Gen.listOfN(50, gen)) { vs =>
      val df = vs.toDF("v").select(col("v"),
        Standardize.epochDecode(col("v")).as("ts"))
      df.collect().forall { r =>
        val v = r.getLong(0)
        val expectedMicros =
          if (v > Standardize.NsThreshold) Math.floorDiv(v, 1000L)
          else v * 1000000L
        r.getTimestamp(1).toInstant.getEpochSecond * 1000000L +
          r.getTimestamp(1).toInstant.getNano / 1000L == expectedMicros
      }
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop).passed)
  }

  test("nullifySentinels nulls all sentinel spellings, keeps real values") {
    val df = Seq("ok", " N/A ", "null", "#N/A", "", "NONE", "value")
      .toDF("s").select(Standardize.nullifySentinels(col("s")).as("s"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("ok"), None, None, None, None, None, Some("value")))
  }

  test("keepLatest with total order is deterministic on exact ties") {
    val df = Seq((1, "2024-01-01", "x"), (1, "2024-01-01", "y"), (2, "2024-01-02", "z"))
      .toDF("k", "d", "payload")
    val order = Dedup.totalOrder(df, Seq("k"), Seq(col("d").desc), Seq("d"))
    val got = Dedup.keepLatest(df, Seq("k"), order).orderBy("k").collect()
    assert(got.map(_.getString(2)).toSeq == Seq("y", "z")) // 'y' > 'x' desc
  }

  test("mergeUpsert: matched rows take the incoming version, others insert") {
    val existing = Seq((1, "old", 10), (2, "keep", 20)).toDF("id", "v", "ver")
    val incoming = Seq((1, "new", 11), (3, "ins", 30)).toDF("id", "v", "ver")
    val got = Dedup.mergeUpsert(existing, incoming, Seq("id"), Seq(col("ver").desc))
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, "new"), (2, "keep"), (3, "ins")))
  }

  test("saltedKeepLatest equals plain keepLatest (skew path is semantics-free)") {
    val ev = sources.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val order = Seq(col("ts").desc, col("event_id").desc)
    val plain = Dedup.keepLatest(ev, Seq("event_type"), order)
      .orderBy("event_type").collect().toSeq
    val salted = Dedup.saltedKeepLatest(ev, Seq("event_type"), order, saltBuckets = 16)
      .orderBy("event_type").collect().toSeq
    assert(plain == salted) // 5 hot keys over 10k rows: worst-case skew shape
  }

  test("snapshotDiff classifies insert/update/delete, null-safely") {
    val oldS = Seq((1, Option("a")), (2, Option("b")), (3, Option.empty[String]),
      (4, Option("d")), (6, Option.empty[String])).toDF("id", "v")
    val newS = Seq((1, Option("a")), (2, Option("B")), (3, Option.empty[String]),
      (5, Option("e")), (6, Option("now-set"))).toDF("id", "v")
    val got = Incremental.snapshotDiff(oldS, newS, Seq("id")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    // 1 unchanged, 3 unchanged-with-null (null-safe compare keeps it out)
    assert(got == Map(2 -> "update", 4 -> "delete", 5 -> "insert", 6 -> "update"))
  }

  test("saltedKeepLatest: a pathologically hot key is reduced before the global window") {
    // one key, 50k rows — the shape where a plain window sends every row to
    // a single task. The salted pre-reduction must cap what the global
    // window sees at saltBuckets candidates, without changing the answer.
    val hot = spark.range(50000).select(lit("hot").as("k"), col("id").as("v"))
      .unionAll(spark.range(100).select(lit("cold").as("k"), col("id").as("v")))
    val order = Seq(col("v").desc)
    val plain = Dedup.keepLatest(hot, Seq("k"), order)
      .orderBy("k").collect().toSeq
    val salted = Dedup.saltedKeepLatest(hot, Seq("k"), order, saltBuckets = 32)
      .orderBy("k").collect().toSeq
    assert(salted == plain, "salting must not change the result")
    val candidates = Dedup.saltedCandidates(hot, Seq("k"), order, 32)
    val perKey = candidates.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perKey("hot") <= 32,
      s"hot key must shrink to <= saltBuckets candidates, got ${perKey("hot")}")
    assert(perKey.values.forall(_ <= 32))
  }

  test("saltedJoin spreads a hot key over salt buckets without changing the result") {
    val hot = spark.range(20000).select(
      when(col("id") % 10 === 0, lit(1L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val dim = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("attr"))
    val plain = hot.join(dim, Seq("k")).orderBy("k", "payload").collect().toSeq
    val salted = Joins.saltedJoin(hot, dim, Seq("k"), saltBuckets = 8)
      .select("k", "payload", "attr").orderBy("k", "payload").collect().toSeq
    assert(salted == plain, "salting must be invisible in the result")
    // the shuffle key really is (k, salt): the salt column survives into
    // the physical join keys even though the API drops it from the output
    val phys = Joins.saltedJoin(hot, dim, Seq("k"), saltBuckets = 8)
      .queryExecution.sparkPlan.toString
    assert(phys.contains("__graft_salt"), s"join must key on the salt:\n$phys")
  }

  test("saltedJoin bounds the max shuffle-group size under a pathological hot key") {
    // 90% of 40k rows share one key — unsalted, that key's rows land in ONE
    // shuffle task; salted, the per-(key, salt) group is the task bound and
    // must shrink by ~saltBuckets. This is the 100 TB claim, measured.
    val buckets = 16
    val hot = spark.range(40000).select(
      when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val unsaltedMax = hot.groupBy("k").count()
      .agg(max("count")).head().getLong(0)
    assert(unsaltedMax >= 36000L, s"fixture must be hot-keyed, got $unsaltedMax")
    val saltedMax = Joins.saltedLeft(hot, buckets)
      .groupBy("k", Joins.Salt).count()
      .agg(max("count")).head().getLong(0)
    assert(saltedMax <= unsaltedMax / buckets * 2,
      s"per-task bound must shrink ~${buckets}x: unsalted $unsaltedMax, salted $saltedMax")
  }

  test("quarantine split partitions the input exactly") {
    val li = sources.Tables.load(spark, sfDir, "lineitem")
    val rules = Quarantine.Rules(
      refDate = lit(java.sql.Date.valueOf("1998-06-01")),
      valueColMatch = _.contains("price"), maxVal = 100000.0, minVal = -1.0)
    val (clean, quar) = Quarantine.split(li, rules)
    assert(clean.count() + quar.count() == li.count())
    assert(quar.filter(col("quarantine_reason").isNull).count() == 0)
  }

  test("approx_count_distinct is within 5% of exact (HLL++ default rsd)") {
    val li = sources.Tables.load(spark, sfDir, "lineitem")
    val exact = li.select("l_partkey").distinct().count().toDouble
    val approx = li.agg(approx_count_distinct(col("l_partkey"))).head().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
  }

  test("calendar covers the full domain with correct keys") {
    val cal = CalendarDim.fromDomain(sources.Tables.load(spark, sfDir, "orders"), "o_orderdate")
    val Row(n: Long, distinct: Long) = cal.agg(count(lit(1)), countDistinct(col("date_key"))).head()
    assert(n == distinct) // surrogate key is unique
    assert(cal.filter(col("month_name_es") === "Enero").filter(col("month_num") =!= 1).count() == 0)
  }
  test("hash sampling is deterministic, key-consistent across tables, and near-fraction") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    val digits = Seq("0", "1", "2", "3")
    val s1 = Sampling.hashSample(orders, col("o_orderkey"), digits)
    val s2 = Sampling.hashSample(orders, col("o_orderkey"), digits)
    assert(s1.count() == s2.count(), "same keys in, same sample out")
    val frac = s1.count().toDouble / orders.count()
    assert(frac > 0.15 && frac < 0.35, s"~25% expected, got $frac")
    // correlated sampling: every sampled lineitem's order is in the order sample
    val liS = Sampling.hashSample(li, col("l_orderkey"), digits)
    val orphan = liS.join(s1.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_anti").count()
    assert(orphan == 0, "shared-key samples must stay joinable")
  }

  test("stratified hash sampling applies per-stratum fractions") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val got = Sampling.stratifiedHashSample(orders, col("o_orderkey"),
      col("o_orderstatus"),
      Map("F" -> Seq("0"), "O" -> (0 to 15).map(_.toHexString)))
    val byStatus = got.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = orders.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus("O") == full("O"), "16/16 nibbles keeps the whole stratum")
    assert(byStatus("F") < full("F") / 8, "1/16 nibble keeps a small slice")
    assert(!byStatus.contains("P"), "unmapped strata are dropped")
  }

  test("weighted mix hits each stratum's target rate and stays deterministic") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val weights = Map("F" -> 1.0, "O" -> 0.5, "P" -> 0.0)
    val got = Sampling.weightedMix(orders, col("o_orderkey"), col("o_orderstatus"), weights)
    val byStatus = got.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = orders.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus("F") == full("F"), "weight 1.0 keeps the whole stratum")
    assert(!byStatus.contains("P"), "weight 0.0 drops the stratum")
    val rate = byStatus("O").toDouble / full("O")
    assert(rate > 0.42 && rate < 0.58, s"weight 0.5 keeps about half, got $rate")
    // determinism: an identical second evaluation selects identical keys
    val again = Sampling.weightedMix(orders, col("o_orderkey"), col("o_orderstatus"), weights)
    assert(got.select("o_orderkey").except(again.select("o_orderkey")).isEmpty)
  }

  test("temperature mix: α=1 is proportional, α=0 equalizes strata, α=0.5 flattens the head") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // skewed strata: 3200 / 800 / 200 rows
    val rows = ((1L to 3200L).map(i => (i, "big")) ++
      (10001L to 10800L).map(i => (i, "mid")) ++
      (20001L to 20200L).map(i => (i, "small"))).toDF("id", "stratum")
    val full = Map("big" -> 3200.0, "mid" -> 800.0, "small" -> 200.0)
    def kept(alpha: Double, target: Long): Map[String, Long] =
      Sampling.temperatureMix(rows, col("id"), "stratum", alpha, target)
        .groupBy("stratum").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    // α=1: one uniform keep fraction — strata shrink proportionally
    val prop = kept(1.0, 1050L)
    val rates = full.keys.map(s => prop(s) / full(s))
    assert(rates.max / rates.min < 1.3,
      s"α=1 keep rates must be ~uniform across strata, got $prop")
    // α=0: uniform expected COUNT per stratum (≈ target/3 each)
    val eq = kept(0.0, 300L)
    assert(eq.values.forall(n => n > 60 && n < 140),
      s"α=0 must equalize strata at ~100 rows each, got $eq")
    // α=0.5: the head's kept SHARE drops below its raw share, the tail's rises
    val half = kept(0.5, 600L)
    val halfTot = half.values.sum.toDouble
    assert(half("big") / halfTot < 3200.0 / 4200.0,
      s"α=0.5 must shrink the head's share, got $half")
    assert(half("small") / halfTot > 200.0 / 4200.0,
      s"α=0.5 must grow the tail's share, got $half")
    // determinism: identical second evaluation keeps identical keys
    val a = Sampling.temperatureMix(rows, col("id"), "stratum", 0.5, 600L)
    val b = Sampling.temperatureMix(rows, col("id"), "stratum", 0.5, 600L)
    assert(a.select("id").except(b.select("id")).isEmpty)
  }

  test("exact stratified sample: gate-active regime equals the ungated window top-n") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // 2000 rows in one stratum, n=5, margin=4 → threshold ceil(65536·20/2000)
    // = 656 keeps ~20 rows: the prefilter actually GATES here (the fixture
    // query saturates it), and the top-5 must be identical to ranking the
    // WHOLE stratum — the prefix-order subset property under real pruning
    val rows = (1L to 2000L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "stratum")
    val got = Sampling.exactStratifiedSample(rows, col("id"), "stratum", n = 5)
      .select("id", "stratum").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = rows
      .withColumn("__rk", row_number().over(
        Window.partitionBy("stratum").orderBy(md5(col("id").cast("string")), col("id"))))
      .filter(col("__rk") <= 5).select("id", "stratum")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == naive, s"gated exact-n must equal the full-window top-n")
    assert(got.count(_._2 == "even") == 5 && got.count(_._2 == "odd") == 5)
  }

  test("approx percentile lands within sketch tolerance of the exact percentile") {
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
    val both = orders.agg(
      percentile(col("o_totalprice"), lit(0.5)).as("exact"),
      approx_percentile(col("o_totalprice"), lit(0.5), lit(1000)).as("approx")
    ).head()
    val (exact, approx) = (both.getDouble(0), both.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx p50 $approx should be within 5% of exact $exact")
  }

  test("scd2 history: contiguous intervals, one current row per key, runs collapse") {
    import spark.implicits._
    import graft.operators.Scd2
    import java.sql.Timestamp
    def ts(x: String) = Timestamp.valueOf(x)
    val log = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "A", ts("2024-01-02 00:00:00"), 2L),  // same run, collapses
      (1L, "B", ts("2024-01-03 00:00:00"), 3L),
      (1L, "A", ts("2024-01-04 00:00:00"), 4L),  // back to A -> NEW interval
      (2L, "X", ts("2024-01-01 00:00:00"), 5L)
    ).toDF("k", "attr", "ts", "id")
    val h = Scd2.history(log, Seq("k"), Seq("attr"), "ts", Seq(col("id").asc))
      .orderBy("k", "valid_from").collect()
    val k1 = h.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("A", "B", "A"), "runs collapse, returns reopen")
    // intervals chain: each valid_to equals the next valid_from
    k1.sliding(2).foreach { case Array(a, b) =>
      assert(a.getTimestamp(3) == b.getTimestamp(2), "contiguous intervals")
    }
    assert(h.count(r => r.getBoolean(4)) == 2, "exactly one current row per key")
  }

  test("approxProfile matches exact profile on everything but the distinct estimate") {
    val li = sources.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_returnflag", "l_shipdate", "l_quantity")
    val exact = Profile.profile(li).orderBy("column").collect()
    val approx = Profile.approxProfile(li).orderBy("column").collect()
    assert(exact.length == 5 && approx.length == 5)
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      assert(e.getLong(1) == a.getLong(1), "n_rows must be exact in both")
      assert(e.getLong(2) == a.getLong(2), "n_nulls must be exact in both")
      val (ed, ad) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(ad - ed) / ed < 0.07, s"${e.getString(0)}: approx $ad vs exact $ed")
      assert(e.getString(4) == a.getString(4) && e.getString(5) == a.getString(5),
        "min/max must be exact in both variants")
    }
    // the scale contract: the approx plan must NOT replicate rows (no
    // Expand node), while the exact plan pays it for multiple DISTINCTs
    val approxPlan = Profile.approxProfile(li).queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), s"approx profile must stay single-pass:\n$approxPlan")
  }

  test("intervalJoin equals the naive BETWEEN join and avoids the nested loop") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = sources.Tables.events(spark, sfDir).select("user_id", "ts", "value")
    val win = ev.filter(col("value") > 8.5)
      .select(col("user_id"), col("ts").as("s"),
        (col("ts") + expr("INTERVAL 7 MINUTES")).as("e"))
    val binned = Joins.intervalJoin(ev, win, Seq("user_id"), "ts", "s", "e",
        binSeconds = 120L)
      .select("user_id", "ts", "s")
    val naive = ev.as("p").join(win.as("w"),
        col("p.user_id") === col("w.user_id") &&
          col("p.ts") >= col("s") && col("p.ts") <= col("e"))
      .select(col("p.user_id"), col("p.ts"), col("s"))
    assert(binned.collect().toSet == naive.collect().toSet,
      "binning must not change the matched pair set")
    assert(binned.count() == naive.count(),
      "each pair meets in exactly one bin — no duplicate matches")
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"the binned form must plan as an equi join:\n$plan")
    // empty and inverted intervals are dropped, not walked backwards
    val bad = Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("user_id", "s", "e")
    assert(Joins.intervalJoin(ev, bad, Seq("user_id"), "ts", "s", "e").count() == 0L)
  }

  test("overlapJoin equals the naive overlap join, one row per overlapping pair") {
    import org.apache.spark.sql.functions._
    val ev = sources.Tables.events(spark, sfDir)
    def win(p: String, tpe: String) = ev.filter(col("event_type") === tpe)
      .select(col("user_id"), col("ts").as(s"${p}s"),
        (col("ts") + expr("INTERVAL 9 MINUTES")).as(s"${p}e"))
    val l = win("l", "error")
    val r = win("r", "purchase")
    // 9-minute windows over 4-minute bins: intervals span 3-4 bins, so a
    // pair can meet in several — the later-start-bin rule must still emit
    // each exactly once
    val binned = Joins.overlapJoin(l, r, Seq("user_id"), "ls", "le", "rs", "re",
        binSeconds = 240L)
      .select("user_id", "ls", "rs")
    val naive = l.join(r, Seq("user_id"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("user_id", "ls", "rs")
    assert(binned.collect().toSet == naive.collect().toSet)
    assert(binned.count() == naive.count(), "exactly-once per overlapping pair")
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"the binned overlap form must plan as an equi join:\n$plan")
  }

  test("global shuffle: total, dense per-shard positions, deterministic, seed-sensitive") {
    import graft.operators.Sampling
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey")
    val n = orders.count()
    val got = Sampling.globalShuffle(orders, col("o_orderkey"), "s1", 8).cache()
    assert(got.count() == n, "every row is assigned exactly once")
    assert(got.select("o_orderkey").distinct().count() == n)
    val per = got.groupBy("shard")
      .agg(count(lit(1)).as("c"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(per.length == 8, "all 8 shards are populated")
    per.foreach { r =>
      assert(r.getAs[Long]("lo") == 1L && r.getAs[Long]("hi") == r.getAs[Long]("c"),
        s"positions are dense 1..count within each shard: $r")
    }
    val counts = per.map(_.getAs[Long]("c"))
    assert(counts.max.toDouble / (n.toDouble / 8) < 1.5,
      s"hash sharding stays balanced, got ${counts.toSeq}")
    // identical assignment regardless of input partitioning (no RNG,
    // no partition-index dependence)
    val again = Sampling.globalShuffle(orders.repartition(13),
      col("o_orderkey"), "s1", 8)
    assert(got.except(again).isEmpty && again.except(got).isEmpty)
    // a different seed is a different permutation
    val other = Sampling.globalShuffle(orders, col("o_orderkey"), "s2", 8)
    assert(got.except(other).count() > 0)
    got.unpersist()
  }

  test("MAD outliers: planted spikes flagged where the 3-sigma rule breaks down") {
    import graft.operators.Profile
    import spark.implicits._
    // 40 clean values around 100 plus a 23% mass of 10k spikes — enough
    // to drag mean/sigma until NO spike clears 3 sigma (the classic
    // masking failure); median/MAD must still flag every spike
    val clean = (1 to 40).map(i => (i.toLong, "a", 100.0 + (i % 5)))
    val spikes = (101 to 112).map(i => (i.toLong, "a", 10000.0))
    val df = (clean ++ spikes).toDF("id", "grp", "v")
    val got = Profile.madOutliers(df, "grp", "v").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_outlier")).toMap
    assert(spikes.forall { case (id, _, _) => got(id) },
      "every spike must be flagged")
    assert(clean.forall { case (id, _, _) => !got(id) },
      "no clean value may be flagged")
    // prove the masking: the naive z-rule misses every spike here
    val vs = df.select("v").collect().map(_.getDouble(0))
    val mean = vs.sum / vs.length
    val sigma = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.length)
    assert(math.abs(10000.0 - mean) / sigma < 3.0,
      "fixture must sit in the z-rule's blind spot for the test to mean anything")
    // NULL group keys form their own stratum — they must not vanish
    val withNull = df.unionByName(Seq((200L, null.asInstanceOf[String], 5.0),
      (201L, null.asInstanceOf[String], 5.0)).toDF("id", "grp", "v"))
    val nulls = Profile.madOutliers(withNull, "grp", "v")
      .filter(col("grp").isNull).collect()
    assert(nulls.length == 2 && nulls.forall(!_.getAs[Boolean]("is_outlier")),
      "null-group rows survive the screen with their own med/mad")
  }

  test("curriculum shards: score-monotone within shard, stratified, total") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "n_chars")
    val got = Sampling.curriculumShards(docs, col("doc_id"), col("n_chars"),
      "c1", 4).cache()
    assert(got.count() == docs.count())
    // within every shard, pos order is n_chars-nondecreasing
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("pos")
    val violations = got
      .withColumn("prev", lag("n_chars", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > col("n_chars")).count()
    assert(violations == 0, s"$violations easy→hard order violations")
    // stratification: every shard's mean difficulty is near the global mean
    val global = docs.agg(avg("n_chars")).collect()(0).getDouble(0)
    got.groupBy("shard").agg(avg("n_chars").as("m")).collect().foreach { r =>
      val m = r.getDouble(1)
      assert(math.abs(m - global) / global < 0.15,
        s"shard ${r.getLong(0)} mean $m strays from global $global")
    }
    got.unpersist()
  }

  test("epoch shards: upsampled copies land in independent shards, not together") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val sharded = Sampling.globalShuffle(
      Sampling.upsampleMix(docs, col("doc_id"), "source",
        Map("src0" -> 2.0, "src1" -> 2.0, "src2" -> 2.0, "src3" -> 2.0))
        .select("doc_id", "epoch"),
      concat_ws(":", col("doc_id"), col("epoch")), "e1", 8).cache()
    // hashing (doc, epoch) decorrelates copies: the colocation rate of a
    // doc's two epochs must sit near the 1/8 chance level, far from the
    // 100% a doc-keyed shuffle would produce
    val pairs = sharded.groupBy("doc_id")
      .agg(countDistinct("shard").as("nsh"), count(lit(1)).as("n"))
      .filter(col("n") === 2)
    val colocated = pairs.filter(col("nsh") === 1).count().toDouble
    val total = pairs.count().toDouble
    assert(total > 50, s"need enough duplicated docs to measure, got $total")
    assert(colocated / total < 0.3,
      s"copies must spread across shards (chance = 1/8), got ${colocated / total}")
    sharded.unpersist()
  }

  test("token-budget sample: greedy prefix per stratum, bounded overshoot, monotone") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .withColumn("n_tok",
        size(split(lower(trim(col("text"))), "\\s+")).cast("long"))
    def sample(b: Long) =
      Sampling.tokenBudgetSample(docs, col("doc_id"), "source", col("n_tok"), b)
    val s1 = sample(500L).cache()
    // overshoot is bounded by one document: dropping the last admitted
    // doc must bring every stratum back under budget
    s1.groupBy("source")
      .agg(sum("n_tok").as("s"), max("n_tok").as("m")).collect()
      .foreach { r =>
        assert(r.getAs[Long]("s") - r.getAs[Long]("m") < 500L,
          s"stratum over budget even without its last doc: $r")
      }
    // admitted sets are PREFIXES: a smaller budget is a subset of a larger
    val s2 = sample(2000L)
    assert(s1.select("doc_id").except(s2.select("doc_id")).isEmpty,
      "budget 500 sample must be a subset of budget 2000")
    // a budget beyond the corpus admits everything
    assert(sample(100000000L).count() == docs.count())
    s1.unpersist()
    // gate-ACTIVE regime (threshold < 65536): the skew prefilter must not
    // change the admitted set — compare against the ungated plain rule
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val big = (1L to 2000L).map(i => (i, "s", 7L + i % 8))
      .toDF("doc_id", "stratum", "n_tok")
    val gated = Sampling.tokenBudgetSample(big, col("doc_id"), "stratum",
      col("n_tok"), 300L)
    val w = Window.partitionBy(col("stratum"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val plain = big.withColumn("__cum", sum(col("n_tok")).over(w))
      .filter(col("__cum") - col("n_tok") < 300L).drop("__cum")
    assert(gated.select("doc_id").except(plain.select("doc_id")).isEmpty &&
      plain.select("doc_id").except(gated.select("doc_id")).isEmpty,
      "gated must equal the ungated greedy prefix when the threshold is active")
    assert(gated.count() > 20 && gated.count() < 60,
      s"budget 300 over ~10-token docs admits ~30, got ${gated.count()}")
  }

  test("upsample mix: integer weights duplicate exactly, epochs tag copies, fractions gate") {
    import graft.operators.Sampling
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val full = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.upsampleMix(docs, col("doc_id"), "source",
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 0.0)).cache()
    val bySrc = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 2 * full("src0"), "weight 2.0 is exactly two copies")
    assert(!bySrc.contains("src2"), "weight 0.0 drops the stratum")
    assert(!bySrc.keys.exists(_ == "src3"), "unmapped strata are dropped")
    val rate = bySrc("src1").toDouble / full("src1")
    assert(rate > 0.35 && rate < 0.65, s"weight 0.5 keeps about half, got $rate")
    // (key, epoch) is unique and epochs are dense 1..copies
    assert(got.groupBy("doc_id", "epoch").count().filter(col("count") > 1).isEmpty)
    val epochs = got.filter(col("source") === "src0").groupBy("doc_id")
      .agg(sort_array(collect_list("epoch")).as("e"))
      .select("e").distinct().collect()
    assert(epochs.length == 1 && epochs(0).getSeq[Long](0) == Seq(1L, 2L),
      "every src0 doc carries exactly epochs [1, 2]")
    got.unpersist()
  }

  // ---- seeded-Laplace release noise ----

  test("laplace noise: shape matches Laplace(b), keyed-hash independent, deterministic") {
    import spark.implicits._
    val keys = (1 to 4000).map(i => s"grp$i").toDF("k")
    def noises(seed: String, b: Double): Array[Double] = keys
      .select(Privacy.laplaceNoise(seed, col("k"), b).as("x"))
      .collect().map(_.getDouble(0))
    val x = noises("s1", 1.0)
    // Laplace(1): median |x| = ln 2 ≈ 0.693, mean |x| = 1, symmetric signs
    val absX = x.map(math.abs).sorted
    val medAbs = absX(absX.length / 2)
    assert(math.abs(medAbs - math.log(2)) < 0.08, s"median |x| = $medAbs")
    val meanAbs = absX.sum / absX.length
    assert(math.abs(meanAbs - 1.0) < 0.1, s"mean |x| = $meanAbs")
    val pos = x.count(_ > 0).toDouble / x.length
    assert(math.abs(pos - 0.5) < 0.05, s"sign balance $pos")
    // scale is exactly linear in b (same uniform, scaled inverse CDF)
    val x4 = noises("s1", 4.0)
    assert(x.zip(x4).forall { case (a, b4) => math.abs(b4 - 4 * a) < 1e-9 },
      "Laplace(4b) must be exactly 4x the Laplace(b) deviate per key")
    // deterministic per (seed, key); a new seed redraws
    assert(noises("s1", 1.0).sameElements(x))
    val y = noises("s2", 1.0)
    assert(x.zip(y).count { case (a, b2) => a == b2 } < 5,
      "a different seed must redraw essentially every group's noise")
  }

  test("dp releases: noise centered on the true stat, clipping bounds sensitivity") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val rel = Privacy.dpNoisedCounts(docs, "source", epsilon = 1.0, seed = "r")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rel.size == 3 && rel.values.forall(v => math.abs(v - 100.0) < 30),
      s"eps=1 noise on a count of 100 stays small: $rel")
    // idempotent release: same data + seed => identical artifact
    val again = Privacy.dpNoisedCounts(docs, "source", epsilon = 1.0, seed = "r")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again == rel)
    // clipping: an adversarial outlier moves the released sum by at most
    // cap (the whole point of bounded sensitivity)
    val base = (1L to 100L).map(i => ("g", 10L)).toDF("source", "v")
    val spiked = base.union(Seq(("g", 1000000L)).toDF("source", "v"))
    def rsum(df: org.apache.spark.sql.DataFrame): Double =
      Privacy.dpNoisedSums(df, "source", "v", cap = 50L, epsilon = 1.0, seed = "r")
        .collect()(0).getDouble(1)
    assert(rsum(spiked) - rsum(base) == 50.0,
      "the outlier contributes exactly its clipped value")
  }

  test("ES weighted sampling: weight-proportional, without replacement, deterministic") {
    import spark.implicits._
    // 3000 independent strata, each {a: w=9, b: w=1}, k=1 — the draw
    // frequency of `a` estimates P(a) = 0.9 (single job, no seed loop)
    val df = (0 until 3000).flatMap(g =>
      Seq((g, g * 2L, 9.0, "a"), (g, g * 2L + 1, 1.0, "b")))
      .toDF("grp", "id", "w", "tag")
    def draw(seed: String) = Sampling.weightedSampleWithoutReplacement(
      df, col("id"), "w", k = 1, seed = seed, stratumCol = Some("grp"))
    val fracA = draw("s1").filter(col("tag") === "a").count() / 3000.0
    assert(math.abs(fracA - 0.9) < 0.03, s"P(draw a) should be ~0.9: $fracA")
    // without replacement: k = group size returns everything once
    val all = Sampling.weightedSampleWithoutReplacement(
      df, col("id"), "w", k = 2, seed = "s1", stratumCol = Some("grp"))
    assert(all.count() == 6000 && all.select("id").distinct().count() == 6000)
    // zero / negative weights never sample
    val wz = Seq((1L, 5.0), (2L, 0.0), (3L, -1.0)).toDF("id", "w")
    val got = Sampling.weightedSampleWithoutReplacement(
      wz, col("id"), "w", k = 3, seed = "x").select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), s"only the positive weight samples: $got")
    // deterministic per seed; a new seed reshuffles some draws
    val a1 = draw("s1").select("id").collect().map(_.getLong(0)).toSet
    assert(a1 == draw("s1").select("id").collect().map(_.getLong(0)).toSet)
    val a2 = draw("s2").select("id").collect().map(_.getLong(0)).toSet
    assert((a1 diff a2).nonEmpty, "a different seed must redraw some strata")
  }

  test("count-min sketch: never under-counts, merge == whole, exact at generous width") {
    import spark.implicits._
    val toks = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(explode(graft.ext.TextStats.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val truth = toks.groupBy("term").agg(count(lit(1)).as("true_cnt"))
    val sk = Profile.countMinSketch(toks, "term", depth = 4, width = 64,
      seed = "t")
    // the one-sided guarantee, for EVERY key in the stream (not a sample):
    // min-of-rows can only over-count
    val under = Profile.countMinEstimate(sk, truth, "term", depth = 4,
        width = 64, seed = "t")
      .join(truth, "term").filter(col("est_cnt") < col("true_cnt")).count()
    assert(under == 0, "CMS must never under-estimate")
    // mergeability: per-half sketches re-summed == whole-stream sketch
    val h1 = Profile.countMinSketch(toks.filter(md5(col("term")).startsWith("0") ||
      ascii(md5(col("term"))) % 2 === 0), "term", depth = 4, width = 64, seed = "t")
    val h2 = Profile.countMinSketch(toks.filter(!(md5(col("term")).startsWith("0") ||
      ascii(md5(col("term"))) % 2 === 0)), "term", depth = 4, width = 64, seed = "t")
    val merged = h1.unionByName(h2).groupBy("row", "bucket")
      .agg(sum("cnt").as("cnt"))
    assert(merged.exceptAll(sk).isEmpty && sk.exceptAll(merged).isEmpty,
      "summed half-stream sketches must equal the whole-stream sketch")
    // generous width (>> vocab): no collisions, every estimate exact
    val wide = Profile.countMinSketch(toks, "term", depth = 4, width = 1 << 16,
      seed = "t")
    val inexact = Profile.countMinEstimate(wide, truth, "term", depth = 4,
        width = 1 << 16, seed = "t")
      .join(truth, "term").filter(col("est_cnt") =!= col("true_cnt")).count()
    assert(inexact == 0, "at width >> vocab the sketch is exact")
  }

  test("gumbel top-k == ES sampling on exp-able weights; shift-invariant; null-safe") {
    import spark.implicits._
    // same draw, two formulations: gumbelTopK(ln w) must select the same
    // rows in the same order as the ES score -ln(u)/w (its key is the ln
    // of the ES key, a monotone map)
    val df = (0 until 500).map(i => (i.toLong, 0.1 + (i * 7 % 100) / 10.0))
      .toDF("id", "w").withColumn("lw", log(col("w")))
    val es = Sampling.weightedSampleWithoutReplacement(
        df, col("id"), "w", k = 40, seed = "gk")
      .select("id").collect().map(_.getLong(0)).toSet
    val gk = Sampling.gumbelTopK(df, col("id"), "lw", k = 40, seed = "gk")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gk == es, "log-space and linear-space draws must agree")
    // shift invariance: +1000 nats on every log weight — far past where
    // exp() would overflow — leaves the selection untouched
    val shifted = Sampling.gumbelTopK(
        df.withColumn("lw", col("lw") + 1000.0), col("id"), "lw",
        k = 40, seed = "gk")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(shifted == gk)
    // null log weights never sample
    val wn = Seq((1L, Some(0.0)), (2L, None)).toDF("id", "lw")
    assert(Sampling.gumbelTopK(wn, col("id"), "lw", k = 2, seed = "x")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("dsir log-weights favor the target slice; partition-invariant fold") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    def lw(d: org.apache.spark.sql.DataFrame) =
      graft.ext.TextStats.dsirLogWeights(d, "doc_id", "text",
        col("lang") === "en", buckets = 128)
    val means = lw(docs).join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy(col("lang") === "en").agg(avg("log_weight").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} must exceed non-en ${means(false)}")
    assert(lw(docs).orderBy("doc_id").collect().toSeq ==
      lw(docs.repartition(7)).orderBy("doc_id").collect().toSeq)
  }

  test("first-touch attribution equals the sequential reference walk") {
    val rows = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // reference: walk each user's (ts, id)-ordered events, 30-min gap
    // opens a session, purchases credit the session's first event
    val expect: Map[Long, (Long, String)] =
      rows.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
        var lastTs = Long.MinValue
        var first: (Long, String) = null
        evs.sortBy(e => (e._3, e._1)).toSeq.flatMap { case (id, _, ts, tpe) =>
          if (first == null || ts - lastTs > 1800000000L) first = (id, tpe)
          lastTs = ts
          if (tpe == "purchase") Seq(id -> first) else Nil
        }
      }.toMap
    val got = SparkEntry.queries("w12_first_touch")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
    assert(got.size == expect.size && expect.forall { case (k, v) => got(k) == v },
      s"${got.size} purchases must match the reference walk (${expect.size})")
    // sanity: some purchase opens its own session, some doesn't
    val self = got.count { case (id, (aid, _)) => id == aid }
    assert(self > 0 && self < got.size, s"self-attributed: $self/${got.size}")
  }

  test("equi-depth histogram: equal populations, ordered disjoint bounds, skew-proof") {
    import spark.implicits._
    // heavy skew: 900 values at ~0 plus a 100-value long tail — a fixed-
    // width histogram puts 900 in one bar; equi-depth keeps buckets equal
    val df = ((0 until 900).map(i => (i.toLong, "g", i / 1000.0)) ++
      (0 until 100).map(i => (900L + i, "g", 100.0 + i * 50.0)))
      .toDF("id", "grp", "v")
    val h = Profile.equiDepthHistogram(df, "grp", "v", "id", buckets = 10)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(h.length == 10)
    assert(h.forall(_._2 == 100), s"equal population everywhere: ${h.toSeq}")
    // bounds ascend and never overlap across buckets
    for (pair <- h.sliding(2); a = pair(0); b = pair(1))
      assert(a._4 <= b._3,
        s"bucket ${a._1} hi ${a._4} must not pass bucket ${b._1} lo ${b._3}")
    assert(h.last._3 >= 100.0, "the tail occupies its own bucket(s)")
    // deterministic under ties: constant values split by id, stable
    val ties = (0L until 40L).map(i => (i, "g", 7.0)).toDF("id", "grp", "v")
    val t1 = Profile.equiDepthHistogram(ties, "grp", "v", "id", 4).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(t1 == Set((1, 10L), (2, 10L), (3, 10L), (4, 10L)))
    val t2 = Profile.equiDepthHistogram(ties.repartition(7), "grp", "v", "id", 4)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(t2 == t1, "the id tiebreak makes tied splits partition-invariant")
  }

  test("quality-tiered mix: keep rate rises with tier, top keeps all, rate-monotone") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i, i.toDouble)).toDF("id", "score")
    val kept = Sampling.qualityTieredMix(df, col("id"), "score", tiers = 10)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    val byTier = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byTier(10) == 500, "the top tier keeps everything")
    assert(byTier.getOrElse(1, 0) < byTier(5) && byTier(5) < byTier(10),
      s"keep counts must rise with tier: $byTier")
    val r1 = byTier.getOrElse(1, 0) / 500.0
    assert(math.abs(r1 - 0.1) < 0.05, s"bottom tier keeps ~10%: $r1")
    // halving topRate halves every tier's threshold -> kept set shrinks
    // to a SUBSET (the md5 gate is a nested prefix family)
    val half = Sampling.qualityTieredMix(df, col("id"), "score",
      tiers = 10, topRate = 0.5).collect().map(_.getLong(0)).toSet
    val full = kept.map(_._1).toSet
    assert(half.subsetOf(full) && half.size < full.size,
      s"rate monotonicity: ${half.size} vs ${full.size}")
    // deterministic
    val again = Sampling.qualityTieredMix(df, col("id"), "score", tiers = 10)
      .collect().map(_.getLong(0)).toSet
    assert(again == full)
  }

  test("pagerank: symmetric cycle ties, hubs dominate, mass bounded, invariant") {
    import spark.implicits._
    // 2-cycle: perfect symmetry must give identical ranks
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val rc = Graph.pageRank(cyc, "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rc(1L) == rc(2L) && math.abs(rc(1L) - 0.5) < 1e-12,
      s"the 2-cycle is stationary at 0.5/0.5: $rc")
    // star: every leaf points at the hub — hub rank far above leaves
    val star = (1L to 20L).map(i => (i, 0L)).toDF("src", "dst")
    val rs = Graph.pageRank(star, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rs(0L) > 10 * rs(1L), s"hub must dominate: $rs")
    assert((1L to 20L).map(rs).distinct.size == 1, "leaves tie exactly")
    // total mass bounded by 1 (dangling leak only shrinks it)
    assert(rs.values.sum <= 1.0 + 1e-9 && rs.values.sum > 0.2)
    // partition invariance (the deterministic ordered in-edge fold)
    val big = (0L until 300L).flatMap(i =>
      Seq((i, (i + 1) % 300), (i, (i * 7 + 3) % 300), (i, i % 10)))
      .toDF("src", "dst")
    val a = Graph.pageRank(big, "src", "dst", iters = 4, deterministic = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Graph.pageRank(big.repartition(13), "src", "dst", iters = 4,
        deterministic = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, "ranks must be bit-identical across partitionings")
    val hubMin = (0L until 10L).map(a).min
    val nonHubMax = (10L until 300L).map(a).max
    assert(hubMin > nonHubMax, "the 10 hub nodes outrank every other node")
    // the DEFAULT (bounded-state sum) path agrees with the fold to IEEE
    // reassociation error — the scale path is numerically the same model
    val s = Graph.pageRank(big.repartition(13), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s.keySet == a.keySet)
    val maxDiff = a.map { case (k, v) => math.abs(v - s(k)) }.max
    assert(maxDiff < 1e-12, s"sum path diverged from fold: $maxDiff")
  }

  test("dup-graph pagerank: the template doc at a near-dup hub outranks the periphery") {
    import spark.implicits._
    // undirected star (a "template" text with 5 partial near-dups) plus a
    // detached symmetric pair; note pure symmetric components rank FLAT
    // (regular graphs are stationary at uniform) — centrality only
    // separates asymmetric duplication structure, which is the signal
    val star = (1L to 5L).flatMap(i => Seq((0L, i), (i, 0L))) ++
      Seq((10L, 11L), (11L, 10L))
    val r = Graph.pageRank(star.toDF("src", "dst"), "src", "dst", iters = 8)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) > 2 * r(1L), s"the hub template must dominate its variants: $r")
    assert((1L to 5L).map(r).distinct.size == 1, "variants tie exactly")
    assert(r(10L) == r(11L), "the detached symmetric pair ties exactly")
  }

  test("psi drift: zero on self, monotone in shift, partition-invariant") {
    import spark.implicits._
    def dist(mean: Int, n: Int): org.apache.spark.sql.DataFrame =
      (0 until n).map(i => mean + (i % 21) - 10).toDF("v")
    val ref = dist(100, 2000)
    val self = Profile.psi(ref, ref, "v", binWidth = 5.0).collect()(0)
    assert(self.getDouble(3) == 0.0, s"identical distributions: $self")
    assert(self.getLong(0) == 2000 && self.getLong(1) == 2000)
    val small = Profile.psi(ref, dist(105, 500), "v", 5.0).collect()(0).getDouble(3)
    val large = Profile.psi(ref, dist(140, 500), "v", 5.0).collect()(0).getDouble(3)
    assert(small > 0.0 && large > small,
      s"a bigger mean shift must score higher: $small vs $large")
    assert(large > 0.25, s"a disjoint-support shift is 'shifted' territory: $large")
    val re = Profile.psi(ref.repartition(7), dist(105, 500).repartition(5), "v", 5.0)
      .collect()(0).getDouble(3)
    assert(re == small, "the ordered fold makes psi partition-invariant")
  }

}
