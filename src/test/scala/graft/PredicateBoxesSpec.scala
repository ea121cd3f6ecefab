package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.SkippingIndex
import graft.sources.SkippingIndex.{ColRange, StrRange}

/** Predicate → bounding-box extraction ([[SkippingIndex.boxesOf]]):
  * shape coverage, the conservativeness property under RANDOM predicates
  * (every matching row lies inside every extracted box — the caller
  * contract of the bounded DML verbs, so it must hold by construction),
  * and the end-to-end auto-prune paths (readWhere / deleteWherePredicate
  * / updateWhere without hand-written boxes). */
class PredicateBoxesSpec extends SparkSpecBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", DoubleType),
    StructField("s", StringType), StructField("d", DateType)))

  private def boxes(c: Column) = SkippingIndex.boxesOf(spark, schema, c)

  test("comparison shapes extract the expected ranges, either operand order") {
    assert(boxes(col("a") > 5) == (Seq(ColRange("a", 5, Double.PositiveInfinity)), Nil))
    assert(boxes(lit(5) > col("a")) == (Seq(ColRange("a", Double.NegativeInfinity, 5)), Nil))
    assert(boxes(col("a") === 7L) == (Seq(ColRange("a", 7, 7)), Nil))
    assert(boxes(col("a").between(3, 9)) == (Seq(ColRange("a", 3, 9)), Nil))
    assert(boxes(col("s") === "x") == (Nil, Seq(StrRange("s", "x", "x"))))
    assert(boxes(col("s").between("m", "p")) == (Nil, Seq(StrRange("s", "m", "p"))))
    assert(boxes(col("a").isin(4, 17, 9)) == (Seq(ColRange("a", 4, 17)), Nil))
    assert(boxes(col("s").isin("q", "d")) == (Nil, Seq(StrRange("s", "d", "q"))))
  }

  test("AND intersects per column; OR hulls; one-sided OR columns drop") {
    assert(boxes(col("a") >= 2 && col("a") <= 8 && col("b") === 1.5) ==
      (Seq(ColRange("a", 2, 8), ColRange("b", 1.5, 1.5)), Nil))
    // unsatisfiable conjunction: empty range (prunes everything, correctly)
    val (nr, _) = boxes(col("a") > 8 && col("a") < 2)
    assert(nr == Seq(ColRange("a", 8, 2)))
    // OR hull over the same column
    assert(boxes(col("a").between(1, 3) || col("a").between(7, 9)) ==
      (Seq(ColRange("a", 1, 9)), Nil))
    // OR where only one side constrains b: b drops, a survives as hull
    assert(boxes((col("a") === 1 && col("b") === 2.0) || col("a") === 5) ==
      (Seq(ColRange("a", 1, 5)), Nil))
    // OR with an unboundable side: everything drops
    assert(boxes(col("a") === 1 || length(col("s")) > 2) == (Nil, Nil))
  }

  test("unknown shapes, functions, nulls, and unprunable types yield no boxes") {
    assert(boxes(length(col("s")) > 2) == (Nil, Nil))
    assert(boxes(!(col("a") === 5)) == (Nil, Nil))
    assert(boxes(col("a").isNull) == (Nil, Nil))
    assert(boxes(col("d") > lit(java.sql.Date.valueOf("1995-01-01"))) == (Nil, Nil))
    assert(boxes(col("s") > "m") == (Nil, Nil)) // one-sided string: no encoding
    assert(boxes(col("a") <=> lit(null)) == (Nil, Nil))
    // a predicate that does not resolve against the schema: no boxes
    assert(boxes(col("nope") === 1) == (Nil, Nil))
  }

  test("PROPERTY: every row a random predicate matches lies inside every extracted box") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(400) { i =>
      (rnd.nextInt(100).toLong, rnd.nextDouble() * 50,
        ("" + ('a' + rnd.nextInt(26)).toChar) * (1 + rnd.nextInt(3)))
    }
    val df = rows.toDF("a", "b", "s")
    def leaf(): Column = rnd.nextInt(7) match {
      case 0 => col("a") > rnd.nextInt(100)
      case 1 => col("a") <= rnd.nextInt(100)
      case 2 => col("a") === rnd.nextInt(100)
      case 3 => col("b").between(rnd.nextInt(25), 25 + rnd.nextInt(25))
      case 4 => col("s") === ("" + ('a' + rnd.nextInt(26)).toChar)
      case 5 => col("a").isin(Seq.fill(3)(rnd.nextInt(100)): _*)
      case 6 => length(col("s")) > rnd.nextInt(3) // unboundable leaf
    }
    def gen(depth: Int): Column =
      if (depth == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => gen(depth - 1) && gen(depth - 1)
        case 1 => gen(depth - 1) || gen(depth - 1)
        case _ => leaf()
      }
    (1 to 60).foreach { i =>
      val pred = gen(2)
      val (nr, sr) = SkippingIndex.boxesOf(spark, df.schema, pred)
      val inBox = (nr.map(r =>
          col(r.column).cast("double") >= lit(r.lo) &&
            col(r.column).cast("double") <= lit(r.hi)) ++
        sr.map(r => col(r.column) >= lit(r.lo) && col(r.column) <= lit(r.hi)))
        .reduceOption(_ && _).getOrElse(lit(true))
      val escapees = df.filter(pred && !coalesce(inBox, lit(false))).count()
      assert(escapees == 0L,
        s"round $i: $escapees matching rows escaped boxes nr=$nr sr=$sr for $pred")
    }
  }

  test("readWhere auto-prunes the scan and returns exactly the filtered rows") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("pboxes_read").toString
    new java.io.File(root).delete()
    val df = (0 until 2000).map(i => (i.toLong, s"g${i % 7}", i * 1.5))
      .toDF("id", "grp", "v")
    VersionedTable.overwrite(spark, root,
      df.repartitionByRange(8, col("id")).sortWithinPartitions("id"))
    val pred = col("id").between(100L, 199L) && col("grp") =!= "g3"
    val got = VersionedTable.readWhere(spark, root, pred)
      .select("id").as[Long].collect().sorted
    val want = df.filter(pred).select("id").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq)
    // the scan really pruned: the extracted box survives 1 of 8 files
    val (nr, sr) = SkippingIndex.boxesOf(spark, df.schema, pred)
    val m = VersionedTable.statsManifest(root).get
    assert(m.survivors(nr, sr).size == 1)
    // an unboundable predicate still answers exactly (full scan path)
    val hard = length(col("grp")) === 2
    assert(VersionedTable.readWhere(spark, root, hard).count() ==
      df.filter(hard).count())
  }

  test("deleteWherePredicate and updateWhere auto-prune without caller boxes") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("pboxes_dml").toString
    new java.io.File(root).delete()
    val df = (0 until 2000).map(i => (i.toLong, s"g${i % 7}", i * 1.0))
      .toDF("id", "grp", "v")
    VersionedTable.overwrite(spark, root,
      df.repartitionByRange(8, col("id")).sortWithinPartitions("id"))
    // no boxes passed: extraction bounds the delete to 1 of 8 files
    val (_, rw, carried) = VersionedTable.deleteWherePredicate(spark, root,
      col("id").between(300L, 349L) && col("grp") === "g1")
    assert(rw == 1, s"auto-extracted box should isolate 1 file, rewrote $rw")
    assert(carried == 7)
    val expectDel = df.filter(col("id").between(300L, 349L) && col("grp") === "g1").count()
    assert(VersionedTable.read(spark, root).count() == 2000 - expectDel)
    // update: same auto-bound behavior
    val (_, rwU, carU) = VersionedTable.updateWhere(spark, root,
      col("id").between(1000L, 1049L), Map("v" -> (col("v") + 100000)))
    assert(rwU == 1 && carU == 7, s"auto-bounded update touched $rwU/$carU")
    assert(VersionedTable.read(spark, root)
      .filter(col("v") >= 100000).count() == 50)
  }

  test("DECIMAL stats are SCALED: readWhere / SQL / delete answer exactly (ADVICE r12)") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("pboxes_dec").toString
    new java.io.File(root).delete()
    // ADVICE r12's empirical case: DECIMAL(12,2) 0.50..2.00 — unscaled
    // footer bounds (min 50, max 200) made `price <= 1.00` prune every
    // file and return 0 rows. 20 cycles of 151 cent values; a second
    // int32-backed DECIMAL(7,2) covers the narrow physical type.
    val df = (0 until 3020).map(i => (i.toLong, 50 + i % 151)).toDF("id", "cents")
      .withColumn("price", (col("cents") / 100).cast(DecimalType(12, 2)))
      .withColumn("price7", (col("cents") / 100).cast(DecimalType(7, 2)))
      .drop("cents")
    VersionedTable.overwrite(spark, root,
      df.repartitionByRange(8, col("price")).sortWithinPartitions("price"))
    val one = lit(new java.math.BigDecimal("1.00"))
    val truth = 20L * 51L // cents 50..100 inclusive, 20 cycles
    assert(VersionedTable.readWhere(spark, root, col("price") <= one).count() == truth)
    // plain SQL over the planner-integrated table() — the silent-wrong-
    // results path the advice flagged
    VersionedTable.table(spark, root).createOrReplaceTempView("dec_t")
    assert(spark.sql("SELECT count(*) c FROM dec_t WHERE price <= 1.00")
      .head().getLong(0) == truth)
    // the scaled stats still PRUNE: [0.50,1.00] of a 0.50..2.00 range-
    // partitioned table survives a strict subset of the 8 files
    val (nr, sr) = SkippingIndex.boxesOf(spark,
      VersionedTable.schemaOf(root).get, col("price") <= one)
    val surv = VersionedTable.statsManifest(root).get.survivors(nr, sr)
    assert(surv.size < 8 && surv.nonEmpty, s"expected real pruning, got $surv")
    // bounded DELETE on the int32-backed decimal: exact, and bounded
    val (_, rw, _) = VersionedTable.deleteWherePredicate(spark, root,
      col("price7") === lit(new java.math.BigDecimal("0.77")))
    assert(rw < 8, s"equality on a sorted decimal should prune, rewrote $rw")
    assert(VersionedTable.read(spark, root).count() == 3020L - 20L)
    // exactness contract: decimal MIN/MAX is refused (ulp-widened
    // bounds are for pruning, not serving) — callers fall back to scan
    assert(VersionedTable.statsMinMax(root, "price").isEmpty)
  }

  test("PROPERTY: decimal predicates never prune a file holding a matching row") {
    import graft.sources.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("pboxes_decprop").toString
    new java.io.File(root).delete()
    val rnd = new scala.util.Random(7)
    val df = (0 until 4000).map(i => (i.toLong, rnd.nextInt(20000)))
      .toDF("id", "cents")
      .withColumn("p", (col("cents") / 100).cast(DecimalType(12, 2)))
      .drop("cents")
    VersionedTable.overwrite(spark, root, df.repartitionByRange(8, col("p")))
    val m = VersionedTable.statsManifest(root).get
    val schema = VersionedTable.schemaOf(root).get
    val full = VersionedTable.read(spark, root)
      .withColumn("__f", input_file_name())
    (1 to 25).foreach { i =>
      val a = new java.math.BigDecimal(rnd.nextInt(20000)).movePointLeft(2)
      val b = new java.math.BigDecimal(rnd.nextInt(20000)).movePointLeft(2)
      val pred = rnd.nextInt(4) match {
        case 0 => col("p") <= lit(a)
        case 1 => col("p") >= lit(a)
        case 2 => col("p") === lit(a)
        case _ => col("p").between(lit(a.min(b)), lit(a.max(b)))
      }
      val (nr, sr) = SkippingIndex.boxesOf(spark, schema, pred)
      val surv = m.survivors(nr, sr).toSet
      val escapees = full.filter(pred).select("__f").as[String].collect()
        .filterNot(f => surv.exists(s => f.endsWith(s)))
      assert(escapees.isEmpty,
        s"round $i: matching rows escaped pruning for $pred: ${escapees.take(2).toSeq}")
    }
  }
}
