package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** Pins the two-phase global-rank helpers (VERDICT r15 #3) bit-equal to
  * the single-partition window formulations they replaced — top-k set +
  * ranks, exact global row_number, NTILE bucket arithmetic, and the
  * exclusive prefix sum — on adversarial sizes (empty, 1 row, n < t,
  * ties across partition boundaries, skewed partition counts). */
class RanksSpec extends SparkSpecBase {

  private def fixture(n: Int, parts: Int) = {
    val rows = (0 until n).map { i =>
      (i.toLong, (i * 2654435761L % 97).toDouble, (i * 31 % 13).toLong)
    }
    spark.createDataFrame(rows).toDF("id", "score", "toks")
      .repartition(parts)
  }

  test("topK equals the global-window top-k (set and ranks)") {
    for (n <- Seq(0, 1, 7, 500); k <- Seq(1, 5, 25); parts <- Seq(1, 7)) {
      val df = fixture(n, parts)
      val order = Seq(col("score").desc, col("id").asc)
      val expected = df.withColumn("rnk",
          row_number().over(Window.orderBy(order: _*)))
        .filter(col("rnk") <= k)
        .select("id", "score", "toks", "rnk")
        .collect().map(_.toSeq).toSet
      val got = Ranks.topK(df, order, k, bucket = col("id"),
          rankCol = Some("rnk"))
        .select("id", "score", "toks", "rnk")
        .collect().map(_.toSeq).toSet
      assert(got === expected, s"n=$n k=$k parts=$parts")
    }
  }

  test("topK ranks ties identically (id tiebreak crosses buckets)") {
    val df = spark.createDataFrame((0 until 64).map(i => (i.toLong, 1.0)))
      .toDF("id", "score").repartition(5)
    val order = Seq(col("score").desc, col("id").asc)
    val expected = df.withColumn("rnk",
        row_number().over(Window.orderBy(order: _*)))
      .filter(col("rnk") <= 10).collect().map(_.toSeq).toSet
    val got = Ranks.topK(df, order, 10, bucket = col("id"),
        rankCol = Some("rnk"))
      .select("id", "score", "rnk").collect().map(_.toSeq).toSet
    assert(got === expected)
  }

  test("withGlobalRowNumber equals row_number over the global order") {
    for (n <- Seq(0, 1, 9, 500); parts <- Seq(1, 7)) {
      val df = fixture(n, parts)
      val order = Seq(col("score").asc, col("id").asc)
      val expected = df.withColumn("r",
          row_number().over(Window.orderBy(order: _*)).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val (ranked, total) = Ranks.withGlobalRowNumber(df, order, "r")
      val got = ranked.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(total === n.toLong)
      assert(got === expected, s"n=$n parts=$parts")
      graft.util.Caches.releaseAll()
    }
  }

  test("ntileFromRank equals ntile() for every (n, t) shape") {
    for (n <- Seq(1, 2, 9, 10, 97, 500); t <- Seq(2, 3, 10, 16)) {
      val df = fixture(n, 3)
      val order = Seq(col("score").asc, col("id").asc)
      val expected = df.withColumn("b", ntile(t).over(Window.orderBy(order: _*)))
        .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
      val (ranked, total) = Ranks.withGlobalRowNumber(df, order, "gr")
      val got = ranked.withColumn("b", Ranks.ntileFromRank(col("gr"), total, t))
        .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
      assert(got === expected, s"n=$n t=$t")
      graft.util.Caches.releaseAll()
    }
  }

  test("withGlobalPrefixSum equals the exclusive global-window sum") {
    for (n <- Seq(0, 1, 9, 500); parts <- Seq(1, 7)) {
      val df = fixture(n, parts)
      val w = Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)
      val expected = df.withColumn("c", coalesce(sum(col("toks")).over(w), lit(0L)))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val got = Ranks.withGlobalPrefixSum(df, Seq(col("id")), col("toks"), "c")
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got === expected, s"n=$n parts=$parts")
      graft.util.Caches.releaseAll()
    }
  }
}
