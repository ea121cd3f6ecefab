package graft

import org.apache.spark.sql.functions._
import graft.run.Warehouse
import graft.sources.Tables

/** Bucketing: the scale answer for repeated fact-fact equi-joins — both
  * sides bucketed on the key join with NO shuffle exchange in the plan. */
class BucketingSpec extends SparkSpecBase {

  test("bucketed lineitem join orders has no shuffle exchange") {
    val whRoot = java.nio.file.Files.createTempDirectory("graft_buck").toString
    val wh = Warehouse(spark, whRoot)
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    wh.writeBucketed("b_lineitem", li, buckets = 8, Seq("l_orderkey"))
    wh.writeBucketed("b_orders", o, buckets = 8, Seq("o_orderkey"))

    val bl = spark.table("b_lineitem")
    val bo = spark.table("b_orders")
    val joined = bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() == li.count()) // every lineitem has its order

    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
  }
}
