package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.gold.Star
import graft.sources.Tables

object DriveTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[drive] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = Tables.load(spark, d, "lineitem"); li.count()
    val or = Tables.load(spark, d, "orders")
    val cu = Tables.load(spark, d, "customer")
    val rates = Star.rateDim(Tables.load(spark, d, "nation"))

    time("g3 full (sorted)")(noop(Star.factSales(li, or, cu, rates).orderBy("sales_document_number","sales_document_line")))
    time("g3 no sort")(noop(Star.factSales(li, or, cu, rates)))
    time("g3 join only") {
      val o = or.select("o_orderkey", "o_custkey", "o_orderdate")
      val c = cu.select("c_custkey", "c_nationkey")
      noop(li.join(o, li("l_orderkey") === o("o_orderkey"), "left")
        .join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .join(broadcast(rates), c("c_nationkey") === rates("n_nationkey"), "left")
        .select("l_orderkey","l_linenumber","o_custkey","l_partkey"))
    }
    // events decode cost
    val evRaw = Tables.load(spark, d, "events")
    time("events raw count")(evRaw.count())
    time("events decoded (decimal path)")(noop(Tables.events(spark, d).select("event_id","ts","user_id","value")))
    val intDecode = when(col("ts") > lit(1000000000000L),
      timestamp_micros(call_function("div", col("ts"), lit(1000L)).cast(LongType)))
      .otherwise(timestamp_seconds(col("ts")))
    time("events decoded (int div)")(noop(evRaw.withColumn("ts2", intDecode).select("event_id","ts2","user_id","value")))
    time("p2 full current")(noop(SparkEntry.queries("p2_standardize_types")(spark, d)))
    time("g4 full")(noop(SparkEntry.queries("g4_fact_orders")(spark, d)))
    time("a8 full")(noop(SparkEntry.queries("a8_star_measures")(spark, d)))
    spark.stop()
  }
}
