package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold star-schema builds (SURVEY §2.3 J1-J8, §2.8 math) instantiated over
  * the TPC-H-ish fixtures: dim_customer / dim_product dims, fact_sales /
  * fact_orders facts with currency conversion + document categorization,
  * and the budget-collapse fact (SURVEY §2.12 quirk).
  *
  * All functions are pure `DataFrame => DataFrame` transforms. Every
  * fact-to-dim join is a left equi-join with an explicit `broadcast()` hint
  * on the dim side — deterministic broadcast at any scale, the same shape
  * the reference emulates by preloading dims (gold_processor.py:113-131).
  * Fact-fact joins (lineitem ⋈ orders) shuffle on the join key only; at
  * 100 TB both sides would be bucketed on orderkey to make it shuffle-free.
  */
object Star {

  /** Typed views of the gold builds (`Dataset[T]` on the fixed schemas —
    * compile-time field checks for downstream consumers; the builds stay
    * `DataFrame` so Catalyst sees identical plans either way). */
  object typed {
    import org.apache.spark.sql.Dataset
    import graft.model._
    def dimCustomer(c: DataFrame, n: DataFrame, r: DataFrame): Dataset[GoldDimCustomer] = {
      val df = Star.dimCustomer(c, n, r); import df.sparkSession.implicits._
      df.as[GoldDimCustomer]
    }
    def factSales(l: DataFrame, o: DataFrame, c: DataFrame,
                  rates: DataFrame): Dataset[GoldFactSales] = {
      val df = Star.factSales(l, o, c, rates); import df.sparkSession.implicits._
      df.as[GoldFactSales]
    }
    def factBudget(o: DataFrame): Dataset[GoldFactBudget] = {
      val df = Star.factBudget(o); import df.sparkSession.implicits._
      df.as[GoldFactBudget]
    }
  }

  /** Exact-decimal money cast: order-independent sums, engine-portable. */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Synthetic currency-rate dim derived from `nation` (plays the reference's
    * dim.Budget-Rate, Gold_full_load.ipynb:cell 8): every third nation has
    * no rate so the `coalesce(rate, 1.0)` default path is exercised.
    * rate = (100 + nationkey) * 0.01, computed in exact decimal. */
  def rateDim(nation: DataFrame): DataFrame =
    nation.filter(col("n_nationkey") % 3 =!= 0)
      .select(
        col("n_nationkey"),
        ((col("n_nationkey") + lit(100)).cast(DecimalType(10, 2)) *
          lit(new java.math.BigDecimal("0.01"))).cast(DecimalType(10, 4)).as("rate"))

  private val defaultRate = lit(new java.math.BigDecimal("1.0000")).cast(DecimalType(10, 4))

  /** Document-category derivation (Gold_full_load.ipynb:cell 8 semantics:
    * known codes map, null -> Unclassified, unknown codes pass through). */
  def docCategory(flag: Column): Column =
    when(flag === "N", "Sale")
      .when(flag === "R", "Return")
      .when(flag === "A", "Adjustment")
      .when(flag.isNull, "Unclassified")
      .otherwise(flag)

  /** gold_dim_customer — J1-style dim chain customer ⋈ nation ⋈ region. */
  def dimCustomer(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"), "left")
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"), "left")
      .select(
        col("c_custkey").as("customer_key"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("market_segment"),
        col("n_name").as("nation_name"),
        col("r_name").as("region_name"),
        when(col("c_acctbal") < 0, "DELINQUENT").otherwise("OK").as("credit_status"),
        dec2(col("c_acctbal")).as("account_balance"))

  /** gold_dim_product — projection + categorization over `part`. */
  def dimProduct(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey").as("product_key"),
      col("p_name").as("product_name"),
      col("p_brand").as("brand"),
      col("p_type").as("product_type"),
      col("p_size").as("size"),
      when(col("p_size") < 10, "S").when(col("p_size") < 25, "M").otherwise("L")
        .as("size_category"),
      dec2(col("p_retailprice")).as("retail_price"))

  /** gold_fact_sales — lineitem enriched with order/customer keys, currency
    * conversion via the rate dim (J5 + coalesce default), doc category.
    * revenue_eur = price * (1 - discount) * rate, exact decimal. */
  def factSales(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                rates: DataFrame): DataFrame = {
    val one = lit(1).cast(DecimalType(3, 2))
    val o = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    val c = customer.select("c_custkey", "c_nationkey")
    lineitem
      .join(o, lineitem("l_orderkey") === o("o_orderkey"), "left")
      .join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(rates), c("c_nationkey") === rates("n_nationkey"), "left")
      .select(
        col("l_orderkey").as("sales_document_number"),
        col("l_linenumber").as("sales_document_line"),
        col("o_custkey").as("customer_key"),
        col("l_partkey").as("product_key"),
        to_date(col("o_orderdate")).as("billing_date"),
        to_date(col("l_shipdate")).as("ship_date"),
        docCategory(col("l_returnflag")).as("document_category"),
        dec2(col("l_quantity")).as("quantity"),
        (dec2(col("l_extendedprice")) * (one - col("l_discount").cast(DecimalType(3, 2))) *
          coalesce(col("rate"), defaultRate)).cast(DecimalType(38, 8)).as("sales_eur"),
        (dec2(col("l_extendedprice")) * col("l_tax").cast(DecimalType(3, 2)) *
          coalesce(col("rate"), defaultRate)).cast(DecimalType(38, 8)).as("taxes_eur"))
  }

  /** gold_fact_orders — orders ⋈ customer ⋈ rates with EUR conversion. */
  def factOrders(orders: DataFrame, customer: DataFrame, rates: DataFrame): DataFrame = {
    val c = customer.select("c_custkey", "c_nationkey")
    orders
      .join(broadcast(c), orders("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(rates), c("c_nationkey") === rates("n_nationkey"), "left")
      .select(
        col("o_orderkey").as("order_document_number"),
        col("o_custkey").as("customer_key"),
        to_date(col("o_orderdate")).as("order_date"),
        when(col("o_orderstatus") === "F", "Closed")
          .when(col("o_orderstatus") === "O", "Open")
          .when(col("o_orderstatus") === "P", "Processing")
          .otherwise("Other").as("order_status_group"),
        col("o_orderpriority").as("order_priority"),
        (dec2(col("o_totalprice")) * coalesce(col("rate"), defaultRate))
          .cast(DecimalType(38, 6)).as("order_value_eur"))
  }

  /** gold_fact_budget — the budget-collapse semantics (SURVEY §2.12): the
    * pattern-key dedup keeps ONE latest row per business key, collapsing the
    * monthly series. Instantiated as: latest order per customer. */
  def factBudget(orders: DataFrame): DataFrame = {
    import graft.operators.Dedup
    Dedup.keepLatest(orders, Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select(
        col("o_custkey").as("customer_key"),
        trunc(to_date(col("o_orderdate")), "month").as("budget_month"),
        dec2(col("o_totalprice")).as("budget_eur"))
  }
}
