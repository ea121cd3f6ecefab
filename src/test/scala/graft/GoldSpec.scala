package graft

import org.apache.spark.sql.functions._
import graft.gold.Star
import graft.sources.Tables

class GoldSpec extends SparkSpecBase {

  private def t(n: String) = Tables.load(spark, sfDir, n)

  test("fact_sales preserves lineitem grain (left joins never multiply rows)") {
    val fs = Star.factSales(t("lineitem"), t("orders"), t("customer"),
      Star.rateDim(t("nation")))
    assert(fs.count() == t("lineitem").count())
  }

  test("fact_budget collapses to one row per customer (quirk semantics)") {
    val fb = Star.factBudget(t("orders"))
    assert(fb.count() == t("orders").select("o_custkey").distinct().count())
  }

  test("missing rates default to 1.0 (coalesce path)") {
    val fo = Star.factOrders(t("orders"), t("customer"), Star.rateDim(t("nation")))
    // nations divisible by 3 have no rate: their order_value_eur == totalprice
    val sample = fo.join(
        t("customer").select(col("c_custkey").as("customer_key"), col("c_nationkey")),
        "customer_key")
      .filter(col("c_nationkey") % 3 === 0)
    val mismatched = sample.join(
        t("orders").select(col("o_orderkey").as("order_document_number"),
          col("o_totalprice")), "order_document_number")
      .filter(col("order_value_eur").cast("double") =!= col("o_totalprice"))
    assert(mismatched.count() == 0)
  }

  test("typed Dataset views decode gold rows into case classes") {
    val ds = gold.Star.typed.factSales(t("lineitem"), t("orders"), t("customer"),
      gold.Star.rateDim(t("nation")))
    val row = ds.orderBy("sales_document_number", "sales_document_line").head()
    assert(row.sales_document_number >= 0 && row.quantity.signum >= 0)
    assert(Set("Sale", "Return", "Adjustment", "Unclassified")
      .contains(row.document_category) || row.document_category.nonEmpty)
    val budget = gold.Star.typed.factBudget(t("orders"))
    assert(budget.count() == t("orders").select("o_custkey").distinct().count())
  }

  test("doc category maps known flags and passes unknown through") {
    import spark.implicits._
    val got = Seq("N", "R", "A", "Z", null).toDF("f")
      .select(Star.docCategory(col("f")).as("c")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("Sale", "Return", "Adjustment", "Z", "Unclassified"))
  }
}
