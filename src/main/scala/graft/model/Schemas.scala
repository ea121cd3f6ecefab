package graft.model

import java.sql.Date

/** Typed row models for the FIXED schemas in the engine — the gold star
  * outputs and control rows (SURVEY §1.3: `Dataset[T]` where the schema is
  * static for compile-time field checks; `DataFrame` in the generic
  * bronze/silver machinery where schemas are discovered).
  *
  * Decimal columns surface as `BigDecimal` (exact, matching the engine's
  * order-independent decimal aggregation).
  */
final case class GoldDimCustomer(
    customer_key: Long, customer_name: String, market_segment: String,
    nation_name: String, region_name: String, credit_status: String,
    account_balance: BigDecimal)

final case class GoldDimProduct(
    product_key: Long, product_name: String, brand: String,
    product_type: String, size: Int, size_category: String,
    retail_price: BigDecimal)

final case class GoldFactSales(
    sales_document_number: Long, sales_document_line: Int, customer_key: Long,
    product_key: Long, billing_date: Date, ship_date: Date,
    document_category: String, quantity: BigDecimal, sales_eur: BigDecimal,
    taxes_eur: BigDecimal)

final case class GoldFactOrders(
    order_document_number: Long, customer_key: Long, order_date: Date,
    order_status_group: String, order_priority: String,
    order_value_eur: BigDecimal)

final case class GoldFactBudget(
    customer_key: Long, budget_month: Date, budget_eur: BigDecimal)
