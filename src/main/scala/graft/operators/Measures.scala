package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A7 — the BI measure layer (SURVEY §2.4): filtered SUMs and safe DIVIDE
  * re-expressed as ordinary aggregate expressions, groupable by any dim
  * attribute. Monetary sums run over exact decimals so results are
  * order-independent (a double sum is not associative — at 1000 executors
  * the partial-aggregation order is nondeterministic; decimal sums make the
  * gate hash-stable AND the production answer reproducible).
  */
object Measures {

  /** Cast a monetary double column to exact decimal for order-independent
    * summation. Source values carry ≤2 decimal places. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** `SUM(x) WHERE pred` as a single-pass conditional aggregate. */
  def sumWhere(pred: Column, x: Column): Column = sum(when(pred, x))

  /** Power-BI `DIVIDE(a, b, 0)`: 0 on zero/null divisor. Computed in double
    * (single IEEE op — deterministic given exact decimal inputs). */
  def divide(a: Column, b: Column): Column =
    when(b.isNull || b === 0, lit(0.0)).otherwise(a.cast("double") / b.cast("double"))
}
