package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 history from a change log: one row per
  * (key, attribute-run) with validity interval and current flag — the
  * standard warehouse shape for "attribute as of time T" lookups (pairs
  * with [[AsOfJoin]] on the consumer side).
  *
  * Shape: one shuffle on the keys, two window passes (change-point filter,
  * then interval close-off) — linear per key, no self-join. Comparison is
  * null-safe (`<=>`) so a null attribute value forms its own run instead
  * of fusing with its neighbors.
  */
object Scd2 {

  /** Collapse `df` (a change log) into SCD2 intervals.
    *
    * @param keys      entity identity columns
    * @param attrs     tracked attribute columns — consecutive equal values
    *                  merge into one interval
    * @param tsCol     event-time column (becomes valid_from)
    * @param tiebreak  total-order tiebreak within equal timestamps (pass a
    *                  unique column for determinism)
    */
  def history(df: DataFrame, keys: Seq[String], attrs: Seq[String],
              tsCol: String, tiebreak: Seq[Column]): DataFrame = {
    val order = (col(tsCol).asc +: tiebreak).toIndexedSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val packed = struct(attrs.map(col): _*)
    val changePoints = df
      .withColumn("__prev", lag(packed, 1).over(w))
      // first row per key (lag null on the STRUCT, which is never null for
      // a present row) or a null-safe attribute change
      .filter(col("__prev").isNull || !(packed <=> col("__prev")))
      .drop("__prev")
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    changePoints
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ attrs).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
