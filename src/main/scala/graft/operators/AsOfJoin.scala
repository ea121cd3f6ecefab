package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the LATEST right row with
  * `right.time <= left.time`, matched on equal keys — the temporal join
  * behind point-in-time feature lookup, slowly-changing-rate application,
  * and "state as of event time" enrichment.
  *
  * Spark-first shape: tag both sides, union, and carry the last right-row
  * payload forward with a window scan ordered by (time, right-first).
  * That is ONE shuffle on the keys and a linear scan per key — never the
  * O(L·R) range cross-join a naive `l.ts >= r.ts` join would plan, and it
  * stays skew-safe because the window runs per key partition. At 100 TB
  * both inputs shuffle once on the same keys; no broadcast required.
  */
object AsOfJoin {

  /** For each `left` row: the latest `right` row at-or-before the left
    * row's `timeCol` with equal `keys`, exposing the right-side
    * `valueCols` as `prefix + name` (null when nothing matches).
    *
    * Right rows AT the left row's timestamp are visible (`<=`, DuckDB
    * `ASOF JOIN ... ON l.t >= r.t` semantics). Ties among right rows with
    * identical (keys, time) resolve by `rightTiebreak` ascending, last
    * wins — pass a unique column for determinism.
    *
    * `toleranceSeconds`: when set, a match older than the tolerance
    * (left.time - right.time > tolerance) is nulled out — pandas
    * `merge_asof(tolerance=...)` semantics.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           timeCol: String, valueCols: Seq[String],
           prefix: String = "asof_",
           rightTiebreak: Seq[String] = Seq.empty,
           toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // pack payload + right time into ONE struct so `last(_, ignoreNulls)`
    // treats "a right row exists" as the non-null unit — a null VALUE in
    // the latest right row must still win (ignoreNulls on a bare value
    // column would skip back to an older right row)
    val packed = struct(
      (col(timeCol).as("_rt") +: valueCols.map(col)) ++
        rightTiebreak.map(c => col(c).as(s"_tb_$c")): _*)
    val r = right.select(keys.map(col) :+ packed.as("_rv"): _*)
      .withColumn(timeCol, col("_rv._rt"))
      .withColumn("_is_right", lit(1))
    val l = left.withColumn("_is_right", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)

    val tieOrder = rightTiebreak.map(c => col("_rv").getField(s"_tb_$c").asc)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc +: col("_is_right").desc +: tieOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = u.withColumn("_last_rv", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_is_right") === 0)
    val gated = toleranceSeconds match {
      case Some(tol) => carried.withColumn("_last_rv",
        when(unix_micros(col(timeCol).cast("timestamp")) -
          unix_micros(col("_last_rv._rt").cast("timestamp")) <= tol * 1000000L,
          col("_last_rv")))
      case None => carried
    }
    val out = valueCols.foldLeft(gated) { (d, v) =>
      d.withColumn(prefix + v, col(s"_last_rv.$v"))
    }
    out.select(leftCols.map(col) ++ valueCols.map(v => col(prefix + v)): _*)
  }
}
