package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X5 — date-dimension generator (SURVEY §2.11): the reference builds its
  * calendar with an M-code dataflow over List.Dates (README.md:400-417);
  * here it is `sequence(min, max, 1 day)` + `explode` — one narrow stage,
  * no shuffle, linear in the day count regardless of fact size because the
  * date domain is aggregated first (min/max pushdown-friendly).
  */
object CalendarDim {

  private val SpanishMonths = Seq(
    "Enero", "Febrero", "Marzo", "Abril", "Mayo", "Junio", "Julio",
    "Agosto", "Septiembre", "Octubre", "Noviembre", "Diciembre")

  /** Date parts for one date column `d`: surrogate yyyymmdd key, year,
    * quarter, month number + Spanish name, day. */
  def parts(d: Column): Seq[Column] = {
    val monthName = SpanishMonths.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (name, i)) => when(month(d) === (i + 1), lit(name)).otherwise(acc)
    }
    Seq(
      (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).as("date_key"),
      d.as("date"),
      year(d).as("year"),
      quarter(d).as("quarter"),
      month(d).as("month_num"),
      monthName.as("month_name_es"),
      dayofmonth(d).as("day_of_month"))
  }

  /** Build the calendar spanning the min..max of `dateCol` in `domain`. */
  def fromDomain(domain: DataFrame, dateCol: String): DataFrame = {
    val span = domain.agg(
      to_date(min(col(dateCol))).as("dmin"),
      to_date(max(col(dateCol))).as("dmax"))
    val days = span.select(
      explode(sequence(col("dmin"), col("dmax"), expr("INTERVAL 1 DAY"))).as("d"))
    days.select(parts(col("d")): _*)
  }
}
