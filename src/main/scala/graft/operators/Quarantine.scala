package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality split (SURVEY §2.2 P6/P7): bad rows are diverted to a
  * quarantine side-output, never deleted (Silver_full_load.ipynb:cell 8
  * `create_quarantine_records`; rationale README.md:178-181).
  *
  * The predicate is a dynamic OR-fold over schema-discovered columns:
  *   - every date/timestamp column (except the ingest audit ts) more than
  *     `horizonDays` past `refDate` (default 730d past current_date)
  *   - every floating "value" column outside (minVal, maxVal)
  *     (canonical Spark variant matches `value` in the name only — the
  *     pandas twin also matched `amount`; we implement the Spark one,
  *     SURVEY §2.12).
  *
  * One `persist`-free pass: callers get two lazily-filtered frames off the
  * same child plan; cache the input if both sides are consumed.
  */
object Quarantine {

  final case class Rules(
      refDate: Column = current_date(),
      horizonDays: Int = 730,
      maxVal: Double = 1e8,
      minVal: Double = -1e7,
      valueColMatch: String => Boolean = _.toLowerCase.contains("value"),
      dateColExclude: Set[String] = Set("dwcreateddate"))

  /** The schema-discovered (predicate, rule-name) list `predicate`/`split`
    * fold and `report` aggregates. */
  def rulePreds(df: DataFrame, rules: Rules): Seq[(Column, String)] = {
    val dateCols = df.schema.fields.collect {
      case f if (f.dataType == DateType || f.dataType == TimestampType ||
        f.dataType == TimestampNTZType) &&
        f.name.toLowerCase.endsWith("date") &&
        !rules.dateColExclude.contains(f.name.toLowerCase) => f.name
    }.toSeq
    val valueCols = df.schema.fields.collect {
      case f if (f.dataType == DoubleType || f.dataType == FloatType) &&
        rules.valueColMatch(f.name) => f.name
    }.toSeq
    val cutoff = date_add(rules.refDate, rules.horizonDays)
    dateCols.map(c => (col(c) > cutoff, s"future_date:$c")) ++
      valueCols.map(c =>
        (col(c) > lit(rules.maxVal) || col(c) < lit(rules.minVal), s"out_of_range:$c"))
  }

  /** Build the quarantine predicate (true == row is bad) plus a reason
    * column, from the DataFrame's schema. */
  def predicate(df: DataFrame, rules: Rules): (Column, Column) = {
    val all = rulePreds(df, rules)
    val bad = all.map(_._1).reduceOption(_ || _).getOrElse(lit(false))
    val reason = all.foldLeft(lit(null).cast(StringType)) { case (acc, (p, r)) =>
      when(acc.isNull && p, lit(r)).otherwise(acc)
    }
    (bad, reason)
  }

  /** Data-quality expectations report: ONE conditional-sum aggregation pass
    * producing long-format (rule, n_violations) plus a `total_rows` row —
    * the per-load summary a pipeline publishes next to the quarantine
    * side-output. Map-side combinable; never materializes violating rows,
    * so it costs a scan regardless of how dirty the table is. */
  def report(df: DataFrame, rules: Rules = Rules()): DataFrame = {
    val preds = rulePreds(df, rules)
    val aggs = preds.map { case (p, r) => sum(when(p, 1L).otherwise(0L)).as(r) } :+
      count(lit(1)).as("total_rows")
    val names = preds.map(_._2) :+ "total_rows"
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(names.map(n =>
        struct(lit(n).as("rule"), col(s"`$n`").as("n"))): _*)).as("e"))
      .select("e.rule", "e.n")
  }

  /** Returns (clean, quarantined-with-reason). */
  def split(df: DataFrame, rules: Rules = Rules()): (DataFrame, DataFrame) = {
    val (bad, reason) = predicate(df, rules)
    val clean = df.filter(!coalesce(bad, lit(false)))
    val quarantined = df.filter(coalesce(bad, lit(false)))
      .withColumn("quarantine_reason", reason)
    (clean, quarantined)
  }

  /** P7: drop rows where every column is null. */
  def dropAllNull(df: DataFrame): DataFrame = df.na.drop("all")
}
