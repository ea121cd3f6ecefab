package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics: latest right row at-or-before left time per key,
  * equality visible, ties deterministic, tolerance window enforced. */
class AsOfJoinSpec extends SparkSpecBase {

  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = {
    import spark.implicits._
    Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 11:00:00")),
      (3L, "u1", ts("2024-01-01 12:00:00")),
      (4L, "u2", ts("2024-01-01 10:30:00")),
      (5L, "u3", ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "t")
  }

  private lazy val right = {
    import spark.implicits._
    Seq(
      ("u1", ts("2024-01-01 09:00:00"), 100L, 1.0),
      ("u1", ts("2024-01-01 11:00:00"), 101L, 2.0), // equal-ts vs left id=2
      ("u2", ts("2024-01-01 11:00:00"), 200L, 9.0)  // after u2's only event
    ).toDF("user_id", "t", "r_id", "r_val")
  }

  test("as-of picks the latest right row at-or-before each left time") {
    val got = AsOfJoin.asOf(left, right, Seq("user_id"), "t",
      Seq("r_id", "r_val"), rightTiebreak = Seq("r_id"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)))).toMap
    assert(got(1L)._1.contains(100L), "strictly-before match")
    assert(got(2L)._1.contains(101L), "equal-timestamp right row is visible")
    assert(got(3L)._1.contains(101L), "carried forward past the match")
    assert(got(4L)._1.isEmpty, "right row after left time never matches")
    assert(got(5L)._1.isEmpty, "key with no right rows -> null")
  }

  test("tolerance nulls out matches older than the window") {
    val got = AsOfJoin.asOf(left, right, Seq("user_id"), "t",
      Seq("r_id"), rightTiebreak = Seq("r_id"),
      toleranceSeconds = Some(1800L))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(got(1L).isEmpty, "09:00 match is outside a 30-min window of 10:00")
    assert(got(2L).contains(101L), "zero-age match survives")
  }

  test("a null value in the latest right row wins (no skip-back to older rows)") {
    import spark.implicits._
    val r2 = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 100L, Some(1.0)),
      ("u1", ts("2024-01-01 09:30:00"), 101L, None: Option[Double])
    ).toDF("user_id", "t", "r_id", "r_val")
    val got = AsOfJoin.asOf(left, r2, Seq("user_id"), "t",
      Seq("r_id", "r_val"), rightTiebreak = Seq("r_id"))
      .filter(col("event_id") === 1L).head()
    assert(got.getLong(3) == 101L, "latest row matched")
    assert(got.isNullAt(4), "its null value is carried, not the older 1.0")
  }

  test("ties at identical (key, time) resolve to the highest tiebreak") {
    import spark.implicits._
    val r3 = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 7L, 7.0),
      ("u1", ts("2024-01-01 09:00:00"), 9L, 9.0),
      ("u1", ts("2024-01-01 09:00:00"), 8L, 8.0)
    ).toDF("user_id", "t", "r_id", "r_val")
    val got = AsOfJoin.asOf(left, r3, Seq("user_id"), "t",
      Seq("r_id"), rightTiebreak = Seq("r_id"))
      .filter(col("event_id") === 1L).head()
    assert(got.getLong(3) == 9L)
  }
  test("property: asOf equals the naive range-join-then-keep-latest on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // random left/right events over few keys and a small time range to
    // force matches, ties, and no-match cases
    val leftR = (1 to 200).map { i =>
      (i.toLong, s"k${rng.nextInt(5)}", ts(f"2024-01-01 ${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:00"))
    }.toDF("event_id", "user_id", "t")
    val rightR = (1 to 80).map { i =>
      (s"k${rng.nextInt(5)}", ts(f"2024-01-01 ${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:00"),
        (1000 + i).toLong, rng.nextInt(100).toDouble)
    }.toDF("user_id", "t", "r_id", "r_val")

    val got = AsOfJoin.asOf(leftR, rightR, Seq("user_id"), "t",
      Seq("r_id"), rightTiebreak = Seq("r_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap

    // naive reference: inequality join + keep the (max t, max r_id) match
    val l = leftR.select(col("event_id"), col("user_id").as("lu"), col("t").as("lt"))
    val r = rightR.select(col("user_id").as("ru"), col("t").as("rt"), col("r_id"))
    val naive = l.join(r, col("lu") === col("ru") && col("lt") >= col("rt"), "left")
    val best = graft.operators.Dedup.keepLatest(naive, Seq("event_id"),
      Seq(col("rt").desc_nulls_last, col("r_id").desc_nulls_last))
      .collect().map(r2 => r2.getLong(0) ->
        (if (r2.isNullAt(5)) None else Some(r2.getLong(5)))).toMap

    assert(got == best, "window carry-forward must equal the naive range join")
  }

  test("integration: as-of lookup against SCD2 history returns the attribute as of event time") {
    import spark.implicits._
    import graft.operators.Scd2
    // change log: user 1 is A, then B, then A again
    val log = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "B", ts("2024-01-05 00:00:00"), 2L),
      (1L, "A", ts("2024-01-09 00:00:00"), 3L)
    ).toDF("user_id", "attr", "t", "id")
    val hist = Scd2.history(log, Seq("user_id"), Seq("attr"), "t", Seq(col("id").asc))
      .select(col("user_id"), col("attr"), col("valid_from").as("t"))
    // lookups at various event times via as-of join on valid_from
    val lookups = Seq(
      (10L, 1L, ts("2024-01-02 00:00:00")),  // inside first A interval
      (11L, 1L, ts("2024-01-05 00:00:00")),  // boundary: B starts here
      (12L, 1L, ts("2024-01-30 00:00:00")),  // current interval (A again)
      (13L, 1L, ts("2023-12-01 00:00:00"))   // before any history
    ).toDF("event_id", "user_id", "t")
    val got = AsOfJoin.asOf(lookups, hist, Seq("user_id"), "t", Seq("attr"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(got(10L).contains("A"))
    assert(got(11L).contains("B"), "interval start is inclusive")
    assert(got(12L).contains("A"))
    assert(got(13L).isEmpty, "before history -> null")
  }

}
