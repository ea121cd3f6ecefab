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
}
