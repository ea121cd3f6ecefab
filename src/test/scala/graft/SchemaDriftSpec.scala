package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.sources.Tables

/** Schema-drift canary for the `events` fixture contract.
  *
  * The driver regenerated the fixtures once already (round 6) and switched
  * `events.ts` from epoch-nanos int64 to native parquet `timestamp[us]`,
  * which took 21 queries and 19 tests down at ANALYSIS time. This suite
  * writes the same events frame in every encoding [[Tables.events]]
  * claims to support and proves each one normalizes to the identical
  * downstream contract (`ts` TimestampType + `ts_ns` epoch-nanos long,
  * same instants, same window-query results) — so the NEXT fixture
  * regeneration breaks a focused canary, not a round.
  */
class SchemaDriftSpec extends SparkSpecBase with org.scalatest.BeforeAndAfterAll {

  private val tmpDirs = scala.collection.mutable.ArrayBuffer[String]()

  override def afterAll(): Unit = {
    tmpDirs.foreach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(d))
    }
    super.afterAll()
  }

  // instants chosen on the nanos side of the epoch heuristic (> 1e12)
  private val NsA = 1705708800000000000L // 2024-01-20 00:00:00
  private val NsB = 1705795200000000000L // 2024-01-21 00:00:00
  private val NsC = 1705795200123456000L // 2024-01-21 00:00:00.123456

  private def baseLong = {
    import spark.implicits._
    Seq(
      (1L, NsA, 10L, "purchase", 1.0),
      (2L, NsB, 10L, "view", 2.0),
      (3L, NsC, 11L, "purchase", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  /** Write `df` as `<tmp>/events.parquet` and return the sfDir-shaped tmp
    * (removed in afterAll). */
  private def writeFixture(df: DataFrame): String = {
    val dir = Files.createTempDirectory("drift").toString
    tmpDirs += dir
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def probe(dir: String): Seq[(java.sql.Timestamp, Long, Long)] = {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"normalized ts must be TimestampType, got ${ev.schema("ts").dataType}")
    assert(ev.schema("ts_ns").dataType == LongType,
      s"ts_ns must be LongType, got ${ev.schema("ts_ns").dataType}")
    ev.groupBy(window(col("ts"), "1 day").getField("start").as("day"))
      .agg(count(lit(1)).as("n"), max("ts_ns").as("max_ns"))
      .orderBy("day")
      .collect().toSeq
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
  }

  test("events normalizes identically from epoch-ns long, timestamp_ntz, and timestamp encodings") {
    val asLong = writeFixture(baseLong)
    val asNtz = writeFixture(baseLong.withColumn("ts",
      timestamp_micros(floor(col("ts").cast("decimal(38,0)") / lit(1000)).cast("long"))
        .cast(TimestampNTZType)))
    val asLtz = writeFixture(baseLong.withColumn("ts",
      timestamp_micros(floor(col("ts").cast("decimal(38,0)") / lit(1000)).cast("long"))))

    val (longRes, ntzRes, ltzRes) = (probe(asLong), probe(asNtz), probe(asLtz))
    assert(longRes == ntzRes,
      s"epoch-ns long vs timestamp_ntz window results differ:\n$longRes\n$ntzRes")
    assert(longRes == ltzRes,
      s"epoch-ns long vs timestamp window results differ:\n$longRes\n$ltzRes")
    // ts_ns round-trips the source nanos exactly (micros-truncated for the
    // native encodings, which carry micros to begin with)
    val wantMaxNs = Set(NsA, NsC).map(n => n / 1000 * 1000)
    assert(longRes.map(_._3).toSet == wantMaxNs, s"got ${longRes.map(_._3)}")
  }

  test("an unsupported events.ts encoding fails loudly at load, not deep in a query") {
    val asString = writeFixture(baseLong.withColumn("ts", col("ts").cast("string")))
    val e = intercept[IllegalArgumentException](Tables.events(spark, asString))
    assert(e.getMessage.contains("unsupported encoding"))
  }

  test("JSONL source: FAILFAST throws on a corrupt line, PERMISSIVE quarantines it") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    import graft.sources.JsonLines
    val dir = Files.createTempDirectory("graft_jsonl").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "good line"}""",
        """{"doc_id": oops not json""",
        """{"doc_id": 3, "text": "another good line"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // default: the corrupt line is a loud failure, not a silent null row
    intercept[org.apache.spark.SparkException] {
      JsonLines.read(spark, dir, schema).collect()
    }
    // opt-in quarantine: the corrupt line lands in _corrupt_record intact
    val rows = JsonLines.read(spark, dir,
        schema.add(StructField("_corrupt_record", StringType)),
        mode = "PERMISSIVE").cache()
    assert(rows.filter(col("_corrupt_record").isNotNull).count() == 1)
    val good = rows.filter(col("_corrupt_record").isNull)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(good.toSet == Set((1L, "good line"), (3L, "another good line")))
    rows.unpersist()
  }
}
