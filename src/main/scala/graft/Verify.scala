package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // restriction args: space- or comma-separated query names
    val (sfDir, outDir, only) =
      (args(0), args(1), args.drop(2).flatMap(_.split(",")).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.sql.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.setup(spark)
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // failures land in a manifest next to the outputs, not only on stderr:
    // a query that throws writes no parquet, and "absent from the scoreboard"
    // proved easy to misread as "not implemented" — the round-6 fixture
    // drift took out 21 queries and the only artifact trace was silence.
    // REWRITTEN AFTER EVERY FAILURE (not once at the end): a mid-suite
    // driver death must still leave the failures seen so far on disk.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    def writeFailures(): Unit = Files.writeString(
      Paths.get(s"$outDir/failures.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    writeFailures() // clean {} from the start: absence of the file ≠ success
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures += name -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
        writeFailures()
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries FAILED — see $outDir/failures.json")
    graft.util.Caches.releaseAll()
    spark.stop()
  }
}
