package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source/sink — the interchange format
  * training-data pipelines actually exchange (one document per line;
  * WebDataset/HF-datasets style). Thin, deliberately opinionated
  * wrappers over Spark's native JSON data source:
  *
  *  - the read REQUIRES a schema. Inference scans the data once just to
  *    guess types and then guesses wrong on all-null / mixed columns —
  *    at 100 TB that is a full extra pass for a worse contract. A
  *    pipeline declares its schema and the Jackson parse stays inside
  *    whole-stage codegen with column pruning (unreferenced JSON fields
  *    are never materialized).
  *  - corrupt lines FAIL FAST by default instead of PERMISSIVE's silent
  *    null rows (the same fail-loudly stance as [[Tables.events]] on
  *    unknown encodings); pass `mode = "PERMISSIVE"` plus a
  *    `_corrupt_record` column in the schema to quarantine instead —
  *    that composes with [[graft.operators.Quarantine]].
  *  - uncompressed JSONL splits by line boundaries, so parallelism is
  *    file-size-driven exactly like parquet scans; gzip members do NOT
  *    split — shard any gzip export into many files (the writer below
  *    inherits the frame's partitioning: one output file per partition).
  */
object JsonLines {

  def read(spark: SparkSession, path: String, schema: StructType,
           mode: String = "FAILFAST"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)

  /** One JSONL file per partition of `df`; overwrite semantics match the
    * parquet sinks (S9's volume policy owns append-vs-overwrite). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)
}
