package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (north-star): image/audio/video payloads are
  * opaque `binary` columns with typed metadata structs. The Spark-side
  * plumbing — schema, batch shape, partition-wise processing — is real; the
  * codec step itself is a clearly-marked deterministic STUB because no
  * media libraries ship in this environment (the production drop-in is a
  * JNI/FFM decoder invoked in the same per-partition loop).
  *
  * Scale design: decode is per-row, shuffle-free (`mapPartitions` — the
  * Scala analogue of `mapInPandas` batch processing); payloads stay off the
  * driver; metadata-only queries never touch the bytes thanks to parquet
  * column pruning.
  */
object Multimodal {

  /** Typed media metadata carried next to every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("byte_len", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Wrap a string column as a binary payload (UTF-8) — the fixtures carry
    * no real media, so documents.text stands in for the encoded bytes. */
  def asPayload(c: Column): Column = encode(c, "UTF-8")

  /** Column-level metadata extraction from the payload (pure expressions —
    * this part is real: byte length + deterministic pseudo-decode of
    * dimensions/frame count from the byte length). */
  def extractMeta(payload: Column): Column = {
    val len = octet_length(payload)
    struct(
      len.as("byte_len"),
      lit("stub/raw").as("format"),
      (lit(320) + pmod(len, lit(1280))).as("width"),
      (lit(240) + pmod(len, lit(720))).as("height"),
      (pmod(len, lit(24)) + lit(1)).as("n_frames"))
  }

  /** Frame-sample indices: every `stride`-th frame of `n_frames`. */
  def frameSampleIndices(nFrames: Column, stride: Int): Column =
    filter(sequence(lit(0), nFrames - 1), i => pmod(i, lit(stride)) === 0)

  /** Fit-within-box resize dimensions (aspect-preserving, never upscaled,
    * floor to pixels, min 1). The geometry is real even though the pixel
    * transform itself is the stubbed codec step — at scale this column
    * rides next to the payload so the decoder needs no second pass. */
  def resizeDims(width: Column, height: Column, maxW: Int, maxH: Int): Column = {
    val scale = least(
      lit(maxW).cast("double") / width.cast("double"),
      lit(maxH).cast("double") / height.cast("double"),
      lit(1.0))
    struct(
      greatest(floor(width * scale).cast("int"), lit(1)).as("new_width"),
      greatest(floor(height * scale).cast("int"), lit(1)).as("new_height"))
  }

  final case class MediaFeature(doc_id: Long, byte_len: Int, checksum: Long,
                                feature_dim: Int)

  /** STUB decoder: a real implementation would decode image/audio bytes and
    * emit a feature vector; here it derives a deterministic checksum so the
    * partition-wise plumbing (batch iteration, typed output schema) is
    * fully exercised and testable. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaFeature = {
    // STUB: replace with actual codec + feature extractor (not available in
    // this container). Deterministic fake keeps tests hash-stable.
    var cs = 0L
    var i = 0
    while (i < bytes.length) { cs = cs * 131L + (bytes(i) & 0xffL); i += 1 }
    MediaFeature(id, bytes.length, cs, 64)
  }

  /** Partition-wise feature extraction over (id, payload) rows — the
    * `mapInPandas`-shaped batch path: one decoder instance per partition,
    * streaming iterator in/out, no driver collect. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeature] = {
    df.select(col(idCol), col(payloadCol)).mapPartitions { rows =>
      // per-partition decoder setup would go here (codec contexts, buffers)
      rows.map { r: Row => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }(Encoders.product[MediaFeature])
  }
}
