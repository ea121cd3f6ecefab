package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomSketch

/** Bloom-sketch exact-duplicate screening of an ingest batch against a
  * settled corpus — the shuffle-free front door for incremental ingest at
  * corpus scale.
  *
  * [[TextDedup.incrementalExactIds]] answers the same question with a hash
  * semi join: correct, but the join shuffles the batch fingerprints and
  * scans + shuffles the corpus fingerprint projection on EVERY batch. This
  * variant splits the work the way a 100 TB deployment wants it split:
  *
  *  1. '''Index once''': the corpus folds into a fixed-size bloom sketch
  *     (bytes determined by `(expectedItems, fpp)` alone — a billion keys
  *     at 1% fpp is ~1.2 GB regardless of corpus width). The aggregation
  *     is partial: each partition builds a local filter and only the
  *     already-tiny sketches merge. The blob is reusable across batches
  *     and mergeable across corpus shards.
  *  2. '''Screen map-side''': the sketch ships as a literal, so the batch
  *     probe is a per-row bit test inside the scan — zero shuffle, zero
  *     corpus I/O. Negatives are EXACT (bloom has no false negatives);
  *     only the ~`fpp` sliver of maybes needs confirmation.
  *  3. '''Confirm on the sliver''': candidate fingerprints broadcast to a
  *     corpus semi join (map-side again — the corpus is scanned but never
  *     shuffled), and the confirmed set broadcasts back onto the batch.
  *
  * No stage shuffles a large relation; the only driver-held value is the
  * sketch blob, whose size is a config constant, not a data quantity.
  *
  * Mirrors the incremental screens of `Silver_incremental_load.ipynb`
  * (cell 8) re-expressed for corpus-scale ingest; the sketch pair is
  * Spark's own runtime-filter machinery ([[graft.functions.BloomSketch]]).
  */
object BloomScreen {

  /** Normalized content fingerprint — same canonicalization as
    * [[TextDedup.exactDedup]] so the two screens agree verbatim. */
  private def fp(text: Column): Column = TextStats.fingerprintMd5(text)

  /** Fold the corpus into a serialized bloom filter over its normalized
    * content fingerprints. One action; the returned blob is the reusable
    * ingest index (persist it beside the corpus, merge shard sketches with
    * `BloomFilter.mergeInPlace` as partitions settle). Returns None for an
    * empty corpus. */
  def corpusSketch(corpus: DataFrame, textCol: String,
                   expectedItems: Long = 1 << 20,
                   fpp: Double = 0.01): Option[Array[Byte]] =
    fpSketch(fingerprints(corpus, textCol), expectedItems, fpp)

  /** Screen `batch` against a prebuilt corpus sketch: one row per batch
    * doc, `(idCol, is_corpus_dup)`, where `is_corpus_dup` is the EXACT
    * verdict (bloom prefilter + semi-join confirmation of the maybes
    * against `corpus`). Passing the corpus alongside its own sketch is the
    * steady-state call shape — the sketch decides which rows ever touch
    * the corpus scan. */
  def screenExact(corpus: DataFrame, sketch: Option[Array[Byte]],
                  batch: DataFrame, idCol: String, textCol: String): DataFrame =
    screenExactFps(corpus.select(fp(col(textCol)).as("__fp")),
      sketch, batch, idCol, textCol)

  /** General form of [[screenExact]]: the known side is an explicit
    * single-column fingerprint frame — the corpus projection in the batch
    * call, or corpus ∪ previously-accepted fingerprints in the streaming
    * ingest loop, where re-fingerprinting settled text every micro-batch
    * would defeat the index. */
  def screenExactFps(knownFps: DataFrame, sketch: Option[Array[Byte]],
                     batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val b = batch.select(col(idCol), fp(col(textCol)).as("__fp"))
    sketch match {
      case None =>
        // empty corpus: every verdict is an exact negative
        b.select(col(idCol), lit(false).as("is_corpus_dup"))
      case Some(blob) =>
        val candidates = b
          .filter(BloomSketch.mightContain(blob, xxhash64(col("__fp"))))
          .select("__fp").distinct()
        val confirmed = knownFps.toDF("__fp")
          .join(broadcast(candidates), Seq("__fp"), "left_semi")
          .distinct()
        b.join(broadcast(confirmed.withColumn("__hit", lit(true))),
            Seq("__fp"), "left")
          .select(col(idCol),
            coalesce(col("__hit"), lit(false)).as("is_corpus_dup"))
    }
  }

  /** Sketch a frame of raw fingerprints (streaming-loop twin of
    * [[corpusSketch]]). None for an empty frame. */
  def fpSketch(fps: DataFrame, expectedItems: Long = 1 << 20,
               fpp: Double = 0.01): Option[Array[Byte]] = {
    val row = fps.toDF("__fp")
      .select(BloomSketch.bloomAgg(xxhash64(col("__fp")), expectedItems, fpp)
        .as("sketch"))
      .head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Normalized fingerprint projection of a document frame — the column a
    * caller persists as the accepted-set side of the streaming loop. */
  def fingerprints(docs: DataFrame, textCol: String): DataFrame =
    docs.select(fp(col(textCol)).as("fp"))

  /** Union two sketch blobs (same `(expectedItems, fpp)` sizing — bloom
    * merge requires identical bit/hash geometry; incompatible inputs
    * throw). This is how the index FOLLOWS the corpus without rescans:
    * sketch each settled shard once, merge the blobs; after a batch is
    * accepted, merge the batch's own sketch in and the index is current.
    * Blob format is `BloomFilterAggregate`'s serialization, which is
    * `BloomFilter.writeTo` — the same bytes `might_contain` probes. */
  def mergeSketches(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = org.apache.spark.util.sketch.BloomFilter.readFrom(a)
    fa.mergeInPlace(org.apache.spark.util.sketch.BloomFilter.readFrom(b))
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }

  /** Build-and-screen in one call: sketch the corpus, then
    * [[screenExact]] the batch against it. */
  def screen(corpus: DataFrame, batch: DataFrame, idCol: String,
             textCol: String, expectedItems: Long = 1 << 20,
             fpp: Double = 0.01): DataFrame =
    screenExact(corpus, corpusSketch(corpus, textCol, expectedItems, fpp),
      batch, idCol, textCol)
}
