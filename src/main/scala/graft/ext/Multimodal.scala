package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (north-star): image/audio/video payloads are
  * opaque `binary` columns with typed metadata structs. The decode path is
  * REAL for the formats the JDK ships codecs for — PNG/JPEG/GIF/BMP via
  * `javax.imageio` (magic-byte sniff, then header-only dimension read, or
  * a full pixel decode for feature extraction) — and falls back to a
  * clearly-marked deterministic STUB for payloads the container cannot
  * decode (audio/video; the production drop-in is a JNI/FFM codec invoked
  * in the same per-partition loop).
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

  /** Container format from magic bytes — the cheap first gate: only
    * payloads that ARE images reach a codec. PNG/JPEG magic starts with a
    * non-ASCII byte, so text can never collide; the GIF and BMP magics are
    * plain ASCII ("GIF8…", "BM…"), so they get structural corroboration —
    * or a text document starting with those letters would be misclassified
    * and fed to a codec. Corroboration is deliberately LOOSE (the ImageIO
    * reader lookup is the final arbiter): GIF wants the 0x3B trailer
    * somewhere in the tail (real encoders may pad after it), and BMP is
    * checked on the DIB-header-size field — the declared-file-size field
    * many encoders write as 0 is NOT consulted. */
  def sniffFormat(bytes: Array[Byte]): Option[String] = {
    def u32le(off: Int): Long =
      (bytes(off) & 0xffL) | (bytes(off + 1) & 0xffL) << 8 |
        (bytes(off + 2) & 0xffL) << 16 | (bytes(off + 3) & 0xffL) << 24
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') Some("png")
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8) Some("jpeg")
    else if (bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a' &&
        bytes.view.slice(math.max(bytes.length - 32, 6), bytes.length)
          .exists(b => (b & 0xff) == 0x3b)) Some("gif")
    else if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M' &&
        // known BITMAPINFOHEADER family sizes (core/v2/v3/info/v4/v5)
        Set(12L, 16L, 40L, 52L, 56L, 64L, 108L, 124L).contains(u32le(14)))
      Some("bmp")
    else None
  }

  /** REAL header decode via `javax.imageio`: (format, width, height,
    * n_frames) without decoding pixels — dimensions come from the header
    * (IHDR / SOF / logical screen descriptor). GIF frame counts are true
    * multi-frame counts; counting them walks the stream's frame blocks
    * (still no pixel decode). None for non-image payloads. */
  def decodeHeader(bytes: Array[Byte]): Option[(String, Int, Int, Int)] =
    sniffFormat(bytes).flatMap { fmt =>
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val frames = try math.max(r.getNumImages(true), 1)
                         catch { case _: Exception => 1 }
            Some((fmt, r.getWidth(0), r.getHeight(0), frames))
          } catch { case _: Exception => None }
          finally r.dispose()
        }
      } finally in.close()
    }

  final case class MediaMeta(doc_id: Long, byte_len: Int, format: String,
                             width: Int, height: Int, n_frames: Int)
  final case class MediaFeature(doc_id: Long, byte_len: Int, format: String,
                                width: Int, height: Int, checksum: Long,
                                mean_luma: Double, feature_dim: Int)

  /** Stub geometry for undecodable payloads — the SAME deterministic
    * pseudo-decode as the expression path [[extractMeta]], so the decoded
    * and expression metadata paths agree wherever no codec applies. */
  private def stubGeometry(len: Int): (Int, Int, Int) =
    (320 + len % 1280, 240 + len % 720, len % 24 + 1)

  private def decodeMetaRow(id: Long, bytes: Array[Byte]): MediaMeta =
    decodeHeader(bytes) match {
      case Some((fmt, w, h, f)) => MediaMeta(id, bytes.length, fmt, w, h, f)
      case None =>
        val (w, h, f) = stubGeometry(bytes.length)
        MediaMeta(id, bytes.length, "stub/raw", w, h, f)
    }

  /** Mean Rec.601 luminance over a bulk-grabbed pixel row — bulk getRGB
    * avoids the per-call color-model conversion of the pixel-at-a-time
    * form. Shared by the image-feature and video-frame decode paths. */
  private def meanLuma(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    val row = new Array[Int](w)
    var s = 0.0
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    s / (w.toLong * h)
  }

  private def decodeFeatureRow(id: Long, bytes: Array[Byte]): MediaFeature = {
    var cs = 0L
    var i = 0
    while (i < bytes.length) { cs = cs * 131L + (bytes(i) & 0xffL); i += 1 }
    // REAL pixel decode: ONE full ImageIO.read (no separate header pass on
    // this path), then the shared mean-luminance pass. A payload whose
    // header sniffs as an image but whose body fails to decode (truncated
    // file) falls back to the stub instead of failing the task: dirty rows
    // must not sink a 100 TB job.
    val decoded = sniffFormat(bytes).flatMap { fmt =>
      try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          .map { img =>
            MediaFeature(id, bytes.length, fmt, img.getWidth, img.getHeight,
              cs, meanLuma(img), 64)
          }
      } catch { case _: Exception => None }
    }
    decoded.getOrElse {
      // a truncated image whose HEADER is intact keeps its real geometry
      // (consistent with the decodeMetaRow path) and stubs only the
      // luminance; genuinely undecodable payloads take full stub geometry
      decodeHeader(bytes) match {
        case Some((fmt, w, h, _)) => MediaFeature(id, bytes.length, fmt, w, h, cs, -1.0, 64)
        case None =>
          val (w, h, _) = stubGeometry(bytes.length)
          MediaFeature(id, bytes.length, "stub/raw", w, h, cs, -1.0, 64)
      }
    }
  }

  /** Partition-wise REAL metadata decode over (id, payload) rows: true
    * dimensions/frame counts for JDK-decodable images, stub geometry
    * otherwise. Use [[extractMeta]] when payloads are known undecodable
    * and the metadata should stay a pure (prunable) expression. */
  def extractMetaDecoded(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] =
    df.select(col(idCol), col(payloadCol)).mapPartitions { rows =>
      rows.map { r: Row => decodeMetaRow(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }(Encoders.product[MediaMeta])

  /** Partition-wise feature extraction over (id, payload) rows — the
    * `mapInPandas`-shaped batch path: one decoder instance per partition,
    * streaming iterator in/out, no driver collect. Real pixel features
    * (mean luminance + true geometry) for images; deterministic checksum
    * stub for payloads without a JDK codec. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeature] = {
    df.select(col(idCol), col(payloadCol)).mapPartitions { rows =>
      // per-partition decoder setup would go here (codec contexts, buffers)
      rows.map { r: Row => decodeFeatureRow(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }(Encoders.product[MediaFeature])
  }

  // ------------------------------------------------------------- audio

  /** Audio container from magic bytes: RIFF/WAVE and FORM/AIFF — the two
    * containers the JDK ships parsers for (`javax.sound.sampled`). Video
    * CONTAINER metadata is parsed natively from ISO-BMFF boxes
    * ([[decodeVideoHeader]]); frame decode is real for MJPEG
    * ([[decodeVideoFrames]]) and remains a stub for every other codec
    * (the JDK ships none). */
  def sniffAudioFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
        bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') Some("wav")
    else if (bytes.length >= 12 && bytes(0) == 'F' && bytes(1) == 'O' &&
        bytes(2) == 'R' && bytes(3) == 'M' && bytes(8) == 'A' &&
        bytes(9) == 'I' && bytes(10) == 'F' && bytes(11) == 'F') Some("aiff")
    else None

  /** REAL audio header decode via `javax.sound.sampled.AudioSystem`:
    * (container, sample_rate, channels, bits, n_frames, duration_ms) from
    * the WAV/AIFF header — no sample data is decoded. `duration_ms` is the
    * exact integer `frames * 1000 / rate`; -1 when the header leaves the
    * frame count unspecified. None for non-audio / truncated payloads
    * (dirty rows must not sink a 100 TB job). */
  def decodeAudioHeader(bytes: Array[Byte]): Option[(String, Int, Int, Int, Long, Long)] =
    sniffAudioFormat(bytes).flatMap { fmt =>
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val af = aff.getFormat
        val frames = aff.getFrameLength.toLong
        val rate = af.getSampleRate.toLong
        val durMs = if (frames >= 0 && rate > 0) frames * 1000L / rate else -1L
        Some((fmt, af.getSampleRate.toInt, af.getChannels,
          af.getSampleSizeInBits, frames, durMs))
      } catch { case _: Exception => None }
    }

  final case class AudioMeta(doc_id: Long, byte_len: Int, container: String,
                             sample_rate: Int, channels: Int, bits: Int,
                             n_frames: Long, duration_ms: Long)

  private def decodeAudioRow(id: Long, bytes: Array[Byte]): AudioMeta =
    decodeAudioHeader(bytes) match {
      case Some((fmt, rate, ch, bits, frames, durMs)) =>
        AudioMeta(id, bytes.length, fmt, rate, ch, bits, frames, durMs)
      case None =>
        // STUB: non-audio / truncated payloads — explicit sentinel values,
        // never fabricated audio parameters
        AudioMeta(id, bytes.length, "stub/raw", -1, -1, -1, -1L, -1L)
    }

  /** Partition-wise REAL audio metadata decode over (id, payload) rows —
    * same shuffle-free shape as [[extractMetaDecoded]]. */
  def extractAudioMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[AudioMeta] =
    df.select(col(idCol), col(payloadCol)).mapPartitions { rows =>
      rows.map { r: Row => decodeAudioRow(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }(Encoders.product[AudioMeta])

  /** REAL audio FEATURE extraction: decode the PCM sample stream through
    * `javax.sound.sampled.AudioInputStream` (the actual JDK decoder, not
    * header math) and fold peak amplitude + sum of absolute amplitudes —
    * the audio twin of the image mean-luminance path. Handles both WAV
    * (little-endian) and AIFF (big-endian) 16-bit PCM; the abs-sum stays
    * in exact Long so the derived mean is ONE IEEE division on every
    * engine. None for non-audio / non-16-bit / truncated payloads. */
  def decodeAudioFeatures(bytes: Array[Byte]): Option[(Long, Int, Long)] =
    sniffAudioFormat(bytes).flatMap { _ =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val af = ais.getFormat
        if (af.getSampleSizeInBits != 16) None
        else {
          val big = af.isBigEndian
          val data = ais.readAllBytes()
          var i = 0; var n = 0L; var peak = 0; var sumAbs = 0L
          while (i + 1 < data.length) {
            val s =
              if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            val a = math.abs(s.toInt)
            if (a > peak) peak = a
            sumAbs += a; n += 1; i += 2
          }
          Some((n, peak, sumAbs))
        }
      } catch { case _: Exception => None }
    }

  final case class AudioFeature(doc_id: Long, n_samples: Long, peak: Int,
                                mean_abs: Double)

  /** Partition-wise REAL PCM feature decode over (id, payload) rows. Rows
    * whose payload cannot be decoded are dropped (the metadata path
    * [[extractAudioMeta]] is the one that surfaces stubs). */
  def extractAudioFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[AudioFeature] =
    df.select(col(idCol), col(payloadCol)).mapPartitions { rows =>
      rows.flatMap { r: Row =>
        decodeAudioFeatures(r.getAs[Array[Byte]](1)).map { case (n, peak, sumAbs) =>
          AudioFeature(r.getLong(0), n, peak,
            if (n > 0) sumAbs.toDouble / n else 0.0)
        }
      }
    }(Encoders.product[AudioFeature])

  /** 16-bit PCM WAV from explicit samples (canonical 44-byte RIFF header)
    * — the generator for the audio FEATURE gate, whose oracle recomputes
    * peak/mean arithmetically from the same deterministic waveform. */
  def wavBytesPcm(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2.toShort).putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Deterministic 16-bit PCM WAV synthesizer (canonical 44-byte RIFF
    * header + silence frames) — the fixture generator for the audio gate:
    * the fixtures carry no real media, so payloads are synthesized from
    * row attributes and then round-tripped through the REAL
    * `javax.sound.sampled` parser, which the oracle checks by recomputing
    * the parameters arithmetically. */
  def wavBytes(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    val bits = 16
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    buf.array()
  }

  // ------------------------------------------------------------- video

  /** Video container sniff: an ISO-BMFF file (MP4/MOV/3GP) starts with a
    * box whose type is `ftyp`; returns the major brand (e.g. "isom",
    * "mp42", "qt  ") trimmed. Pure magic-byte check — no codec. */
  def sniffVideoFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
        bytes(6) == 'y' && bytes(7) == 'p')
      Some(new String(bytes, 8, 4, "US-ASCII").trim)
    else None

  private def u32be(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) << 24 | (b(off + 1) & 0xffL) << 16 |
      (b(off + 2) & 0xffL) << 8 | (b(off + 3) & 0xffL)

  private def u64be(b: Array[Byte], off: Int): Long =
    u32be(b, off) << 32 | u32be(b, off + 4)

  /** Top-level walk of ISO-BMFF boxes in `[from, to)`: (type, payloadStart,
    * payloadEnd). Handles 64-bit `largesize` (size==1) and to-end boxes
    * (size==0); stops on malformed sizes rather than throwing — a dirty
    * payload must not sink the partition. */
  private def boxScan(b: Array[Byte], from: Int, to: Int): List[(String, Int, Int)] = {
    var off = from
    val out = List.newBuilder[(String, Int, Int)]
    while (off + 8 <= to) {
      val size0 = u32be(b, off)
      val tpe = new String(b, off + 4, 4, "US-ASCII")
      val (payload, end) =
        if (size0 == 0L) (off + 8, to) // box extends to end of enclosing space
        else if (size0 == 1L && off + 16 <= to) (off + 16, off + u64be(b, off + 8).toInt)
        else (off + 8, off + size0.toInt)
      if (end < payload || end > to) return out.result() // malformed: stop
      out += ((tpe, payload, end))
      off = end
    }
    out.result()
  }

  /** REAL video container metadata from ISO-BMFF structure: (brand,
    * timescale, duration_ms, width, height, n_tracks) read from the
    * `moov/mvhd` and `moov/trak/tkhd` boxes — plain binary box walking,
    * no codec, no pixel decode. Dimensions are the max over the tracks'
    * 16.16 fixed-point tkhd geometry (audio tracks carry 0×0).
    * None for non-ISO-BMFF or truncated-before-moov payloads. */
  def decodeVideoHeader(bytes: Array[Byte]): Option[(String, Long, Long, Int, Int, Int)] =
    sniffVideoFormat(bytes).flatMap { brand =>
      boxScan(bytes, 0, bytes.length).find(_._1 == "moov").flatMap {
        case (_, moovStart, moovEnd) =>
          val inMoov = boxScan(bytes, moovStart, moovEnd)
          val mvhd = inMoov.find(_._1 == "mvhd").flatMap { case (_, p, e) =>
            if (e - p < 20) None
            else if (bytes(p) == 0 && e - p >= 20)
              Some((u32be(bytes, p + 12), u32be(bytes, p + 16)))        // v0
            else if (bytes(p) == 1 && e - p >= 32)
              Some((u32be(bytes, p + 20), u64be(bytes, p + 24)))        // v1
            else None
          }
          mvhd.map { case (timescale, duration) =>
            val traks = inMoov.filter(_._1 == "trak")
            val dims = traks.flatMap { case (_, p, e) =>
              boxScan(bytes, p, e).find(_._1 == "tkhd").flatMap { case (_, tp, te) =>
                val geomOff = if (bytes(tp) == 1) 88 else 76 // v1 widens times
                if (te - tp >= geomOff + 8)
                  Some(((u32be(bytes, tp + geomOff) >> 16).toInt,
                    (u32be(bytes, tp + geomOff + 4) >> 16).toInt))
                else None
              }
            }
            val (w, h) = if (dims.isEmpty) (0, 0)
              else (dims.map(_._1).max, dims.map(_._2).max)
            val durMs = if (timescale > 0) duration * 1000L / timescale else -1L
            (brand, timescale, durMs, w, h, traks.size)
          }
      }
    }

  final case class VideoMeta(doc_id: Long, byte_len: Int, container: String,
                             timescale: Long, duration_ms: Long,
                             width: Int, height: Int, n_tracks: Int)

  private def decodeVideoRow(id: Long, bytes: Array[Byte]): VideoMeta =
    decodeVideoHeader(bytes) match {
      case Some((brand, ts, durMs, w, h, n)) =>
        VideoMeta(id, bytes.length, brand, ts, durMs, w, h, n)
      case None =>
        // STUB: non-video / truncated payloads — explicit sentinels
        VideoMeta(id, bytes.length, "stub/raw", -1L, -1L, -1, -1, -1)
    }

  /** Partition-wise REAL video container-metadata decode over
    * (id, payload) rows — same shuffle-free shape as [[extractAudioMeta]]. */
  def extractVideoMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[VideoMeta] =
    df.select(col(idCol), col(payloadCol)).mapPartitions { rows =>
      rows.map { r: Row => decodeVideoRow(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }(Encoders.product[VideoMeta])

  /** Deterministic minimal-MP4 synthesizer: `ftyp` (isom) + `moov`
    * holding a v0 `mvhd` (timescale, duration) and `nTracks` traks whose
    * v0 `tkhd` carries 16.16 fixed-point geometry — track 1 gets the
    * video dimensions, further tracks are 0×0 (audio-style). Total size
    * is exactly `140 + nTracks * 100` bytes, which the oracle recomputes
    * arithmetically. */
  def mp4Bytes(timescale: Int, durationUnits: Int, width: Int, height: Int,
               nTracks: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(140 + nTracks * 100) // big-endian
    // ftyp: major isom, minor 0x200, compatible isom + mp42
    buf.putInt(24).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0x200)
      .put("isom".getBytes("US-ASCII")).put("mp42".getBytes("US-ASCII"))
    // moov
    buf.putInt(8 + 108 + nTracks * 100).put("moov".getBytes("US-ASCII"))
    // mvhd v0
    buf.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0) // ver/flags, ctime, mtime
      .putInt(timescale).putInt(durationUnits)
      .putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      .put(new Array[Byte](10)) // reserved
    identityMatrix(buf)
    buf.put(new Array[Byte](24)).putInt(nTracks + 1) // predefined, next track
    (1 to nTracks).foreach { i =>
      val (w, hh) = if (i == 1) (width, height) else (0, 0)
      buf.putInt(100).put("trak".getBytes("US-ASCII"))
      buf.putInt(92).put("tkhd".getBytes("US-ASCII"))
        .putInt(0).putInt(0).putInt(0) // ver/flags, ctime, mtime
        .putInt(i).putInt(0).putInt(durationUnits) // track id, reserved, duration
        .put(new Array[Byte](8)) // reserved
        .putShort(0).putShort(0) // layer, alternate group
        .putShort(if (i == 1) 0 else 0x0100.toShort) // volume: video 0, audio 1.0
        .putShort(0) // reserved
      identityMatrix(buf)
      buf.putInt(w << 16).putInt(hh << 16) // 16.16 fixed
    }
    buf.array()
  }

  private def identityMatrix(buf: java.nio.ByteBuffer): Unit = {
    buf.putInt(0x00010000).putInt(0).putInt(0)
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    ()
  }

  // ---------------------------------------------------- video frame decode

  /** REAL frame decode for ONE codec: Motion-JPEG inside an ISO-BMFF
    * `mdat` box. MJPEG stores each frame as a complete baseline JPEG, so
    * frames are recovered by scanning the mdat payload for SOI (FFD8) /
    * EOI (FFD9) marker pairs — inside the entropy-coded segment a raw FF
    * is always byte-stuffed as FF00 (or a restart marker FFD0–D7), so EOI
    * cannot occur mid-frame — and handing each one to the JDK's JPEG
    * codec. Returns (frame_idx, width, height, mean_luma) per decoded
    * frame, at most `maxFrames` (runaway-payload guard; a production
    * sampler passes its stride budget here).
    *
    * Every OTHER codec (H.264/H.265/VP9/AV1…) remains the documented
    * stub: no JDK codec exists, so non-MJPEG payloads return Nil rather
    * than fabricated frames — the production drop-in is a JNI/FFM decoder
    * behind this same signature. Undecodable marker pairs are skipped,
    * not thrown: dirty rows must not sink a 100 TB job. */
  def decodeVideoFrames(bytes: Array[Byte], maxFrames: Int = 64): Seq[(Int, Int, Int, Double)] =
    sniffVideoFormat(bytes) match {
      case None => Nil
      case Some(_) =>
        boxScan(bytes, 0, bytes.length).find(_._1 == "mdat") match {
          case None => Nil
          case Some((_, from, to)) =>
            val out = Seq.newBuilder[(Int, Int, Int, Double)]
            var idx = 0
            var i = from
            while (i + 1 < to && idx < maxFrames) {
              if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd8) {
                var j = i + 2
                var end = -1
                while (end < 0 && j + 1 < to) {
                  if ((bytes(j) & 0xff) == 0xff && (bytes(j + 1) & 0xff) == 0xd9)
                    end = j + 2
                  j += 1
                }
                if (end < 0) i = to // truncated final frame: stop
                else {
                  try {
                    val img = javax.imageio.ImageIO.read(
                      new java.io.ByteArrayInputStream(bytes, i, end - i))
                    if (img != null) {
                      out += ((idx, img.getWidth, img.getHeight, meanLuma(img)))
                      idx += 1
                    }
                  } catch { case _: Exception => () }
                  i = end
                }
              } else i += 1
            }
            out.result()
        }
    }

  final case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
                              height: Int, mean_luma: Double)

  /** Partition-wise REAL MJPEG frame decode over (id, payload) rows — one
    * output row per decoded frame, same shuffle-free mapPartitions shape
    * as every other decode path (frames never ride through a shuffle;
    * downstream feature joins key on (doc_id, frame_idx)). */
  def extractVideoFrames(df: DataFrame, idCol: String, payloadCol: String,
                         maxFrames: Int = 64): Dataset[VideoFrame] =
    df.select(col(idCol), col(payloadCol)).mapPartitions { rows =>
      rows.flatMap { r: Row =>
        decodeVideoFrames(r.getAs[Array[Byte]](1), maxFrames).map {
          case (idx, w, h, luma) => VideoFrame(r.getLong(0), idx, w, h, luma)
        }
      }
    }(Encoders.product[VideoFrame])

  /** Deterministic MJPEG-in-MP4 synthesizer: the [[mp4Bytes]] header
    * (ftyp + moov) followed by an `mdat` box holding one REAL baseline
    * JPEG per entry of `grays` — each frame a uniform gray-level image
    * encoded by the JDK's own JPEG codec, so the decode gate exercises a
    * true encode→container→extract→decode round trip. Frame geometry is
    * exact after the round trip (JPEG is lossy in VALUES, not size);
    * uniform-gray luminance survives within quantization error, which the
    * spec bounds. */
  def mjpegMp4Bytes(timescale: Int, durationUnits: Int, width: Int,
                    height: Int, grays: Seq[Int]): Array[Byte] = {
    val header = mp4Bytes(timescale, durationUnits, width, height, nTracks = 1)
    val jpegs = grays.map { g =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = img.createGraphics()
      gfx.setColor(new java.awt.Color(g, g, g))
      gfx.fillRect(0, 0, width, height)
      gfx.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val mdatLen = 8 + jpegs.map(_.length).sum
    val buf = java.nio.ByteBuffer.allocate(header.length + mdatLen)
    buf.put(header).putInt(mdatLen).put("mdat".getBytes("US-ASCII"))
    jpegs.foreach(buf.put)
    buf.array()
  }

  // ------------------------------------------- perceptual hash (dHash)

  /** dHash grid: 9 columns × 8 rows of luminance, 64 horizontal-gradient
    * bits. */
  val DHashCols = 9
  val DHashRows = 8

  final case class MediaHash(doc_id: Long, byte_len: Int, phash: Long,
                             decoded: Boolean)

  /** 64-bit difference hash of a decoded image — the standard perceptual
    * fingerprint for image dedup: downscale luminance to a
    * [[DHashCols]]×[[DHashRows]] grid, set bit `row*8 + col` iff the cell
    * right of `col` is strictly brighter. Near-duplicate images (re-saves,
    * light edits, small crops) land within a few bits; unrelated images
    * differ in ~32.
    *
    * All arithmetic is EXACT-INTEGER so the hash is engine-replayable:
    * per-pixel luminance is Rec.601 scaled by 1000 (`299r + 587g + 114b`),
    * and each grid cell is the floor-mean of its pixel block (block
    * boundaries `floor(g*W/9)`..`floor((g+1)*W/9)`, always non-empty for
    * images at least 9×8; a 9×8 input uses its pixels directly, which is
    * what the arithmetic-oracle gate synthesizes). */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, px, 0, w)
    def cell(gx: Int, gy: Int): Long = {
      val x0 = gx * w / DHashCols
      val x1 = math.max((gx + 1) * w / DHashCols, x0 + 1)
      val y0 = gy * h / DHashRows
      val y1 = math.max((gy + 1) * h / DHashRows, y0 + 1)
      var s = 0L
      var y = y0
      while (y < h && y < y1) {
        var x = x0
        while (x < w && x < x1) {
          val rgb = px(y * w + x)
          s += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      s / ((math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0))
    }
    var hash = 0L
    var i = 0
    while (i < DHashRows) {
      var j = 0
      while (j < DHashCols - 1) {
        if (cell(j + 1, i) > cell(j, i)) hash |= 1L << (i * 8 + j)
        j += 1
      }
      i += 1
    }
    hash
  }

  /** Partition-wise perceptual hashing over (id, payload) rows — the same
    * shuffle-free decode shape as [[extractFeatures]]. Payloads without a
    * decodable image (or smaller than the 9×8 grid) report
    * `decoded = false` with `phash = 0`; dedup consumers filter on the
    * flag instead of trusting a stub hash. */
  def extractImageHash(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaHash] =
    df.select(col(idCol), col(payloadCol)).mapPartitions { rows =>
      rows.map { r: Row =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          try Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes)))
          catch { case _: Exception => None }
        img.filter(i => i.getWidth >= DHashCols && i.getHeight >= DHashRows) match {
          case Some(i) => MediaHash(id, bytes.length, dHash64(i), decoded = true)
          case None    => MediaHash(id, bytes.length, 0L, decoded = false)
        }
      }
    }(Encoders.product[MediaHash])

  /** Near-duplicate image pairs by dHash hamming distance — the
    * multimodal face of the text near-dup family. Pigeonhole banding: a
    * pair within `maxHamming` bits differs in at most `maxHamming` of the
    * hash's bit-bands, so splitting 64 bits into `maxHamming + 1` (or
    * more) equal bands guarantees at least one band matches EXACTLY —
    * candidates come from an equality join on `(band, band_value)`, then
    * one codegen'd `bit_count(xor)` confirms. Same LSH-band shape as
    * [[TextDedup.minhashDupPairs]], but the banding here is LOSSLESS
    * (pigeonhole, not probabilistic) — spec-proven equal to the
    * brute-force pair set.
    *
    * Scale shape: hashes are canonicalized to their DISTINCT values
    * before banding, so the band self-join runs on U unique hashes (a
    * dup-heavy corpus collapses U ≪ n) and identical-hash groups pair up
    * through a membership join whose volume IS the emitted pair set —
    * output-bound, like every dedup pair census. */
  def imageNearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
                        maxHamming: Int): DataFrame =
    hammingNearDupPairs(hashes, idCol, hashCol, maxHamming)

  /** Generic 64-bit-fingerprint near-dup pair join (see
    * [[imageNearDupPairs]] for the algorithm and scale notes) — shared by
    * the image dHash and audio energy-hash dedup paths; works over any
    * long hash column whose hamming distance means similarity. */
  def hammingNearDupPairs(hashes: DataFrame, idCol: String, hashCol: String,
                          maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming in [0, 64)")
    val nBands = Seq(2, 4, 8, 16, 32, 64).find(_ >= maxHamming + 1).getOrElse(64)
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val ids = hashes.select(col(idCol).cast("long").as("id"), col(hashCol).as("h"))
    // canonicalize FIRST: band over the DISTINCT hashes, then expand
    // group memberships. A dup-heavy corpus (the whole point of running
    // dedup) collapses to few distinct hashes, so the quadratic-looking
    // band self-join runs on U distinct values, not n images, and the
    // member expansion joins only produce the output pairs themselves.
    val uniq = ids.select("h").distinct()
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("h"), b * width).bitwiseAND(lit(mask)).as("bv"))
    }
    val bands = uniq
      .select(col("h"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("h"), col("bs.band").as("band"), col("bs.bv").as("bv"))
    val hashPairs = bands.as("l").join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.bv") === col("r.bv") &&
          col("l.h") < col("r.h"))
      .select(col("l.h").as("ha"), col("r.h").as("hb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
    val cross = hashPairs
      .join(ids.select(col("id").as("ia"), col("h").as("ha")), "ha")
      .join(ids.select(col("id").as("ib"), col("h").as("hb")), "hb")
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("hamming"))
    val within = ids.as("a").join(ids.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        lit(0).as("hamming"))
    cross.unionByName(within)
  }

  // ------------------------------------------- audio energy hash

  /** Audio hash frame: 65 equal windows → 64 energy-gradient bits. */
  val AudioHashWindows = 65

  final case class AudioHash(doc_id: Long, n_samples: Long, ahash: Long,
                             decoded: Boolean)

  /** 64-bit energy-gradient hash of decoded PCM — dHash's audio twin and
    * the fingerprint for audio near-dup: split the clip into
    * [[AudioHashWindows]] equal windows (sample `i` belongs to window
    * `⌊i·65/n⌋`), per-window energy = exact-Long sum of |sample|,
    * bit `w` set iff window `w+1` is strictly louder than window `w`.
    * Re-encodes, level-independent edits, and small splices land within a
    * few bits; unrelated clips differ in ~32. Windowed |x|-energy is the
    * time-domain core of real audio fingerprints (spectral-band versions
    * swap FFT bins in for windows; the pipeline shape — decode → windowed
    * aggregate → gradient bits → hamming banding — is identical). */
  def audioHash64(bytes: Array[Byte]): Option[(Long, Long)] =
    sniffAudioFormat(bytes).flatMap { _ =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val af = ais.getFormat
        if (af.getSampleSizeInBits != 16) None
        else {
          val big = af.isBigEndian
          val data = ais.readAllBytes()
          val n = data.length / 2
          if (n < AudioHashWindows) None
          else {
            val en = new Array[Long](AudioHashWindows)
            var i = 0
            while (i < n) {
              val s =
                if (big) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff)).toShort
                else ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
              // sample i belongs to the window whose floor-boundary range
              // contains it; i*W/n is that window for every n >= W
              en((i.toLong * AudioHashWindows / n).toInt) += math.abs(s.toInt)
              i += 1
            }
            var hash = 0L
            var w = 0
            while (w < AudioHashWindows - 1) {
              if (en(w + 1) > en(w)) hash |= 1L << w
              w += 1
            }
            Some((n.toLong, hash))
          }
        }
      } catch { case _: Exception => None }
    }

  /** Partition-wise audio hashing over (id, payload) rows — same
    * shuffle-free decode shape and same flagged-not-stubbed policy as
    * [[extractImageHash]]. */
  def extractAudioHash(df: DataFrame, idCol: String, payloadCol: String): Dataset[AudioHash] =
    df.select(col(idCol), col(payloadCol)).mapPartitions { rows =>
      rows.map { r: Row =>
        val id = r.getLong(0)
        audioHash64(r.getAs[Array[Byte]](1)) match {
          case Some((n, h)) => AudioHash(id, n, h, decoded = true)
          case None         => AudioHash(id, 0L, 0L, decoded = false)
        }
      }
    }(Encoders.product[AudioHash])

  /** Deterministic synthetic PCM used by the m12/m13 gates: 650 samples =
    * 10 per window; a scene energy profile from `id % 5` plus a sparse
    * id-dependent window boost — same-scene clips hash within ~6 bits,
    * different scenes ~24+. Window-constant integer samples, so the
    * DuckDB oracle computes every window energy (and thus the hash) in
    * closed form while Spark round-trips real WAV bytes through
    * `javax.sound.sampled`. */
  def syntheticPcm(id: Long): Array[Short] = {
    val sc = (id % 5).toInt
    Array.tabulate(AudioHashWindows * 10) { g =>
      val w = g * AudioHashWindows / (AudioHashWindows * 10)
      val base = ((w * (sc + 1) + 3 * sc) % 7) * 30
      val boost = if ((w + id * 7) % 23 == 0) 70 else 0
      (base + boost).toShort
    }
  }

  /** Deterministic synthetic luminance used by the m10/m11 gates: a
    * scene pattern from `id % 5` (bucketed linear grid, steps of 60) plus
    * a sparse id-dependent ±1 perturbation — images of the same scene
    * hash within ~6 bits, different scenes ~27+. Pure integer arithmetic
    * so the DuckDB oracle replays the EXPECTED hash from first
    * principles while the Spark side round-trips real PNG bytes through
    * the JDK codec (the encode/decode path is what's under test). */
  def syntheticLuma(x: Int, y: Int, id: Long): Int = {
    val s = (id % 5).toInt
    val base = (((x * (s + 1) + y * (s + 2)) % 7) / 2) * 60
    val pert = if ((x + y * 9 + id) % 16 == 0) 1 else 0
    (base + pert) % 256
  }

  /** Grayscale PNG bytes for a synthetic luminance field (lossless —
    * decoded pixels equal `v` exactly, which is what makes the
    * arithmetic oracle sound). */
  def grayPngBytes(width: Int, height: Int, v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = v(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
