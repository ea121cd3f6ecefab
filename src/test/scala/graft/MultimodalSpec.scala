package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** Real media decode: in-memory PNG/JPEG/GIF fixtures round-trip through
  * the partition-wise decoder with TRUE dimensions and pixel statistics;
  * undecodable payloads fall back to the deterministic stub geometry —
  * and agree exactly with the pure-expression metadata path. */
class MultimodalSpec extends SparkSpecBase {

  private def image(w: Int, h: Int, fmt: String, rgb: Int = 0x7f3010): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK must ship a $fmt writer")
    out.toByteArray
  }

  test("header decode returns true dimensions for PNG/JPEG/GIF/BMP") {
    assert(Multimodal.decodeHeader(image(37, 21, "png")) == Some(("png", 37, 21, 1)))
    assert(Multimodal.decodeHeader(image(16, 8, "jpg")) == Some(("jpeg", 16, 8, 1)))
    assert(Multimodal.decodeHeader(image(5, 7, "gif")) == Some(("gif", 5, 7, 1)))
    assert(Multimodal.decodeHeader(image(9, 4, "bmp")) == Some(("bmp", 9, 4, 1)))
    assert(Multimodal.decodeHeader("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeHeader(Array.emptyByteArray).isEmpty)
  }

  test("partition-wise metadata decode: real dims for images, stub geometry elsewhere") {
    import spark.implicits._
    val text = "just some document text".getBytes("UTF-8")
    val df = Seq(
      (1L, image(37, 21, "png")),
      (2L, image(16, 8, "jpg")),
      (3L, text)
    ).toDF("doc_id", "payload")
    val metas = Multimodal.extractMetaDecoded(df, "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).format == "png" && metas(1L).width == 37 && metas(1L).height == 21)
    assert(metas(2L).format == "jpeg" && metas(2L).width == 16 && metas(2L).height == 8)
    // stub fallback must agree with the pure-expression path exactly
    val expr = df.filter(col("doc_id") === 3L)
      .select(Multimodal.extractMeta(col("payload")).as("m"))
      .select("m.format", "m.width", "m.height", "m.n_frames").head()
    assert(metas(3L).format == expr.getString(0))
    assert(metas(3L).width == expr.getInt(1))
    assert(metas(3L).height == expr.getInt(2))
    assert(metas(3L).n_frames == expr.getInt(3))
  }

  test("feature extraction decodes real pixels: mean luminance is exact") {
    import spark.implicits._
    val df = Seq(
      (1L, image(10, 10, "png", rgb = 0xffffff)), // white -> luma 255
      (2L, image(10, 10, "png", rgb = 0x000000)), // black -> luma 0
      (3L, "text payload".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val f = Multimodal.extractFeatures(df, "doc_id", "payload")
      .collect().map(m => m.doc_id -> m).toMap
    assert(math.abs(f(1L).mean_luma - 255.0) < 1e-9)
    assert(f(1L).width == 10 && f(1L).format == "png")
    assert(f(2L).mean_luma == 0.0)
    assert(f(3L).format == "stub/raw" && f(3L).mean_luma == -1.0)
    assert(f(3L).checksum != 0L, "stub checksum stays deterministic")
  }

  test("resize geometry composes with real decoded dimensions") {
    import spark.implicits._
    val df = Seq((1L, image(1024, 256, "png"))).toDF("doc_id", "payload")
    val meta = Multimodal.extractMetaDecoded(df, "doc_id", "payload").toDF()
    val rs = meta.withColumn("rs",
        Multimodal.resizeDims(col("width"), col("height"), 512, 512))
      .select("rs.new_width", "rs.new_height").head()
    assert(rs.getInt(0) == 512 && rs.getInt(1) == 128, "aspect-preserving fit")
  }

  test("sniff tolerates real-world header quirks: zero BMP file-size, GIF trailing padding") {
    // many BMP encoders write 0 in the declared-file-size field — the DIB
    // header size is the reliable corroboration
    val bmp = image(9, 4, "bmp")
    val zeroSize = bmp.clone()
    zeroSize(2) = 0; zeroSize(3) = 0; zeroSize(4) = 0; zeroSize(5) = 0
    assert(Multimodal.sniffFormat(zeroSize) == Some("bmp"))
    // a GIF may carry padding after the 0x3B trailer
    val gif = image(5, 7, "gif") ++ Array[Byte](0, 0, 0, 0)
    assert(Multimodal.sniffFormat(gif) == Some("gif"))
    assert(Multimodal.decodeHeader(gif) == Some(("gif", 5, 7, 1)),
      "the ImageIO reader is the final arbiter and reads through padding")
  }

  test("truncated image with intact header: meta and feature paths agree on geometry") {
    import spark.implicits._
    val png = image(37, 21, "png")
    val truncated = png.take(60) // IHDR intact, pixel data gone
    assert(Multimodal.decodeHeader(truncated) == Some(("png", 37, 21, 1)))
    val f = Multimodal.extractFeatures(
      Seq((1L, truncated)).toDF("doc_id", "payload"), "doc_id", "payload").head()
    assert(f.format == "png" && f.width == 37 && f.height == 21,
      "feature fallback must reuse the real header geometry")
    assert(f.mean_luma == -1.0, "only the pixel statistic is stubbed")
  }

  test("WAV synth round-trips through the real javax.sound.sampled parser") {
    val bytes = Multimodal.wavBytes(sampleRate = 12000, channels = 2, nSamples = 500)
    assert(bytes.length == 44 + 500 * 2 * 2)
    assert(Multimodal.decodeAudioHeader(bytes) ==
      Some(("wav", 12000, 2, 16, 500L, 500L * 1000 / 12000)))
  }

  test("AIFF headers decode through the same path") {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](2 * 320)), fmt, 320)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    assert(Multimodal.decodeAudioHeader(out.toByteArray) ==
      Some(("aiff", 8000, 1, 16, 320L, 40L)))
  }

  test("PCM features decode real samples: peak and exact mean via the JDK decoder") {
    val samples = Array.tabulate(400)(i => (((i * 7) % 2000) - 1000).toShort)
    val wav = Multimodal.wavBytesPcm(8000, samples)
    val Some((n, peak, sumAbs)) = Multimodal.decodeAudioFeatures(wav)
    assert(n == 400)
    assert(peak == samples.map(s => math.abs(s.toInt)).max)
    assert(sumAbs == samples.map(s => math.abs(s.toLong)).sum)
    // AIFF (big-endian) rides the same path
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val be = java.nio.ByteBuffer.allocate(800)
    samples.take(400).foreach(be.putShort)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(be.array()), fmt, 400)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    assert(Multimodal.decodeAudioFeatures(out.toByteArray) == Some((n, peak, sumAbs)),
      "big-endian AIFF samples must fold to identical features")
    // undecodable payloads are dropped, not fabricated
    assert(Multimodal.decodeAudioFeatures(wav.take(30)) == None)
  }

  test("MP4 synth round-trips through the ISO-BMFF box parser") {
    val bytes = Multimodal.mp4Bytes(timescale = 90000, durationUnits = 450000,
      width = 1920, height = 1080, nTracks = 2)
    assert(bytes.length == 140 + 2 * 100)
    assert(Multimodal.sniffVideoFormat(bytes) == Some("isom"))
    assert(Multimodal.decodeVideoHeader(bytes) ==
      Some(("isom", 90000L, 5000L, 1920, 1080, 2)),
      "brand, timescale, duration_ms, max track geometry, track count")
  }

  test("64-bit largesize and to-end boxes parse; truncated/non-video stub out") {
    // rewrite the moov box header to the size==1 + largesize form
    val base = Multimodal.mp4Bytes(600, 1200, 640, 480, 1)
    val moovSize = 8 + 108 + 100
    val grown = new java.io.ByteArrayOutputStream()
    grown.write(base, 0, 24) // ftyp unchanged
    val hdr = java.nio.ByteBuffer.allocate(16)
    hdr.putInt(1).put("moov".getBytes("US-ASCII")).putLong(moovSize + 8L)
    grown.write(hdr.array())
    grown.write(base, 32, base.length - 32) // moov children unchanged
    assert(Multimodal.decodeVideoHeader(grown.toByteArray) ==
      Some(("isom", 600L, 2000L, 640, 480, 1)),
      "largesize moov must parse identically")
    // truncation mid-moov: no fabricated metadata
    assert(Multimodal.decodeVideoHeader(base.take(60)) == None)
    assert(Multimodal.decodeVideoHeader("plain text".getBytes("UTF-8")) == None)
  }

  test("MJPEG frames survive the encode→mdat→extract→decode round trip") {
    val grays = Seq(64, 128, 192)
    val bytes = Multimodal.mjpegMp4Bytes(timescale = 600, durationUnits = 1800,
      width = 48, height = 32, grays = grays)
    // the container header still parses (ftyp + moov precede the mdat)
    assert(Multimodal.decodeVideoHeader(bytes).exists(_._1 == "isom"))
    val frames = Multimodal.decodeVideoFrames(bytes)
    assert(frames.map(f => (f._1, f._2, f._3)) ==
      Seq((0, 48, 32), (1, 48, 32), (2, 48, 32)),
      "every planted frame decodes with exact geometry")
    frames.zip(grays).foreach { case ((idx, _, _, luma), g) =>
      assert(math.abs(luma - g) <= 3.0,
        s"frame $idx mean luma $luma must sit within JPEG quantization of $g")
    }
    // maxFrames caps the scan without error
    assert(Multimodal.decodeVideoFrames(bytes, maxFrames = 2).size == 2)
    // non-MJPEG video (no mdat) and non-video payloads stay the stub: Nil
    assert(Multimodal.decodeVideoFrames(
      Multimodal.mp4Bytes(600, 1200, 640, 480, 1)) == Nil)
    assert(Multimodal.decodeVideoFrames("plain text".getBytes("UTF-8")) == Nil)
  }

  test("extractVideoFrames fans out one row per frame, partition-independent") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.mjpegMp4Bytes(600, 600, 32, 32, Seq(100))),
      (2L, Multimodal.mjpegMp4Bytes(600, 1200, 64, 48, Seq(80, 160))),
      (3L, "not a video".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val rows = Multimodal.extractVideoFrames(df, "doc_id", "payload")
      .collect().map(f => (f.doc_id, f.frame_idx, f.width, f.height)).toSet
    assert(rows == Set((1L, 0, 32, 32), (2L, 0, 64, 48), (2L, 1, 64, 48)),
      "dirty rows yield no frames; clean rows one per planted JPEG")
    val repart = Multimodal.extractVideoFrames(df.repartition(5), "doc_id", "payload")
      .collect().map(f => (f.doc_id, f.frame_idx, f.width, f.height)).toSet
    assert(repart == rows)
  }

  test("truncated / non-audio payloads fall back to the sentinel audio stub") {
    import spark.implicits._
    val wav = Multimodal.wavBytes(8000, 1, 100)
    val df = Seq(
      (1L, wav),
      (2L, wav.take(20)), // RIFF/WAVE magic intact, fmt chunk cut mid-header
      (3L, "text payload".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val m = Multimodal.extractAudioMeta(df, "doc_id", "payload")
      .collect().map(a => a.doc_id -> a).toMap
    assert(m(1L).container == "wav" && m(1L).sample_rate == 8000 &&
      m(1L).channels == 1 && m(1L).n_frames == 100L && m(1L).duration_ms == 12L)
    assert(m(2L).container == "stub/raw" && m(2L).sample_rate == -1 &&
      m(2L).n_frames == -1L, "a truncated header must not fabricate parameters")
    assert(m(3L).container == "stub/raw")
  }

  // ------------------------------------------- perceptual hash (dHash)

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private def pngFor(id: Long, w: Int = 9, h: Int = 8): Array[Byte] =
    Multimodal.grayPngBytes(w, h, (x, y) =>
      Multimodal.syntheticLuma(x * 9 / w, y * 8 / h, id))

  test("dHash area-average: a block-scaled image hashes identically to its 9x8 source") {
    import spark.implicits._
    val ids = (0L until 20L).toSeq
    def hashes(w: Int, h: Int): Map[Long, Long] = {
      val df = ids.map(id => (id, pngFor(id, w, h))).toDF("doc_id", "payload")
      Multimodal.extractImageHash(df, "doc_id", "payload")
        .collect().map(m => m.doc_id -> m.phash).toMap
    }
    val direct = hashes(9, 8)
    // 36x32 = each grid cell a constant 4x4 block; the floor-mean of a
    // constant block is the block value, so the hash must be identical
    val scaled = hashes(36, 32)
    assert(ids.forall(id => direct(id) == scaled(id)),
      "block-constant upscale must not change the dHash")
    assert(direct.values.toSet.size > 1, "scenes must produce distinct hashes")
  }

  test("dHash pigeonhole banding finds exactly the brute-force pair set") {
    import spark.implicits._
    val df = (0L until 60L).map(id => (id, pngFor(id))).toDF("doc_id", "payload")
    val hs = Multimodal.extractImageHash(df, "doc_id", "payload").toDF()
    val got = Multimodal.imageNearDupPairs(hs, "doc_id", "phash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val raw = hs.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("phash")))
    val brute = (for {
      (ia, ha) <- raw; (ib, hb) <- raw
      if ia < ib && hamming(ha, hb) <= 6
    } yield (ia, ib, hamming(ha, hb))).toSet
    assert(got == brute, s"banding must be lossless: ${got.size} vs ${brute.size}")
    assert(brute.nonEmpty && brute.forall { case (a, b, _) => a % 5 == b % 5 },
      "at threshold 6 only same-scene pairs qualify")
  }

  test("audio hash: gain-invariant, splice stays near, scenes separate, short clips flagged") {
    import spark.implicits._
    def wav(samples: Array[Short]): Array[Byte] =
      Multimodal.wavBytesPcm(8000, samples)
    val base = Multimodal.syntheticPcm(0L)
    val louder = base.map(s => (s * 2).toShort)          // same clip, +6 dB
    val spliced = base.clone()
    for (g <- 100 until 120) spliced(g) = (spliced(g) + 300).toShort // 2 windows edited
    val rows = Seq(
      (0L, wav(base)), (1L, wav(louder)), (2L, wav(spliced)),
      (3L, wav(Multimodal.syntheticPcm(1L))),            // different scene
      (4L, wav(Array.fill[Short](10)(5))),               // below 65 windows
      (5L, Array[Byte](9, 9, 9)))                        // not audio
    val hs = Multimodal.extractAudioHash(rows.toDF("doc_id", "payload"),
      "doc_id", "payload").collect().map(h => h.doc_id -> h).toMap
    assert(!hs(4L).decoded && !hs(5L).decoded,
      "short / non-audio payloads flagged, not stub-hashed")
    assert(hs(0L).n_samples == 650L)
    assert(hs(0L).ahash == hs(1L).ahash,
      "energy GRADIENTS are gain-invariant: a louder copy hashes identically")
    val splice = hamming(hs(0L).ahash, hs(2L).ahash)
    val cross = hamming(hs(0L).ahash, hs(3L).ahash)
    assert(splice <= 6, s"a 2-window splice drifted $splice bits")
    assert(cross >= 15 && splice < cross, s"scenes too close: $cross")
  }

  test("audio hamming banding equals brute force over the synthetic corpus") {
    import spark.implicits._
    val df = (0L until 60L)
      .map(id => (id, Multimodal.wavBytesPcm(8000, Multimodal.syntheticPcm(id))))
      .toDF("doc_id", "payload")
    val hs = Multimodal.extractAudioHash(df, "doc_id", "payload").toDF()
    val got = Multimodal.hammingNearDupPairs(hs, "doc_id", "ahash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val raw = hs.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("ahash")))
    val brute = (for {
      (ia, ha) <- raw; (ib, hb) <- raw
      if ia < ib && hamming(ha, hb) <= 6
    } yield (ia, ib, hamming(ha, hb))).toSet
    assert(got == brute, s"banding must be lossless: ${got.size} vs ${brute.size}")
    assert(brute.nonEmpty && brute.forall { case (a, b, _) => a % 5 == b % 5 })
  }

  test("dHash survives a lossy JPEG re-save; undecodable payloads are flagged out") {
    import spark.implicits._
    def jpegFor(id: Long): Array[Byte] = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(pngFor(id, 36, 32)))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val rows = Seq(
      (0L, pngFor(0L, 36, 32)), (100L, jpegFor(0L)), // same scene, lossy re-save
      (1L, pngFor(1L, 36, 32)),                      // different scene
      (999L, Array[Byte](1, 2, 3)),                  // undecodable
      (998L, Multimodal.grayPngBytes(4, 4, (_, _) => 7))) // below the 9x8 grid
    val hs = Multimodal.extractImageHash(rows.toDF("doc_id", "payload"),
      "doc_id", "payload").collect().map(m => m.doc_id -> m).toMap
    assert(!hs(999L).decoded && !hs(998L).decoded,
      "undecodable / undersized payloads must be flagged, not stub-hashed")
    val reSave = hamming(hs(0L).phash, hs(100L).phash)
    val crossScene = hamming(hs(0L).phash, hs(1L).phash)
    assert(reSave <= 10, s"JPEG re-save of the same scene drifted $reSave bits")
    assert(crossScene >= 15, s"different scenes too close: $crossScene bits")
    assert(reSave < crossScene)
  }
}
