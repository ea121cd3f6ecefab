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
}
