package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaFeatures, MediaRecord}

/** Binary media pipeline: real PNG header parsing + stub fallback, through
  * the typed Dataset mapPartitions path. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrLen = Array(0, 0, 0, 13).map(_.toByte)
    val ihdrTag = "IHDR".getBytes("US-ASCII")
    def be(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    sig ++ ihdrLen ++ ihdrTag ++ be(w) ++ be(h) ++ Array.fill(5)(0.toByte)
  }

  test("PNG IHDR width/height parse from raw bytes") {
    assert(Multimodal.decodePngHeader(pngBytes(640, 480)).contains((640, 480)))
    assert(Multimodal.decodePngHeader("not a png at all".getBytes).isEmpty)
    assert(Multimodal.decodePngHeader(Array[Byte](0x89.toByte, 0x50)).isEmpty)
  }

  /** Real encoded bytes for an ImageIO-writable format: solid-color
    * BufferedImage round-tripped through the JDK's own encoder. */
  private def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.ORANGE); g.fillRect(0, 0, w, h); g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no JDK writer for $fmt")
    out.toByteArray
  }

  test("real JPEG/GIF/BMP/TIFF round-trip: JDK-encoded bytes decode to true dimensions via the real path") {
    for ((fmt, w, h) <- Seq(("jpg", 320, 200), ("gif", 17, 31), ("bmp", 64, 48),
                            ("tiff", 40, 56))) {
      val bytes = imageBytes(w, h, fmt)
      assert(Multimodal.looksLikeImage(bytes), s"$fmt magic must gate into ImageIO")
      val f = Multimodal.decode(MediaRecord(9L, bytes, "bin"))
      assert((f.width, f.height) == (w, h), s"$fmt decoded dims")
      assert(f.byte_len == bytes.length)
      assert(Set("jpeg", "gif", "bmp", "tif", "tiff").contains(f.format), s"got format ${f.format}")
      assert(f.decode_path == "imageio",
        s"all four in-JDK formats must take the REAL decode path, got ${f.decode_path}")
    }
  }

  test("a TEXT payload starting with 'BM' is NOT misdetected as BMP") {
    // BMP's magic is ASCII; the gate additionally requires the header's
    // file-size field to equal the blob length, which text never satisfies.
    val text = "BMW drivers and other text that begins with the letters B M".getBytes("UTF-8")
    assert(!Multimodal.looksLikeImage(text))
    val f = Multimodal.decode(MediaRecord(3L, text, "txt"))
    assert(f.format == "txt" && f.decode_path == "stub", "text must take the stub path")
  }

  test("typed mapPartitions pipeline dispatches PNG vs stub per record") {
    import spark.implicits._
    val records = Seq(
      MediaRecord(1L, pngBytes(1920, 1080), "bin"),
      MediaRecord(2L, "plain text bytes".getBytes("UTF-8"), "txt"),
    ).toDS()
    val out = records.mapPartitions(_.map(Multimodal.decode))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L) == MediaFeatures(1L, 29, 1920, 1080, "png", "header"))
    val t = out(2L)
    assert(t.format == "txt" && t.decode_path == "stub" && t.byte_len == 16 &&
      t.width == 64 + 'p' % 64 && t.height == 64 + 16 % 64)
  }
}
