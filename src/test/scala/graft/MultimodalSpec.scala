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

  test("typed mapPartitions pipeline dispatches PNG vs stub per record") {
    import spark.implicits._
    val records = Seq(
      MediaRecord(1L, pngBytes(1920, 1080), "bin"),
      MediaRecord(2L, "plain text bytes".getBytes("UTF-8"), "txt"),
    ).toDS()
    val out = records.mapPartitions(_.map(Multimodal.decode))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L) == MediaFeatures(1L, 29, 1920, 1080, "png"))
    val t = out(2L)
    assert(t.format == "txt" && t.byte_len == 16 &&
      t.width == 64 + 'p' % 64 && t.height == 64 + 16 % 64)
  }
}
