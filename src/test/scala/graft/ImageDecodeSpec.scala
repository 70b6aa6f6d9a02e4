package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Real image decode through the JDK's `javax.imageio` (round-5 verdict
  * item): genuine PNG bytes parse to their true dimensions; non-image
  * payloads fall back to the documented video stub.
  */
class ImageDecodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("PNG round trip: encode (w, h) -> ImageIO header parse -> (w, h)") {
    for ((w, h) <- Seq((16, 16), (20, 30), (112, 68), (1, 1))) {
      val bytes = Multimodal.syntheticPng(w, h)
      // PNG magic
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')
      val m = Multimodal.decodeImage(7L, bytes)
      assert(m.isDefined, s"ImageIO must claim a real PNG ($w x $h)")
      assert(m.get.width == w && m.get.height == h && m.get.n_frames == 1L)
      assert(m.get.byte_len == bytes.length && m.get.first_byte == 0x89)
    }
  }

  test("JPEG decodes too (ImageIO built-in reader)") {
    val img = new java.awt.image.BufferedImage(
      24, 18, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val m = Multimodal.decodeImage(1L, bos.toByteArray)
    assert(m.exists(x => x.width == 24 && x.height == 18))
  }

  test("non-image payloads fall back to the stub") {
    val text = "not an image at all, just text".getBytes("UTF-8")
    assert(Multimodal.decodeImage(3L, text).isEmpty)
    assert(Multimodal.decode(3L, text) == Multimodal.decodeStub(3L, text))
    assert(Multimodal.decodeImage(4L, Array[Byte](1, 2, 3)).isEmpty) // < 8 bytes
  }

  test("distributed: decodeAll over a real-PNG blob table returns fixture dims") {
    implicit val sp = spark
    import sp.implicits._
    val docs = (0L until 40L).map(i => Tuple1(i)).toDF("doc_id")
    val meta = Multimodal.decodeAll(Multimodal.syntheticImageBlobs(
        docs, "doc_id", pmod(col("doc_id"), lit(9)) + lit(16),
        pmod(col("doc_id"), lit(5)) + lit(16)))
      .collect().sortBy(_.doc_id)
    assert(meta.length == 40)
    meta.foreach { m =>
      assert(m.width == m.doc_id % 9 + 16 && m.height == m.doc_id % 5 + 16)
      assert(m.n_frames == 1L)
    }
  }
}
