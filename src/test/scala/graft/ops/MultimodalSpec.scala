package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("assets carry binary content with typed metadata") {
    val a = Multimodal.assets(spark, sf).collect()
    assert(a.length == 500)
    assert(a.forall(x => x.content.nonEmpty && Set("image", "audio", "video")(x.modality)))
    // content is the UTF-8 text bytes (ASCII corpus: 1 byte per char)
    assert(a.forall(x => x.content.length > 0 && x.width >= 64 && x.height >= 64))
  }

  test("feature extraction is deterministic and partition-count-insensitive") {
    val ds = Multimodal.assets(spark, sf)
    val once = Multimodal.extractFeatures(ds).collect().sortBy(_.doc_id)
    val again = Multimodal.extractFeatures(ds.repartition(13)).collect().sortBy(_.doc_id)
    assert(once.length == 500)
    assert(once.toSeq == again.toSeq)
  }

  test("decode stub honors per-modality frame stride") {
    val f = Multimodal.extractFeatures(Multimodal.assets(spark, sf)).collect()
    f.foreach { x =>
      val stride = x.modality match {
        case "video" => 24; case "audio" => 8; case _ => 1
      }
      assert(x.frames_sampled == (x.n_bytes + stride - 1) / stride)
      assert(x.mean_byte > 0 && x.mean_byte < 256)
    }
  }

  test("resize stub: aspect fit pins the long side, pads the short, clamps sampling") {
    val r = Multimodal.resize(Multimodal.assets(spark, sf)).collect()
    r.foreach { x =>
      assert(math.max(x.out_w, x.out_h) == 224, "long side must pin to the box")
      assert(x.pad_x == 224 - x.out_w && x.pad_y == 224 - x.out_h)
      assert(x.pad_x >= 0 && x.pad_y >= 0, "fit must never overflow the box")
      assert(x.out_bytes == x.out_w.toLong * x.out_h * 3)
      assert(x.grid_checksum >= 0 && x.grid_checksum < 2147483647L)
    }
    // a buffer SHORTER than width*height (text bytes stand in for
    // pixels) must clamp, not crash; empty content checksums to zero
    val tiny = MmAsset(1L, "image", "ab".getBytes("UTF-8"), 176, 128, 0)
    val rt = Multimodal.resizeStub(tiny)
    assert(rt.out_w == 224 && rt.out_h == 128 * 224 / 176)
    assert(rt.grid_checksum >= 0)
    assert(Multimodal.resizeStub(tiny.copy(content = Array.empty)).grid_checksum == 0L)
  }

  test("mm7: perceptual dedup finds exactly the planted retouches, at tiny Hamming distance") {
    val rows = Multimodal.queries("mm7_image_dedup")(spark, "/root/testdata/sf0.001").collect()
    // unrelated assets are independent 64-bit fingerprints (P(≤6) ≈
    // 2⁻⁴⁰): the result must be EXACTLY the 10 planted retouch pairs
    assert(rows.length == 10, s"expected the 10 planted pairs, got ${rows.length}")
    rows.foreach { r =>
      val a = r.getAs[Long]("id_a")
      assert(a % 3 == 0 && a < 30, s"unexpected pair anchor $a")
      assert(r.getAs[Long]("id_b") == a + 3000000L,
        "each retouch must pair with its original")
      // a first-character retouch touches ~one tile of these sizes
      assert(r.getAs[Int]("hamming") <= 3)
    }
  }
}
