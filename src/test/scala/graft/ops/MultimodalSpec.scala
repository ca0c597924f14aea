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

  test("mm8: landmark matching is offset-invariant — shifted copies match although no frame aligns") {
    // Fixture leg: the query's own evidence bar holds for every
    // returned row, and the planted head-trimmed re-ingests surface.
    // The EXACT containment claims live in the synthesized test below
    // — they derive from the plant's construction, so a fixture
    // regeneration (different byte statistics) cannot flake them.
    val rows = Multimodal.queries("mm8_audio_dedup")(spark, sf).collect()
    assert(rows.nonEmpty, "no planted shifted copy found")
    val planted = rows.filter(r => r.getAs[Long]("id_b") >= 9000000L &&
      r.getAs[Long]("id_a") == r.getAs[Long]("id_b") - 9000000L)
    assert(planted.nonEmpty, "no planted pair in the result")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_shared") >= 5 && r.getAs[Double]("ratio") >= 0.5)
    }
  }

  test("mm8: synthesized shift — total containment (ratio 1.0), zero same-index frames") {
    // Construction-derived exactness, no fixture bytes involved: for
    // doc B = A with the first hop (8 bytes) dropped, B's frame t IS
    // A's frame t+1, so B's landmark (t,t+3) equals A's (t+1,t+4) —
    // B's landmark set is a subset of A's whatever the hash values
    // do. With only two docs, the df<=8 stop-landmark filter keeps
    // every key. Hence exactly one pair, n_shared == n_b, ratio == 1.0.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // deterministic LCG text: no 8-periodic run, so no frame repeats
    // at consecutive indices and the mm4/mm7-invisibility leg is real
    val rnd = new scala.util.Random(424242L)
    val text = Seq.fill(160)(('a' + rnd.nextInt(26)).toChar).mkString
    val shifted = text.substring(8)
    def frames(t: String): Seq[String] =
      (0 to (t.length - 16) / 8).map(i => t.substring(i * 8, i * 8 + 16))
    val (fa, fb) = (frames(text), frames(shifted))
    assert(fa.zip(fb).forall { case (x, y) => x != y },
      "a same-index frame survived the shift — alignment-bound hashes must NOT see this pair")
    val docs = Seq((1L, text), (2L, shifted)).toDF("doc_id", "text")
    val lm = Multimodal.mm8Fingerprints(docs).localCheckpoint(true)
    val nLm = lm.select("doc_id", "n_lm").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (out, live) = Multimodal.mm8Pairs(lm)
    val pairs = try out.collect() finally live.unpersist(blocking = false)
    assert(pairs.length == 1, s"expected exactly the planted pair, got ${pairs.length}")
    val p = pairs.head
    assert(p.getAs[Long]("id_a") == 1L && p.getAs[Long]("id_b") == 2L)
    assert(p.getAs[Int]("n_a") == nLm(1L) && p.getAs[Int]("n_b") == nLm(2L))
    assert(p.getAs[Long]("n_shared") == nLm(2L).toLong,
      "every landmark of the shifted copy must be contained in the original's set")
    assert(p.getAs[Double]("ratio") == 1.0)
  }

  test("mm9: scene segmentation recovers the content-planted shot structure") {
    val rows = Multimodal.queries("mm9_scene_detect")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("scene_id"))
      assert(sorted.map(_.getAs[Long]("scene_id")).toSeq ==
        (1L to rs.length.toLong), "scene ids must be contiguous from 1")
      assert(sorted.head.getAs[Long]("start_frame") == 1L,
        "the first scene must start at frame 1")
      // scenes tile the frame stream: each starts where the previous ended
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(1).getAs[Long]("start_frame") ==
          w(0).getAs[Long]("start_frame") + w(0).getAs[Long]("n_frames"),
          "scenes must partition the frame sequence without gaps or overlap")
      }
    }
    // detection quality: shots are planted 2-5 frames long; a missed cut
    // (32 independent coins landing within Hamming 6 — P ≈ 1e-5) merges
    // two shots. Allow a trace of that, no more.
    val lens = rows.map(_.getAs[Long]("n_frames"))
    val inRange = lens.count(l => l >= 2 && l <= 5)
    assert(inRange.toDouble / lens.length >= 0.95,
      s"only $inRange/${lens.length} scenes match the planted 2-5 frame shots")
    assert(byDoc.values.exists(_.length >= 3),
      "multi-shot videos must segment into multiple scenes")
  }

  test("mm10: misaligned captions drop, pixel-dup images elect one survivor") {
    val rows = Multimodal.queries("mm10_pair_curation")(spark, sf).collect()
    val by = rows.groupBy(_.getAs[String]("status"))
    // every planted caption swap must be caught (the 4-gram containment
    // of a true caption is 1.0 by construction; a far doc's caption
    // shares no 4-word run with the image content)
    val mis = rows.filter(_.getAs[Long]("img_id") >= 2000000L)
      .filter(_.getAs[Long]("img_id") < 4000000L)
    assert(mis.nonEmpty && mis.forall(_.getAs[String]("status") == "dropped_misaligned"),
      "planted caption swaps must all drop")
    // every planted pixel re-ingest loses the per-fingerprint election
    val dups = rows.filter(_.getAs[Long]("img_id") >= 4000000L)
    assert(dups.nonEmpty && dups.forall(_.getAs[String]("status") == "dup_loser"),
      "equal-caption re-ingests must lose to the lower id")
    // the originals of those re-ingests stay admitted — dedup never
    // removes the whole group
    val dupOrig = dups.map(_.getAs[Long]("img_id") - 4000000L).toSet
    assert(rows.filter(r => dupOrig(r.getAs[Long]("img_id")))
      .forall(_.getAs[String]("status") == "admitted"))
    // alignment arithmetic: score is exactly n_hit / n_cap
    rows.foreach { r =>
      assert(r.getAs[Double]("score") ==
        r.getAs[Int]("n_hit").toDouble / r.getAs[Int]("n_cap"))
    }
    assert(by.contains("admitted") && by("admitted").nonEmpty)
  }

  test("mm11: sequences are dense, offsets price the context window, images splice at their slot") {
    val rows = Multimodal.queries("mm11_interleave")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size == graft.Tables.documents(spark, sf).count())
    byDoc.foreach { case (id, segs) =>
      val ordered = segs.sortBy(_.getAs[Int]("seq"))
      // seq ids are dense 0..n-1 — the loader contract
      assert(ordered.map(_.getAs[Int]("seq")).toSeq == (0 until segs.length),
        s"doc $id: segment ids must be dense")
      // offsets are exactly cumulative token costs
      val offs = ordered.map(_.getAs[Long]("tok_off"))
      val toks = ordered.map(_.getAs[Int]("n_tokens").toLong)
      assert(offs.head == 0L)
      offs.zip(toks).sliding(2).foreach {
        case Array((o1, t1), (o2, _)) => assert(o2 == o1 + t1, s"doc $id: offset gap")
        case _ =>
      }
      val imgs = segs.filter(_.getAs[String]("kind") == "image")
      if (id % 3 == 0) {
        assert(imgs.length == 1, s"doc $id: image docs carry exactly one image segment")
        assert(imgs.head.getAs[Int]("n_tokens") == 576, "ViT patch-token cost")
        val nChunks = segs.length - 1
        assert(imgs.head.getAs[Int]("seq") == (id % (nChunks + 1)).toInt,
          s"doc $id: image must splice at its deterministic slot")
      } else assert(imgs.isEmpty, s"doc $id: text-only docs get no image segment")
    }
    // text token totals reproduce the word counts — nothing lost in chunking
    val wordTotal = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(Text.wordsCol(
          org.apache.spark.sql.functions.col("text"))))).collect()(0).getLong(0)
    val textToks = rows.filter(_.getAs[String]("kind") == "text")
      .map(_.getAs[Int]("n_tokens").toLong).sum
    assert(textToks == wordTotal, "chunked text tokens must sum to the corpus word count")
  }

  test("mm12: waves match retouches, wave 2 sees wave 1, and the index survives a restart") {
    val rows = Multimodal.queries("mm12_stream_image")(spark, sf).collect()
      .map(r => (r.getAs[Int]("wave"), r.getAs[Long]("new_id"),
        r.getAs[Long]("matched_id"), r.getAs[Int]("hamming")))
    // every planted retouch matches its own original (id - 8M)
    val retouches = rows.filter(t => t._2 >= 8000000L && t._2 < 9000000L)
    assert(retouches.nonEmpty)
    retouches.foreach { case (_, nid, _, _) =>
      assert(rows.exists(t => t._2 == nid && t._3 == nid - 8000000L),
        s"retouch $nid must match its original")
    }
    // the growth proof: wave 2's exact re-ingest matches the WAVE-1
    // entry (hamming 0) — an id only in the index because wave 1
    // appended mid-stream
    assert(rows.exists(t => t._1 == 2 && t._2 >= 9000000L &&
      t._3 >= 8000000L && t._4 == 0),
      "the wave-2 re-ingest must hit the wave-1 index entry exactly")
    // restart survival: a second session entering the SAME index dir
    // probes an index that already holds the first session's waves
    val dir = java.nio.file.Files.createTempDirectory("graft-mm12-spec-").toString
    try {
      Multimodal.mm12WithIndex(spark, sf, dir)
      val again = Multimodal.mm12WithIndex(spark, sf, dir).collect()
      // the restarted session's WAVE-1 retouch now also matches the
      // prior session's identically-fingerprinted 8M entry
      assert(again.exists(r => r.getAs[Int]("wave") == 1 &&
        r.getAs[Long]("matched_id") >= 8000000L),
        "a restarted session must see the index grown by the previous one")
    } finally graft.Fs.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("mm14: keyframe election stays in-scene and never loses to first-frame selection") {
    val scenes = Multimodal.queries("mm9_scene_detect")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("scene_id")) ->
        (r.getAs[Long]("start_frame"), r.getAs[Long]("n_frames"), r.getAs[Long]("key_fp")))
      .toMap
    val keys = Multimodal.queries("mm14_keyframes")(spark, sf).collect()
    // same scene inventory as mm9 — the shared chain cannot drift
    assert(keys.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("scene_id"))).toSet
      == scenes.keySet)
    keys.foreach { r =>
      val k = (r.getAs[Long]("doc_id"), r.getAs[Long]("scene_id"))
      val (start, n, firstFp) = scenes(k)
      val kf = r.getAs[Long]("key_frame")
      assert(kf >= start && kf < start + n, s"$k: keyframe outside its scene")
      // the elected frame is at least as close to the centroid as the
      // first frame (mm9's key_fp) — the property that justifies the
      // medoid election over first-frame sampling
      val firstHam = java.lang.Long.bitCount(firstFp ^ r.getAs[Long]("centroid_fp"))
      assert(r.getAs[Int]("key_ham") <= firstHam,
        s"$k: election lost to first-frame selection")
    }
    // single-shot scenes make the centroid the frame itself
    assert(keys.exists(_.getAs[Int]("key_ham") == 0),
      "no scene elected an exact-centroid keyframe — construction drifted")
  }

  test("mm13: real PNG bytes — signature, hand-checked checksum, corruption sensitivity") {
    import spark.implicits._
    val meta = Seq((12L, 80, 64)).toDF("doc_id", "width", "height")
    val asset = Multimodal.encodeReal(meta).collect()(0)
    // the binary column holds a genuine PNG, not a stand-in
    assert(asset.png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      "encoded bytes must carry the PNG signature")
    // decode recovers the planted pixels exactly (losslessness is the
    // bridge between the real codec and the SQL oracle): fold the
    // 8x8 thumbnail checksum by hand from the formula
    var want = 0L
    for (j <- 0 until 8; i <- 0 until 8) {
      val x = i * 80 / 8; val y = j * 64 / 8
      val rgb = Multimodal.plantRGB(12L, x, y)
      for (c <- Seq((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff))
        want = (want * 31 + c) % 2147483647L
    }
    val dec = Multimodal.decodeReal(Multimodal.encodeReal(meta)).collect()(0)
    assert(dec.thumb_checksum == want, "decoded pixels must equal the planted formula")
    assert((dec.out_w, dec.out_h, dec.pad_x, dec.pad_y) == (224, 179, 0, 45))
    // the bytes DRIVE the result: corrupting the compressed stream
    // must fail decode or change pixels — never silently agree
    val corrupt = asset.png.clone()
    corrupt(asset.png.length / 2) = (corrupt(asset.png.length / 2) ^ 0xff.toByte).toByte
    val got = try {
      Some(Multimodal.decodeReal(
        Seq(Multimodal.MmRealAsset(12L, 80, 64, corrupt)).toDS()).collect()(0))
    } catch { case _: Exception => None }
    assert(got.forall(_.thumb_checksum != want),
      "a corrupted payload must not reproduce the planted checksum")
  }

  test("mm16: real WAV bytes — RIFF signature, hand-folded checksum, corruption bites") {
    import spark.implicits._
    val meta = Seq((13L, 16000, 480)).toDF("doc_id", "sample_rate", "n_samples")
    // the encoded container is a genuine RIFF/WAVE file
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val pcm = new Array[Byte](2 * 480)
    (0 until 480).foreach { i =>
      val s = Multimodal.plantPcm(13L, i)
      pcm(2 * i) = (s & 0xff).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 480L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
      "encoded bytes must carry the RIFF/WAVE signature")
    // the operator's decoded checksum equals the hand-folded formula
    var want = 0L
    (0 until 480).foreach(i => want = (want * 31 + (13L * 31 + i * 7) % 65536) % 2147483647L)
    val got = Multimodal.wavStats(meta).collect()(0)
    assert(got.pcm_checksum == want, "decoded samples must equal the planted formula")
    assert(got.duration_ms == 1000L * 480 / 16000)
    // the bytes drive the result: corrupting one sample in the data
    // chunk must change the checksum (decode itself still succeeds —
    // PCM has no integrity check, which is exactly why the checksum
    // column exists)
    val corrupt = wav.clone()
    corrupt(wav.length - 7) = (corrupt(wav.length - 7) ^ 0x55).toByte
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(corrupt))
    val back = ais.readAllBytes()
    var sum = 0L
    (0 until 480).foreach { i =>
      val s = ((back(2 * i + 1).toInt << 8) | (back(2 * i) & 0xff)) + 32768
      sum = (sum * 31 + s) % 2147483647L
    }
    assert(sum != want, "a corrupted payload must not reproduce the planted checksum")
  }

  test("mm15: JPEG is genuinely lossy yet mean luma stays in the tolerance band") {
    import spark.implicits._
    // a spread of shapes, including the planted field's wraparound
    // discontinuities where quantization error is worst
    val meta = Seq((0L, 64, 64), (3L, 112, 112), (12L, 80, 64), (21L, 176, 80))
      .toDF("doc_id", "width", "height")
    val stats = Multimodal.jpegStats(meta).collect()
    assert(stats.length == 4)
    val errs = stats.map(s => math.abs(s.mluma_decoded - s.mluma_planted))
    // the tolerance contract both-sided: every image in band...
    assert(errs.forall(_ <= Multimodal.JpegLumaTol),
      s"mean-luma error must stay within ±${Multimodal.JpegLumaTol}, got ${errs.toSeq}")
    // ...and the codec is NOT secretly lossless (what makes mm15 a
    // different gate from mm13): some image decodes to different pixels
    assert(errs.exists(_ > 0.0),
      "JPEG round-trip must not be pixel-exact — this leg exists to prove the lossy contract")
    // compression really happened, and the letterbox math matches mm13's
    stats.foreach { s =>
      assert(s.n_bytes < 3 * s.width * s.height, "JPEG must beat raw RGB size")
      val (ow, oh) = if (s.width >= s.height) (224, s.height * 224 / s.width)
      else (s.width * 224 / s.height, 224)
      assert((s.out_w, s.out_h, s.pad_x, s.pad_y) == (ow, oh, 224 - ow, 224 - oh))
    }
    // the gate view bands every row to luma_in_tol = 1 / compressed = 1
    // (both flags share polarity: 1 = good)
    val gate = Multimodal.queries("mm15_jpeg")(spark, sf).collect()
    assert(gate.nonEmpty)
    assert(gate.forall(r => r.getAs[Int]("luma_in_tol") == 1 &&
      r.getAs[Int]("compressed") == 1))
  }

  test("mm17: decimation through two codec generations matches the codec-free fold") {
    val rows = Multimodal.queries("mm17_resample")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("in_rate"), r.getAs[Int]("out_rate"),
        r.getAs[Int]("n_in"), r.getAs[Int]("n_out"), r.getAs[Long]("out_checksum")))
    assert(rows.nonEmpty)
    for ((id, inRate, outRate, nIn, nOut, sum) <- rows) {
      // rate and count halve together, so duration is preserved exactly
      assert(outRate == inRate / 2 && nOut == nIn / 2)
      assert(1000L * nOut / outRate == 1000L * nIn / inRate, s"duration drift for doc $id")
      // scalar reference: the same pairwise average over the plant,
      // never touching a codec — two WAV generations must be transparent
      var want = 0L
      var j = 0
      while (j < nOut) {
        def shifted(k: Int): Long = (id * 31 + k * 7L) % 65536L
        want = (want * 31 + (shifted(2 * j) + shifted(2 * j + 1)) / 2) % 2147483647L
        j += 1
      }
      assert(sum == want, s"resampled checksum drifted for doc $id")
    }
  }

  test("mm18: peak normalization lands the max sample on exactly the target, codec-free fold agrees") {
    val rows = Multimodal.queries("mm18_gain")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_samples"),
        r.getAs[Int]("peak"), r.getAs[Int]("new_peak"), r.getAs[Long]("out_checksum")))
    assert(rows.nonEmpty)
    for ((id, n, peak, newPeak, sum) <- rows) {
      // scalar reference: recompute the plant, its peak, and the
      // sign-split rescale — two real WAV generations must be transparent
      def dev(i: Int): Int = (((id * 31 + i * 7L) % 65536L) - 32768L).toInt
      val wantPeak = (0 until n).map(i => math.abs(dev(i))).max
      assert(peak == wantPeak, s"peak drifted for doc $id")
      assert(newPeak == 30000,
        s"the max-|dev| sample must land on exactly the 30000 target (doc $id)")
      var want = 0L
      var i = 0
      while (i < n) {
        val d = dev(i)
        val mag = (math.abs(d) * 30000) / peak
        val s2 = if (d < 0) -mag else mag
        want = (want * 31 + (s2 + 32768)) % 2147483647L
        i += 1
      }
      assert(sum == want, s"normalized checksum drifted for doc $id")
    }
    // the pass must actually change loudness in both directions somewhere,
    // or it's a no-op: quiet clips amplified, hot clips attenuated
    assert(rows.forall(r => r._3 > 0))
    assert(rows.exists(_._3 < 30000) || rows.exists(_._3 > 30000),
      "fixture must contain clips away from the target peak")
  }

  test("mm20: VAD segments match a scalar gaps-and-islands recompute from the plant") {
    val got = Multimodal.queries("mm20_vad")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("seg_start"),
        r.getAs[Int]("seg_end"), r.getAs[Long]("n_wins"), r.getAs[Long]("seg_energy")))
    assert(got.nonEmpty)
    // scalar reference: recompute every clip's window energies from
    // the deterministic plant, take the exact lower median, and merge
    // above-median runs by hand
    val docs = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getAs[Long]("doc_id")).filter(_ % 3 == 1)
    val want = docs.flatMap { id =>
      val n = (400 + (id % 5) * 80).toInt
      val energies = (0 until n / 100).map { w =>
        (w * 100 until (w + 1) * 100).map { i =>
          val dev = Multimodal.plantPcm(id, i).toLong; dev * dev
        }.sum
      }
      val med = energies.sorted.apply((energies.length + 1) / 2 - 1)
      val speech = energies.zipWithIndex.filter(_._1 > med)
      // island merge: consecutive win_ids fold into one segment
      speech.foldLeft(Vector.empty[(Int, Int, Long, Long)]) {
        case (acc, (e, w)) if acc.nonEmpty && acc.last._2 == w - 1 =>
          val l = acc.last
          acc.init :+ ((l._1, w, l._3 + 1, l._4 + e))
        case (acc, (e, w)) => acc :+ ((w, w, 1L, e))
      }.map(seg => (id, seg._1, seg._2, seg._3, seg._4))
    }
    assert(got.sorted.toSeq == want.sorted.toSeq,
      "segments must equal the scalar recompute exactly")
    // structure: within a clip, segments are disjoint, ordered, and
    // separated by at least one silent window (else they'd have merged)
    got.groupBy(_._1).foreach { case (id, segs) =>
      val ss = segs.sortBy(_._2)
      ss.sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3 + 1, s"segments touch in clip $id")
        case _ =>
      }
      ss.foreach(sg => assert(sg._4 == (sg._3 - sg._2 + 1).toLong,
        s"segment length bookkeeping broke in clip $id"))
    }
    // adaptivity: strictly-above-lower-median thresholds roughly halve
    // each clip, so there must be both speech and silence everywhere
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    docs.foreach { id =>
      val n = ((400 + (id % 5) * 80) / 100).toInt
      val sp = byDoc.getOrElse(id, 0L)
      assert(sp > 0 && sp < n, s"clip $id must contain both speech and silence")
    }
  }

  test("mm21: patch grid matches the closed-form plant and conserves whole-image luma") {
    val got = Multimodal.queries("mm21_patch_grid")(spark, sf).collect()
      .map(r => ((r.getAs[Long]("doc_id"), r.getAs[Int]("py"), r.getAs[Int]("px")),
        (r.getAs[Int]("n_px"), r.getAs[Long]("luma_sum"), r.getAs[Long]("mean_mluma")))).toMap
    assert(got.nonEmpty)
    val docs = graft.Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getAs[Long]("doc_id")).filter(_ % 3 == 0)
    def luma(id: Long, x: Int, y: Int): Long = {
      val rgb = Multimodal.plantRGB(id, x, y)
      299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
    }
    for (id <- docs) {
      val w = (64 + (id % 8) * 16).toInt; val h = (64 + (id % 5) * 16).toInt
      val pw = w / 4; val ph = h / 4
      var whole = 0L
      for (py <- 0 until 4; px <- 0 until 4) {
        var sum = 0L
        for (y <- py * ph until (py + 1) * ph; x <- px * pw until (px + 1) * pw)
          sum += luma(id, x, y)
        whole += sum
        val (npx, ls, ml) = got((id, py, px))
        assert(npx == pw * ph, s"patch size wrong for doc $id ($py,$px)")
        assert(ls == sum, s"luma mass drifted for doc $id ($py,$px)")
        assert(ml == sum / (pw * ph), s"mean luma wrong for doc $id ($py,$px)")
      }
      // the 16 patches tile the frame exactly: conservation of luma
      val patchTotal = (0 until 4).flatMap(py => (0 until 4).map(px => got((id, py, px))._2)).sum
      assert(patchTotal == whole, s"patch grid does not tile the frame for doc $id")
    }
    assert(got.size == docs.length * 16, "every image fans out to exactly 16 patch tokens")
  }
}
