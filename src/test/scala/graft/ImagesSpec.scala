package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.{CorpusSpec, Images, SyntheticCorpus}

class ImagesSpec extends AnyFunSuite {

  test("synthesis is deterministic") {
    val a = Images.encodePng(Images.synth(7, 48, 48))
    val b = Images.encodePng(Images.synth(7, 48, 48))
    assert(java.util.Arrays.equals(a, b))
  }

  test("PNG round-trip is lossless (PSNR = inf)") {
    val img = Images.synth(3, 48, 48)
    val back = Images.decode(Images.encodePng(img))
    assert(Images.psnr(img, back).isPosInfinity)
  }

  test("JPEG round-trip clears the 40 dB PSNR gate") {
    (0L until 20L).foreach { id =>
      val img = Images.synth(id, 48, 48)
      val back = Images.decode(Images.encodeJpeg(img))
      val p = Images.psnr(img, back)
      assert(p >= 40.0, s"id=$id psnr=$p")
    }
  }

  test("phash survives JPEG re-encoding within small hamming") {
    (0L until 20L).foreach { id =>
      val img = Images.synth(id, 48, 48)
      val h1 = Images.phash(img)
      val h2 = Images.phashOfBytes(Images.encodeJpeg(img))
      assert(Images.hamming(h1, h2) <= 4, s"id=$id d=${Images.hamming(h1, h2)}")
    }
  }

  test("planted near-dups land within hamming 6; threshold separates planted pairs") {
    val spec = CorpusSpec()
    // id % 7 == 3 renders id-1 with jitter
    val dupIds = (0L until spec.totalDetails)
      .filter(id => id % 7 == 3 && id > 0 && id % 13 != 7 && (id - 1) % 13 != 7)
    assert(dupIds.nonEmpty)
    dupIds.foreach { id =>
      val a = SyntheticCorpus.detailRow(spec, id)
      val b = SyntheticCorpus.detailRow(spec, id - 1)
      val d = Images.hamming(a.phash, b.phash)
      assert(d <= 6, s"near-dup pair ($id,${id - 1}) hamming=$d")
    }
    val far = Images.hamming(
      Images.phash(Images.synth(100, 48, 48)),
      Images.phash(Images.synth(200, 48, 48)))
    assert(far > 6, s"unrelated pair too close: $far")
  }

  test("resize: exact target dims, deterministic bytes, luma preserved") {
    val img = Images.synth(17, 96, 64)
    val t1 = Images.resize(img, 32, 32)
    val t2 = Images.resize(Images.synth(17, 96, 64), 32, 32)
    assert(t1.getWidth == 32 && t1.getHeight == 32)
    // area-average is specified arithmetic — byte-identical across calls
    assert(java.util.Arrays.equals(Images.encodePng(t1), Images.encodePng(t2)))
    // averaging pools pixels: mean luma moves only slightly
    assert(math.abs(Images.meanLuma(t1) - Images.meanLuma(img)) < 4.0)
    // and a different source yields a different thumbnail
    val other = Images.resize(Images.synth(99, 96, 64), 32, 32)
    assert(!java.util.Arrays.equals(Images.encodePng(t1), Images.encodePng(other)))
  }

  test("frame sampling strides pick ceil(n/stride) frames (q43 shape)") {
    val q43 = graft.ops.MultimodalOps.q43FrameSample(SparkTestSession.spark, "").collect()
    assert(q43.length == 64)
    q43.foreach { r =>
      assert(r.getAs[Long]("n_sampled") == 3L)   // ceil(12/4)
      assert(r.getAs[Long]("n_unique_phash") >= 2L) // jittered frames differ
    }
  }

  test("corpus rows: listing JSON shape and detail payload") {
    val spec = CorpusSpec(hosts = 1, listPages = 2, detailsPerList = 3)
    val l = SyntheticCorpus.listingRow(spec, 0, 1)
    assert(l.contentType == "application/json")
    val body = new String(l.body, "UTF-8")
    assert(body.contains("\"/img/0\"") && body.contains("\"hasNext\":true"))
    val l2 = SyntheticCorpus.listingRow(spec, 0, 2)
    assert(new String(l2.body, "UTF-8").contains("\"hasNext\":false"))
    val d = SyntheticCorpus.detailRow(spec, 1)
    assert(d.statusCode == 200 && d.fmt == "png" && d.caption.contains("image 1"))
    assert(Images.phashOfBytes(d.body) == d.phash)
  }
}
