package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private def docs = Tables.load(spark, sfDir, "documents")

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaTable(docs)
    assert(media.schema("payload").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val r = media.filter(col("doc_id") === 7).head()
    assert(r.getAs[String]("fmt") === "jpeg") // 7 % 3 = 1 -> jpeg
    assert(r.getAs[Int]("width") === 7 % 16 * 64 + 256)
    assert(r.getAs[Int]("height") === 7 % 9 * 64 + 256)
  }

  test("feature extraction decodes deterministically per partition") {
    val feats = Multimodal.features(spark, docs).collect()
    assert(feats.length === docs.count())
    // recompute one row's features locally with the same stub
    val doc0 = docs.filter(col("doc_id") === 0).head().getAs[String]("text")
    val payload = doc0.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val (expectedSum, expectedBright) = new Multimodal.DecoderStub().decode(payload)
    val f0 = feats.find(_.doc_id == 0).get
    assert(f0.checksum === expectedSum)
    assert(f0.brightness === expectedBright)
    assert(f0.n_bytes === payload.length)
  }

  test("resize strides payload bytes and re-extracts features (q71)") {
    import spark.implicits._
    val resized = Multimodal.resize(
      Multimodal.mediaTable(docs).as[Multimodal.MediaRow]).collect()
    val doc0 = docs.filter(col("doc_id") === 0).head().getAs[String]("text")
    val payload = doc0.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val strided = payload.indices.collect { case i if i % 2 == 0 => payload(i) }.toArray
    val (cs, br) = new Multimodal.DecoderStub().decode(strided)
    val r0 = resized.find(_.doc_id == 0).get
    assert(r0.n_bytes === (payload.length + 1) / 2)
    assert(r0.checksum === cs)
    assert(r0.brightness === br)
    assert(r0.out_w === (0 % 16 * 64 + 256) / 2)
  }

  test("frame sampling emits one row per sampled frame, exact sums (q72)") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaTable(docs).as[Multimodal.MediaRow],
      frameSize = 64, stride = 2).collect()
    val doc0 = docs.filter(col("doc_id") === 0).head().getAs[String]("text")
    val payload = doc0.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val nf = (payload.length + 63) / 64
    val expected = Range(0, nf, 2)
    val f0 = frames.filter(_.doc_id == 0).sortBy(_.frame_idx)
    assert(f0.map(_.frame_idx).toSeq === expected)
    f0.foreach { f =>
      val from = f.frame_idx * 64
      val until = math.min(from + 64, payload.length)
      assert(f.n_bytes === until - from)
      assert(f.code_sum === (from until until).map(payload(_) & 0xff).map(_.toLong).sum)
    }
  }

  test("features survive relational aggregation (q56)") {
    val rows = graft.SparkEntry.queries("q56_media_features")(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("jpeg", "png", "webp"))
    assert(rows.map(_.getLong(1)).sum === docs.count())
    rows.foreach { r =>
      assert(r.getLong(2) > 0, "scaled brightness should be positive for text bytes")
    }
  }

  test("payloads do not shuffle: extraction is a narrow transformation") {
    val ds = Multimodal.features(spark, docs)
    val shuffles = ds.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "decode stage must not shuffle payload bytes")
  }

  test("PNG round-trip decodes real bytes back to the closed form (q111)") {
    val feats = Multimodal.pngRoundtrip(docs).collect()
    assert(feats.length === docs.count())
    feats.take(50).foreach { f =>
      val w = 16 + (f.doc_id % 3).toInt * 8
      val h = 16 + (f.doc_id % 5).toInt * 4
      assert(f.img_w === w, s"doc ${f.doc_id} width from PNG header")
      assert(f.img_h === h, s"doc ${f.doc_id} height from PNG header")
      val sum = (for (y <- 0 until h; x <- 0 until w)
        yield (f.doc_id * 31 + x + y) % 256).sum
      assert(f.mean_lum === sum.toDouble / (w * h),
        s"doc ${f.doc_id} lossless pixel sum")
    }
    // the payload really is a PNG: encode one and check the signature
    val bos = new java.io.ByteArrayOutputStream()
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    javax.imageio.ImageIO.write(img, "png", bos)
    val sig = bos.toByteArray.take(8).map(_ & 0xff)
    assert(sig.toSeq === Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
  }

  test("real PNG resize: decode → 2x NN downsample → re-encode → decode " +
      "(q113)") {
    val resized = Multimodal.pngResize(docs).collect()
    assert(resized.length === docs.count())
    resized.take(50).foreach { r =>
      val w = 16 + (r.doc_id % 3).toInt * 8
      val h = 16 + (r.doc_id % 5).toInt * 4
      val ow = (w + 1) / 2
      val oh = (h + 1) / 2
      assert(r.out_w === ow, s"doc ${r.doc_id} thumbnail width from PNG")
      assert(r.out_h === oh, s"doc ${r.doc_id} thumbnail height from PNG")
      // thumbnail pixel (x,y) = source (2x,2y) — closed form survives
      // BOTH lossless codec round-trips
      val sum = (for (y <- 0 until oh; x <- 0 until ow)
        yield (r.doc_id * 31 + 2 * x + 2 * y) % 256).sum
      assert(r.mean_lum === sum.toDouble / (ow * oh),
        s"doc ${r.doc_id} resized pixel sum")
    }
  }

  test("real PNG frame sampling: only sampled frames touch the codec " +
      "(q114)") {
    val frames = Multimodal.pngFrameSample(docs).collect()
    assert(frames.length === docs.count() * 3) // f = 0, 3, 6 of 8
    frames.filter(_.doc_id < 20).foreach { f =>
      assert(Seq(0, 3, 6).contains(f.frame_idx))
      val sum = (for (y <- 0 until 16; x <- 0 until 16)
        yield (f.doc_id * 31 + 7 * f.frame_idx + x + y) % 256).sum
      assert(f.mean_lum === sum.toDouble / 256,
        s"doc ${f.doc_id} frame ${f.frame_idx} decoded luminance")
    }
  }
}
