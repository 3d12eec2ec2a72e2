package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs exist in this environment); everything Spark-side is real: the
  * binary+metadata schema, partition-wise batched iteration
  * (`mapPartitions` over a typed Dataset — the JVM analogue of
  * `mapInPandas`-style batch UDFs), and downstream relational handling of
  * the extracted features.
  *
  * Scale notes (100 TB of images): payloads never shuffle — features
  * extract in the scan stage (narrow), and only the small feature vectors
  * move. Decoder state (the `DecoderStub`) initializes once per PARTITION,
  * not per row, exactly how a real ONNX/codec handle would amortize.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, fmt: String, width: Int, height: Int,
      payload: Array[Byte])

  case class MediaFeatures(doc_id: Long, fmt: String, width: Int, height: Int,
      n_bytes: Int, checksum: Long, brightness: Double)

  /** STUB decoder — stands in for a real image/audio codec. Deterministic
    * fake: "brightness" = mean byte value, "checksum" = rolling polynomial
    * hash. A real deployment swaps `decode` for the codec call; the
    * signature (bytes → features) and the per-partition lifecycle hold.
    */
  class DecoderStub {
    def decode(payload: Array[Byte]): (Long, Double) = {
      var checksum = 0L
      var sum = 0L
      var i = 0
      while (i < payload.length) {
        checksum = (checksum * 31 + (payload(i) & 0xff)) % 1000000007L
        sum += (payload(i) & 0xff)
        i += 1
      }
      val brightness =
        if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
      (checksum, brightness)
    }
  }

  /** Synthesize a media table from `documents`: payload = utf-8 text bytes
    * standing in for encoded media; metadata derived deterministically.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("png"), lit("jpeg"), lit("webp")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("fmt"),
      (pmod(col("doc_id"), lit(16)) * 64 + 256).cast("int").as("width"),
      (pmod(col("doc_id"), lit(9)) * 64 + 256).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Partition-wise batched decode: one DecoderStub per partition. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new DecoderStub // per-partition init (≙ codec handle)
      rows.map { r =>
        val (checksum, brightness) = decoder.decode(r.payload)
        MediaFeatures(r.doc_id, r.fmt, r.width, r.height,
          r.payload.length, checksum, brightness)
      }
    }
  }

  def features(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(mediaTable(docs).as[MediaRow])
  }

  case class ResizedMedia(doc_id: Long, fmt: String, out_w: Int, out_h: Int,
      n_bytes: Int, checksum: Long, brightness: Double)

  /** STUB resize: a real codec decodes + downsamples pixels; the stand-in
    * strides the payload bytes by `factor` (deterministic, content-
    * dependent) and re-extracts features from the resized payload. The
    * Spark-side shape is the real one: per-partition codec handle,
    * payload never shuffles, only features/metadata leave the scan stage.
    */
  def resize(media: Dataset[MediaRow], factor: Int = 2): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = new DecoderStub // per-partition init (≙ codec handle)
      rows.map { r =>
        val out = new Array[Byte]((r.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
        val (checksum, brightness) = decoder.decode(out)
        ResizedMedia(r.doc_id, r.fmt, r.width / factor, r.height / factor,
          out.length, checksum, brightness)
      }
    }
  }

  /** Per-PARTITION PNG codec handles (the lifecycle the stub paths
    * model): ImageIO's static write/read entry points do a plugin
    * registry scan AND spool through a disk-backed cache stream on
    * EVERY call — per-row that cost dominates the actual codec
    * (~5000 images cost ~1.5 s; amortized, ~0.1 s).
    */
  /** A reusable, seekable, in-heap ImageIO stream over one growable
    * byte array — both halves of the codec round-trip in a single
    * zero-copy buffer. The JDK's own adapters
    * (`MemoryCacheImageOutput/InputStream` + a fresh
    * `ByteArrayOutput/InputStream` pair) allocate a block-cache list and
    * two array copies PER CALL; at ~1M round-trips per sf1 run that
    * allocation churn is GC time that grows with data volume (q113's
    * super-linear 0.1→1 exponent flagged r13–r15). One instance per
    * partition, reset per image, amortizes to zero steady-state
    * allocation for the stream machinery.
    */
  private final class ByteArrayImageStream
      extends javax.imageio.stream.ImageOutputStreamImpl {
    private var buf = new Array[Byte](1 << 16)
    private var len = 0

    /** Start a fresh image in the same buffer. */
    def rewindForWrite(): Unit = { len = 0; streamPos = 0; bitOffset = 0 }
    /** Rewind to serve the just-written bytes as decoder input. */
    def rewindForRead(): Unit = { streamPos = 0; bitOffset = 0 }
    def data: Array[Byte] = buf
    def size: Int = len

    private def ensure(cap: Int): Unit =
      if (cap > buf.length) {
        var n = buf.length << 1
        while (n < cap) n <<= 1
        buf = java.util.Arrays.copyOf(buf, n)
      }
    override def write(b: Int): Unit = {
      flushBits()
      val at = streamPos.toInt
      ensure(at + 1)
      buf(at) = b.toByte
      streamPos += 1
      if (streamPos > len) len = at + 1
    }
    override def write(b: Array[Byte], off: Int, l: Int): Unit = {
      flushBits()
      val at = streamPos.toInt
      ensure(at + l)
      System.arraycopy(b, off, buf, at, l)
      streamPos += l
      if (streamPos.toInt > len) len = streamPos.toInt
    }
    override def read(): Int =
      if (streamPos >= len) -1
      else { val v = buf(streamPos.toInt) & 0xff; streamPos += 1; v }
    override def read(b: Array[Byte], off: Int, l: Int): Int = {
      if (streamPos >= len) return -1
      val n = math.min(l, len - streamPos.toInt)
      System.arraycopy(buf, streamPos.toInt, b, off, n)
      streamPos += n
      n
    }
    override def length(): Long = len.toLong
    override def isCached: Boolean = true
    override def isCachedMemory: Boolean = true
    // flushBefore is a discard HINT; honoring it would advance
    // flushedPos and forbid the rewind-to-0 the decode half needs.
    // Everything stays cached in the buffer, so dropping the hint is
    // within the ImageInputStream contract.
    override def flushBefore(pos: Long): Unit = ()
  }

  final class PngCodec {
    javax.imageio.ImageIO.setUseCache(false)
    private val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    private val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    private val stream = new ByteArrayImageStream

    /** Encode to REAL PNG bytes and decode them back, both halves over
      * the codec's reusable buffer — bit-identical to
      * `decode(encode(img))` with none of the per-call stream/copy
      * allocation. The hot path of the round-trip queries.
      */
    def roundTrip(img: java.awt.image.BufferedImage)
        : java.awt.image.BufferedImage = {
      stream.rewindForWrite()
      writer.setOutput(stream)
      writer.write(img)
      stream.rewindForRead()
      reader.setInput(stream)
      reader.read(0)
    }

    def encode(img: java.awt.image.BufferedImage): Array[Byte] = {
      stream.rewindForWrite()
      writer.setOutput(stream)
      writer.write(img)
      java.util.Arrays.copyOf(stream.data, stream.size)
    }

    def decode(png: Array[Byte]): java.awt.image.BufferedImage = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(png))
      reader.setInput(iis)
      val img = reader.read(0)
      iis.close()
      img
    }
  }

  /** Deterministic grayscale test image: pixel(x,y) =
    * (docId·31 + salt + x + y) mod 256 — the synthetic stand-in for a
    * stored camera payload, closed-form reproducible by a SQL oracle.
    */
  private def synthImage(docId: Long, w: Int, h: Int,
      salt: Int = 0): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((docId * 31 + salt + x + y) % 256).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  private def meanLum(img: java.awt.image.BufferedImage): (Int, Int, Double) = {
    val w = img.getWidth
    val h = img.getHeight
    val r = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += r.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, sum.toDouble / (w * h))
  }

  case class PngFeatures(doc_id: Long, img_w: Int, img_h: Int,
      mean_lum: Double)

  /** REAL image codec path (the stub's endgame, r5 task 8 / r6 task 8):
    * `javax.imageio` ships in the JDK, so PNG encode/decode needs no new
    * dependency. Each row synthesizes a deterministic grayscale image
    * from its doc_id (pixel(x,y) = (doc_id·31 + x + y) mod 256), encodes
    * it to REAL PNG bytes — the binary media column — then the decode
    * side reads width/height/pixels back OUT OF THE PNG (nothing is
    * trusted from metadata) and emits mean luminance. PNG is lossless,
    * the pixel sum is integral, and one IEEE-correctly-rounded division
    * is deterministic across engines, so the features are bit-exact
    * closed forms a DuckDB oracle reproduces.
    * Per-partition codec lifecycle and features-only egress match the
    * stub paths; a real camera-data deployment swaps the synthesizer
    * for stored payloads.
    */
  def pngRoundtrip(docs: DataFrame): Dataset[PngFeatures] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val codec = new PngCodec
      ids.map { docId =>
        val w = 16 + (docId % 3).toInt * 8   // 16 / 24 / 32
        val h = 16 + (docId % 5).toInt * 4   // 16..32
        // encode to a real PNG payload, then trust ONLY the PNG bytes
        // on the decode side (roundTrip = encode + decode, zero-copy)
        val (bw, bh, lum) = meanLum(codec.roundTrip(synthImage(docId, w, h)))
        PngFeatures(docId, bw, bh, lum)
      }
    }
  }

  case class ResizedPng(doc_id: Long, out_w: Int, out_h: Int,
      mean_lum: Double)

  /** REAL resize path (the `resize` stub's endgame): encode the
    * synthesized image to actual PNG bytes, decode them, downsample 2×
    * in PIXEL space (nearest-neighbor: out(x,y) = in(2x, 2y) — exact
    * integer geometry, so a SQL oracle reproduces it bit-for-bit,
    * unlike interpolating kernels whose rounding is implementation
    * lore), re-encode the small image to PNG — the artifact a thumbnail
    * pipeline would store — then decode THAT and emit its features.
    * Two full codec round-trips per row; per-partition codec handles;
    * features-only egress.
    */
  def pngResize(docs: DataFrame): Dataset[ResizedPng] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val codec = new PngCodec
      ids.map { docId =>
        val w = 16 + (docId % 3).toInt * 8
        val h = 16 + (docId % 5).toInt * 4
        val big = codec.roundTrip(synthImage(docId, w, h))
        val ow = (big.getWidth + 1) / 2
        val oh = (big.getHeight + 1) / 2
        val small = new java.awt.image.BufferedImage(
          ow, oh, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val src = big.getRaster
        val dst = small.getRaster
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            dst.setSample(x, y, 0, src.getSample(2 * x, 2 * y, 0))
            x += 1
          }
          y += 1
        }
        val (bw, bh, lum) = meanLum(codec.roundTrip(small))
        ResizedPng(docId, bw, bh, lum)
      }
    }
  }

  case class FrameLum(doc_id: Long, frame_idx: Int, mean_lum: Double)

  /** REAL frame-sampling path (the `sampleFrames` stub's endgame): a
    * doc's "video" is `nFrames` deterministic 16×16 frames (frame f's
    * pixels salted by 7·f); every `stride`-th frame round-trips through
    * the REAL PNG codec and emits its decoded mean luminance. Work and
    * output stay proportional to the SAMPLE — unsampled frames are
    * never encoded or decoded, the property that matters when the
    * payload is hours of video.
    */
  def pngFrameSample(docs: DataFrame, nFrames: Int = 8,
      stride: Int = 3): Dataset[FrameLum] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      val codec = new PngCodec
      ids.flatMap { docId =>
        Iterator.range(0, nFrames, stride).map { f =>
          val (_, _, lum) =
            meanLum(codec.roundTrip(synthImage(docId, 16, 16, salt = 7 * f)))
          FrameLum(docId, f, lum)
        }
      }
    }
  }

  case class Frame(doc_id: Long, fmt: String, frame_idx: Int, n_bytes: Int,
      code_sum: Long)

  /** STUB frame sampling: the payload is treated as a "video" of
    * `frameSize`-byte frames; every `stride`-th frame is decoded
    * (byte-sum feature stands in for the real frame decode). One output
    * row per SAMPLED frame — work and output are proportional to the
    * sample, never the full payload length.
    */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 256,
      stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val len = r.payload.length
        val nf = (len + frameSize - 1) / frameSize
        Iterator.range(0, nf, stride).map { f =>
          val from = f * frameSize
          val until = math.min((f + 1) * frameSize, len)
          var s = 0L
          var i = from
          while (i < until) { s += (r.payload(i) & 0xff); i += 1 }
          Frame(r.doc_id, r.fmt, f, until - from, s)
        }
      }
    }
  }
}
