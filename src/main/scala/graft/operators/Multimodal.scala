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
      // Per-PARTITION codec handles (the lifecycle the stub paths
      // model): ImageIO's static write/read entry points do a plugin
      // registry scan AND spool through a disk-backed cache stream on
      // EVERY call — per-row that cost dominates the actual codec
      // (~5000 images cost ~1.5 s; amortized, ~0.1 s).
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      val pngReader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      ids.map { docId =>
        val w = 16 + (docId % 3).toInt * 8   // 16 / 24 / 32
        val h = 16 + (docId % 5).toInt * 4   // 16..32
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, ((docId * 31 + x + y) % 256).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(img)
        ios.close()
        val png = bos.toByteArray // the real binary media payload
        // decode side: trust only the PNG bytes
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(png))
        pngReader.setInput(iis)
        val back = pngReader.read(0)
        iis.close()
        val bw = back.getWidth
        val bh = back.getHeight
        val r2 = back.getRaster
        var sum = 0L
        var yy = 0
        while (yy < bh) {
          var xx = 0
          while (xx < bw) { sum += r2.getSample(xx, yy, 0); xx += 1 }
          yy += 1
        }
        PngFeatures(docId, bw, bh, sum.toDouble / (bw * bh))
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
