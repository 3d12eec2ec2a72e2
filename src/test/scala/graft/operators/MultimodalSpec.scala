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
}
