package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal query surface over the synthesized media table. */
object Media {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary + metadata plumbing, SQL-side only → oracle-checked: per-
    // format size stats over the payload bytes.
    "q55_media_meta" -> ((s, d) =>
      Multimodal.mediaTable(Tables.load(s, d, "documents"))
        .groupBy("fmt")
        .agg(
          count(lit(1)).as("cnt"),
          sum(octet_length(col("payload"))).as("total_bytes"),
          max("width").as("max_w"), max("height").as("max_h"))
        .orderBy("fmt")),

    // Full decode path (mapPartitions stub): deterministic features →
    // relational aggregation. The stub's checksum/brightness are pure
    // integer math over the payload bytes, so the whole query IS
    // DuckDB-expressible and hash-oracled. Brightness aggregates via
    // floor-scaled int64 (per-doc double → one IEEE op → exact floor;
    // int64 sum + integer DIV — no float-summation-order hazard).
    "q56_media_features" -> ((s, d) =>
      Multimodal.features(s, Tables.load(s, d, "documents")).toDF()
        .groupBy("fmt")
        .agg(
          count(lit(1)).as("cnt"),
          expr("sum(CAST(floor(brightness * 10000) AS BIGINT)) DIV count(1)")
            .as("avg_brightness_scaled"),
          countDistinct(col("checksum")).as("distinct_payloads"))
        .orderBy("fmt")),

    // Resize path (stride-2 byte downsample stub): features re-extracted
    // from the resized payload, aggregated with the same exact-integer
    // discipline as q56 — fully DuckDB-expressible, hash-oracled.
    "q71_media_resize" -> ((s, d) => {
      import s.implicits._
      Multimodal.resize(
        Multimodal.mediaTable(Tables.load(s, d, "documents"))
          .as[Multimodal.MediaRow]).toDF()
        .groupBy("fmt")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("n_bytes").cast("long")).as("resized_bytes"),
          expr("sum(CAST(floor(brightness * 10000) AS BIGINT)) DIV count(1)")
            .as("avg_brightness_scaled"),
          countDistinct(col("checksum")).as("distinct_resized"))
        .orderBy("fmt")
    }),

    // Frame sampling (256-byte frames, every 4th): one row per sampled
    // frame; per-format totals are pure integer math over payload bytes.
    "q72_frame_sample" -> ((s, d) => {
      import s.implicits._
      Multimodal.sampleFrames(
        Multimodal.mediaTable(Tables.load(s, d, "documents"))
          .as[Multimodal.MediaRow]).toDF()
        .groupBy("fmt")
        .agg(
          countDistinct(col("doc_id")).as("docs"),
          count(lit(1)).as("frames_sampled"),
          sum(col("n_bytes").cast("long")).as("sampled_bytes"),
          sum(col("code_sum")).as("sampled_code_sum"))
        .orderBy("fmt")
    }),

    // REAL codec round-trip (javax.imageio, in the JDK): synthesize a
    // deterministic grayscale image per doc, encode to actual PNG bytes,
    // decode width/height/pixels back out of the PNG, emit mean
    // luminance. Lossless codec + integral pixel sum + one IEEE division
    // = bit-exact against the closed-form DuckDB oracle.
    "q111_png_roundtrip" -> ((s, d) =>
      Multimodal.pngRoundtrip(Tables.load(s, d, "documents")).toDF()
        .orderBy("doc_id")),

    // REAL resize (q71's codec endgame): PNG-decode → 2× nearest-
    // neighbor pixel downsample → PNG re-encode → decode the thumbnail
    // → features. Exact integer geometry ⇒ closed-form oracle.
    "q113_png_resize" -> ((s, d) =>
      Multimodal.pngResize(Tables.load(s, d, "documents")).toDF()
        .orderBy("doc_id")),

    // REAL frame sampling (q72's codec endgame): every 3rd of 8 frames
    // round-trips the real PNG codec; unsampled frames never touch it.
    "q114_png_frames" -> ((s, d) =>
      Multimodal.pngFrameSample(Tables.load(s, d, "documents")).toDF()
        .orderBy("doc_id", "frame_idx"))
  )

  val oracleSql: Map[String, String] = Map(
    "q55_media_meta" ->
      """SELECT fmt, count(*) AS cnt,
        |  CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
        |  max(width) AS max_w, max(height) AS max_h
        |FROM (
        |  SELECT doc_id,
        |    ['png', 'jpeg', 'webp'][CAST(doc_id % 3 AS INTEGER) + 1] AS fmt,
        |    CAST(doc_id % 16 * 64 + 256 AS INTEGER) AS width,
        |    CAST(doc_id % 9 * 64 + 256 AS INTEGER) AS height,
        |    encode(text) AS payload
        |  FROM documents)
        |GROUP BY fmt ORDER BY fmt""".stripMargin,

    // The DecoderStub re-expressed in DuckDB: text is ASCII in this
    // corpus (verified octet_length == length), so char codes == payload
    // bytes; checksum = left fold (acc*31 + byte) % 1e9+7, brightness =
    // mean byte, floor-scaled ×10⁴ into int64 before any aggregation.
    "q56_media_features" ->
      """WITH feat AS (
        |  SELECT doc_id,
        |    ['png', 'jpeg', 'webp'][CAST(doc_id % 3 AS INTEGER) + 1] AS fmt,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
        |    CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(floor(CAST(list_sum(list_transform(string_split(text, ''),
        |           c -> CAST(ascii(c) AS BIGINT))) AS DOUBLE) / length(text) * 10000)
        |           AS BIGINT)
        |    END AS b_scaled
        |  FROM documents)
        |SELECT fmt, count(*) AS cnt,
        |  CAST(sum(b_scaled) // count(*) AS BIGINT) AS avg_brightness_scaled,
        |  count(DISTINCT checksum) AS distinct_payloads
        |FROM feat GROUP BY fmt ORDER BY fmt""".stripMargin,

    // stride-2 resize: strided byte codes, then the q56 feature math
    "q71_media_resize" ->
      """WITH codes AS (
        |  SELECT doc_id,
        |    ['png', 'jpeg', 'webp'][CAST(doc_id % 3 AS INTEGER) + 1] AS fmt,
        |    list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))
        |      AS c
        |  FROM documents),
        |res AS (
        |  SELECT doc_id, fmt,
        |    list_transform(range(1, len(c) + 1, 2), i -> c[i]) AS r
        |  FROM codes),
        |feat AS (
        |  SELECT doc_id, fmt, CAST(len(r) AS BIGINT) AS n_bytes,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), r),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
        |    CASE WHEN len(r) = 0 THEN CAST(0 AS BIGINT)
        |         ELSE CAST(floor(CAST(list_sum(r) AS DOUBLE) / len(r) * 10000)
        |           AS BIGINT)
        |    END AS b_scaled
        |  FROM res)
        |SELECT fmt, count(*) AS cnt,
        |  CAST(sum(n_bytes) AS BIGINT) AS resized_bytes,
        |  CAST(sum(b_scaled) // count(*) AS BIGINT) AS avg_brightness_scaled,
        |  count(DISTINCT checksum) AS distinct_resized
        |FROM feat GROUP BY fmt ORDER BY fmt""".stripMargin,

    // 256-byte frames, every 4th sampled; per-frame byte sums over slices
    "q72_frame_sample" ->
      """WITH codes AS (
        |  SELECT doc_id,
        |    ['png', 'jpeg', 'webp'][CAST(doc_id % 3 AS INTEGER) + 1] AS fmt,
        |    list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))
        |      AS c
        |  FROM documents),
        |frames AS (
        |  SELECT doc_id, fmt,
        |    unnest(range(0, CAST(ceil(len(c) / 256.0) AS INTEGER), 4)) AS f,
        |    c
        |  FROM codes),
        |sampled AS (
        |  SELECT doc_id, fmt, f,
        |    least((f + 1) * 256, len(c)) - f * 256 AS n_bytes,
        |    CAST(list_sum(c[f * 256 + 1 : least((f + 1) * 256, len(c))])
        |      AS BIGINT) AS code_sum
        |  FROM frames)
        |SELECT fmt, count(DISTINCT doc_id) AS docs,
        |  count(*) AS frames_sampled,
        |  CAST(sum(n_bytes) AS BIGINT) AS sampled_bytes,
        |  CAST(sum(code_sum) AS BIGINT) AS sampled_code_sum
        |FROM sampled GROUP BY fmt ORDER BY fmt""".stripMargin,

    // The synthesized image in closed form: pixel(x,y) =
    // (doc_id*31 + x + y) % 256 over a w×h grid with w = 16+(id%3)*8,
    // h = 16+(id%5)*4. The Spark side gets these numbers by decoding
    // REAL PNG bytes; the oracle recomputes them arithmetically.
    "q111_png_roundtrip" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS img_w,
        |    CAST(16 + (doc_id % 5) * 4 AS INTEGER) AS img_h
        |  FROM documents),
        |px AS (
        |  SELECT d.doc_id, d.img_w, d.img_h, gx.x, gy.y
        |  FROM dims d,
        |    LATERAL (SELECT unnest(range(0, d.img_w)) AS x) gx,
        |    LATERAL (SELECT unnest(range(0, d.img_h)) AS y) gy)
        |SELECT doc_id, img_w, img_h,
        |  CAST(sum((doc_id * 31 + x + y) % 256) AS DOUBLE) / (img_w * img_h)
        |    AS mean_lum
        |FROM px GROUP BY doc_id, img_w, img_h
        |ORDER BY doc_id""".stripMargin,

    // 2× nearest-neighbor downsample of the synthesized image: the
    // thumbnail's pixel (x,y) = source (2x, 2y) =
    // (doc_id*31 + 2x + 2y) % 256 over ceil(w/2) × ceil(h/2). The Spark
    // side gets these via two real PNG round-trips; the oracle
    // recomputes them arithmetically.
    "q113_png_resize" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST((16 + (doc_id % 3) * 8 + 1) // 2 AS INTEGER) AS out_w,
        |    CAST((16 + (doc_id % 5) * 4 + 1) // 2 AS INTEGER) AS out_h
        |  FROM documents),
        |px AS (
        |  SELECT d.doc_id, d.out_w, d.out_h, gx.x, gy.y
        |  FROM dims d,
        |    LATERAL (SELECT unnest(range(0, d.out_w)) AS x) gx,
        |    LATERAL (SELECT unnest(range(0, d.out_h)) AS y) gy)
        |SELECT doc_id, out_w, out_h,
        |  CAST(sum((doc_id * 31 + 2 * x + 2 * y) % 256) AS DOUBLE)
        |    / (out_w * out_h) AS mean_lum
        |FROM px GROUP BY doc_id, out_w, out_h
        |ORDER BY doc_id""".stripMargin,

    // frames f ∈ {0, 3, 6} of 8, each a 16×16 image with pixel
    // (doc_id*31 + 7f + x + y) % 256; mean luminance per sampled frame
    "q114_png_frames" ->
      """WITH f AS (SELECT unnest([0, 3, 6]) AS frame_idx),
        |px AS (
        |  SELECT doc_id, frame_idx, gx.x, gy.y
        |  FROM documents, f,
        |    LATERAL (SELECT unnest(range(0, 16)) AS x) gx,
        |    LATERAL (SELECT unnest(range(0, 16)) AS y) gy)
        |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(sum((doc_id * 31 + 7 * frame_idx + x + y) % 256) AS DOUBLE)
        |    / 256 AS mean_lum
        |FROM px GROUP BY doc_id, frame_idx
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
