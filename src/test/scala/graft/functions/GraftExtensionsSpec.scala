package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL-registry registration of the native expressions (B22 surface). */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // Force a NEW session (sharing any existing SparkContext) so the
    // extensions actually apply — getOrCreate would return the shared
    // test session and silently skip them. Never stop() here: the
    // underlying context belongs to the whole suite run.
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    // restore the shared session as default for subsequent suites
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
  }

  test("dot_q callable from SQL") {
    val r = spark.sql(
      "SELECT dot_q(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
    assert(r.getLong(0) === 4 + 10 + 18)
  }

  test("array_min_agg / array_sum_agg callable from SQL") {
    spark.sql(
      """SELECT * FROM VALUES (1, array(5L, 1L)), (1, array(3L, 7L))
        |AS t(k, v)""".stripMargin).createOrReplaceTempView("vecs")
    val m = spark.sql(
      "SELECT array_min_agg(v) AS m FROM vecs GROUP BY k").head()
    assert(m.getSeq[Long](0).toList === List(3L, 1L))
    val s = spark.sql(
      "SELECT array_sum_agg(v) AS s FROM vecs GROUP BY k").head()
    assert(s.getSeq[Long](0).toList === List(8L, 8L))
  }

  test("tokenize UDTF callable via SQL LATERAL VIEW") {
    spark.sql("SELECT 'ab cd!7x' AS s").createOrReplaceTempView("txt")
    val rows = spark.sql(
      """SELECT t.pos, t.token FROM txt
        |LATERAL VIEW tokenize(s) t AS pos, token""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows === Seq((0, "ab"), (1, "cd"), (2, "!"), (3, "7"), (4, "x")))
  }

  test("dot_d callable via SQL") {
    val r = spark.sql(
      "SELECT dot_d(array(1.5D, 2.0D), array(2.0D, 0.5D)) AS d").head()
    assert(r.getDouble(0) === 4.0)
  }

  test("shingles UDTF callable via SQL LATERAL VIEW, distinct 3-grams") {
    spark.sql("SELECT 'a b c d a b c d e' AS s").createOrReplaceTempView("sh")
    val rows = spark.sql(
      """SELECT t.shingle FROM sh
        |LATERAL VIEW shingles(s) t AS shingle""".stripMargin)
      .collect().map(_.getString(0)).toSeq
    assert(rows === Seq("a b c", "b c d", "c d a", "d a b", "c d e"))
  }

  test("dot_q type errors are analysis-time failures") {
    val e = intercept[Exception](
      spark.sql("SELECT dot_q(array('a'), array('b'))").collect())
    assert(e.getMessage.contains("dot_q") ||
      e.getMessage.toLowerCase.contains("array<bigint>"))
  }

  test("freq_items callable via SQL with grouping") {
    spark.range(0, 100)
      .selectExpr("id % 2 AS g", "CAST(id % 5 AS STRING) AS s")
      .createOrReplaceTempView("fi")
    val rows = spark.sql(
      """SELECT g, freq_items(s, 16) AS sk FROM fi GROUP BY g ORDER BY g""")
      .collect()
    assert(rows.length === 2)
    // 5 distinct values, 10 occurrences each per group — exact regime
    rows.foreach { r =>
      val entries = r.getSeq[org.apache.spark.sql.Row](1)
      assert(entries.length === 5)
      assert(entries.forall(_.getLong(1) === 10L))
    }
  }

  test("sketch_build('freq<c>') + freq_merge_items compose via SQL") {
    spark.range(0, 300)
      .selectExpr("id % 3 AS part", "CAST(id % 7 AS STRING) AS s")
      .createOrReplaceTempView("fm")
    // per-part payloads built query-time, merged back — exact regime
    val rows = spark.sql(
      """SELECT freq_merge_items(sk, 16) AS top FROM
        |  (SELECT sketch_build(s, 'freq16') AS sk FROM fm GROUP BY part)
        |""".stripMargin).collect()
    val entries = rows.head.getSeq[org.apache.spark.sql.Row](0)
    assert(entries.length === 7)
    // 300 rows over 7 values: counts 43/43 then 42s-43s; sum is 300
    assert(entries.map(_.getLong(1)).sum === 300L)
    assert(entries.forall(e => e.getLong(1) >= 42L && e.getLong(1) <= 43L))
  }

  test("bitmap_distinct callable via SQL") {
    val n = spark.sql(
      "SELECT bitmap_distinct(id % 97) AS n FROM range(0, 10000)")
      .head().getLong(0)
    assert(n === 97L)
  }

  test("kmv_sketch callable via SQL; k must be a literal") {
    val n = spark.sql(
      """SELECT size(kmv_sketch(xxhash64(id), 64)) AS n
        |FROM range(0, 40)""".stripMargin).head().getInt(0)
    assert(n === 40)
    val e = intercept[Exception](
      spark.sql("SELECT kmv_sketch(xxhash64(id), id + 1) FROM range(5)")
        .collect())
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
