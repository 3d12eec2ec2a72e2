package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LongDotProductSpec extends SparkTestBase {

  import GraftFunctions.dotq

  test("dotq matches the higher-order-function formulation") {
    val df = spark.range(100).toDF("id")
      .withColumn("a", expr("transform(sequence(0, 63), i -> i * id + 1)"))
      .withColumn("b", expr("transform(sequence(0, 63), i -> i - id)"))
      .withColumn("fast", dotq(col("a"), col("b")))
      .withColumn("slow", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
    assert(df.filter(col("fast") =!= col("slow")).count() === 0)
  }

  test("dotq participates in whole-stage codegen") {
    val df = spark.range(10).toDF("id")
      .withColumn("a", expr("transform(sequence(0, 7), i -> i + id)"))
      .withColumn("d", dotq(col("a"), col("a")))
    val hasCodegen = df.queryExecution.executedPlan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(hasCodegen.nonEmpty, "expected WholeStageCodegen around dotq")
    // and the result is correct through the codegen path
    val row = df.filter(col("id") === 2).select("d").head()
    assert(row.getLong(0) === (2L to 9L).map(x => x * x).sum)
  }

  test("dotq property: equals scala dot product on random vectors") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val a = List.fill(16)(rnd.nextLong(2000001L) - 1000000L)
      val b = List.fill(16)(rnd.nextLong(2000001L) - 1000000L)
      val df = spark.sql(
        s"SELECT ${a.mkString("array(", "L,", "L)")} AS a, " +
          s"${b.mkString("array(", "L,", "L)")} AS b")
        .select(dotq(col("a"), col("b")).as("d"))
      assert(df.head().getLong(0) === a.zip(b).map { case (x, y) => x * y }.sum)
    }
  }

  test("dotq is null-safe at the column level") {
    val df = spark.sql("SELECT CAST(NULL AS ARRAY<BIGINT>) AS a, array(1L) AS b")
      .select(dotq(col("a"), col("b")).as("d"))
    assert(df.head().isNullAt(0))
  }

  test("dot_d matches the aggregate(zip_with(...)) fold bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(50)((Array.fill(64)(rnd.nextDouble() - 0.5),
      Array.fill(64)(rnd.nextDouble() - 0.5))).toDF("a", "b")
    val rows = df.select(
      DoubleDotProduct.dotd(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v)")
        .as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }
}
