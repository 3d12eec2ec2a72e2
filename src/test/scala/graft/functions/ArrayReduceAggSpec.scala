package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ArrayReduceAggSpec extends SparkTestBase {

  import ArrayLongReduceAgg.{arrayMinAgg, arraySumAgg}

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(5L, 1L, 9L)),
      (1L, Array(3L, 7L, 2L)),
      (2L, Array(10L, 10L, 10L))).toDF("k", "v")
  }

  test("element-wise min per group") {
    val got = df.groupBy("k").agg(arrayMinAgg(col("v")).as("m"))
      .orderBy("k").collect()
      .map(r => r.getSeq[Long](1).toList)
    assert(got.toList === List(List(3L, 1L, 2L), List(10L, 10L, 10L)))
  }

  test("element-wise sum per group") {
    val got = df.groupBy("k").agg(arraySumAgg(col("v")).as("s"))
      .orderBy("k").collect()
      .map(r => r.getSeq[Long](1).toList)
    assert(got.toList === List(List(8L, 8L, 11L), List(10L, 10L, 10L)))
  }

  test("partial aggregation across many partitions is correct") {
    import spark.implicits._
    val big = spark.range(0, 10000, 1, 16)
      .select(lit(1L).as("k"), expr(
        "transform(sequence(0, 7), i -> id * 8 + i)").as("v"))
    val mins = big.groupBy("k").agg(arrayMinAgg(col("v"))).head()
      .getSeq[Long](1)
    assert(mins.toList === (0L to 7L).toList)
    val sums = big.groupBy("k").agg(arraySumAgg(col("v"))).head()
      .getSeq[Long](1)
    // sum over id of (id*8 + i) = 8 * sum(id) + n * i
    val base = 8L * (0L until 10000L).sum
    assert(sums.toList === (0 to 7).map(i => base + 10000L * i).toList)
  }

  test("null inputs are ignored; empty group yields null") {
    import spark.implicits._
    val d = Seq((1L, Some(Array(1L, 2L))), (1L, None), (2L, None))
      .toDF("k", "v")
    val rows = d.groupBy("k").agg(arrayMinAgg(col("v")).as("m"))
      .orderBy("k").collect()
    assert(rows(0).getSeq[Long](1).toList === List(1L, 2L))
    assert(rows(1).isNullAt(1))
  }

  test("zero-length arrays are legal values, not uninitialized sentinels") {
    import spark.implicits._
    // aggregating genuinely empty arrays yields an empty array, not null
    val d = Seq((1L, Array.empty[Long]), (1L, Array.empty[Long])).toDF("k", "v")
    val r = d.groupBy("k").agg(arraySumAgg(col("v")).as("s")).head()
    assert(!r.isNullAt(1))
    assert(r.getSeq[Long](1).isEmpty)
    // a 0-length vs n-length mix is ragged and must fail, not pass silently
    val ragged = Seq((1L, Array.empty[Long]), (1L, Array(1L))).toDF("k", "v")
    val e = intercept[Exception] {
      ragged.groupBy("k").agg(arraySumAgg(col("v"))).collect()
    }
    assert(e.getMessage.contains("ragged") ||
      Option(e.getCause).exists(_.getMessage.contains("ragged")))
  }
}
