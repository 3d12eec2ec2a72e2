package graft

import org.apache.spark.sql.functions._

/** Skew mitigation patterns for 100 TB: salting a hot join key, and
  * verifying AQE's automatic skew-join splitting is armed. Partial
  * aggregation already neutralizes skewed GROUP BYs (asserted too).
  */
class SkewSaltingSpec extends SparkTestBase {

  private val Salts = 8

  test("salted join of a skewed key matches the direct join") {
    import spark.implicits._
    // skewed left side: 90% of rows share key 0
    val left = spark.range(0, 20000)
      .select(when(col("id") % 10 =!= 0, col("id") % 100).otherwise(0L)
        .as("k"), col("id").as("v"))
    val right = spark.range(0, 100).select(col("id").as("k"),
      (col("id") * 7).as("w"))

    val direct = left.join(right, "k")
      .agg(count(lit(1)).as("cnt"), sum(col("v") + col("w")).as("s"))
      .head()

    // salting: explode the small side per salt, scatter the big side
    val saltedLeft = left.withColumn("salt",
      pmod(hash(col("v")), lit(Salts)))
    val saltedRight = right
      .withColumn("salt", explode(expr(s"sequence(0, ${Salts - 1})")))
    val salted = saltedLeft.join(saltedRight, Seq("k", "salt"))
      .agg(count(lit(1)).as("cnt"), sum(col("v") + col("w")).as("s"))
      .head()

    assert(salted === direct)

    // the salted join's key distribution is uniform: no partition holds
    // more than ~2x its fair share of the hot key's rows
    val perSalt = saltedLeft.filter(col("k") === 0)
      .groupBy("salt").count().collect().map(_.getLong(1))
    assert(perSalt.length === Salts)
    val fair = perSalt.sum.toDouble / Salts
    assert(perSalt.max < fair * 2, s"salting failed to spread: ${perSalt.toSeq}")
  }

  test("AQE skew join handling is enabled in the session") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
  }

  test("skewed group-by stays balanced via partial aggregation") {
    import spark.implicits._
    val skewed = spark.range(0, 100000, 1, 16)
      .select(when(col("id") % 100 =!= 0, col("id") % 7).otherwise(0L)
        .as("k"), col("id").as("v"))
    val agg = skewed.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
    val rows = agg.collect()
    assert(rows.map(_.getLong(2)).sum === 100000L)
    // partial aggregation present → each task pre-combines its hot keys
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") || plan.contains("partial"))
  }
}
