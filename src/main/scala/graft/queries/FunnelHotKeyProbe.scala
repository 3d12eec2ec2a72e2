package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key evidence harness for the funnel engine (dev-only, like
  * ScaleProbe): the funnel's single `user_id` exchange is the right plan
  * until ONE key is pathological — a bot replaying millions of
  * step-typed events lands them all in one window task. This probe
  * measures that regime and the `collapseDuplicates` mitigation:
  *
  *  - `uniform`: 2M step-typed events spread over 20k users;
  *  - `hot`: the same 1M uniform tail plus 1M events owned by ONE bot
  *    user whose (event_type, ts) pairs repeat ~67× (15k distinct
  *    combos — the replayed-ingest / retry-storm shape);
  *  - each corpus runs the plain engine and the collapsed engine
  *    (exact pre-aggregation on (user, type, ts); see
  *    [[Funnel.perKeyStepTimes]]).
  *
  * Expected reading (recorded in BASELINE.md): plain-hot ≫ plain-uniform
  * (one straggler window task), collapsed-hot ≈ collapsed-uniform (the
  * bot's duplicates die in the map-side partial aggregate). A bot with
  * millions of DISTINCT timestamps is the residual semantic bound —
  * the funnel genuinely orders that key's distinct times.
  *
  * Usage: runMain graft.queries.FunnelHotKeyProbe [botEvents]
  * (default 1,000,000; the uniform tail always carries 1M more)
  */
object FunnelHotKeyProbe {

  private val types = array(lit("signup"), lit("view"), lit("purchase"))

  /** n uniform events over `users` users, ts spread over ~30 days. */
  private def uniformEvents(s: SparkSession, n: Long, users: Int): DataFrame =
    s.range(0, n, 1, 32).select(
      (col("id") % users).as("user_id"),
      timestamp_millis(lit(1704067200000L) +
        (col("id") * 7919) % (30L * 86400 * 1000)).as("ts"),
      element_at(types, ((col("id") / users) % 3 + 1).cast("int"))
        .as("event_type"))

  /** n bot events for ONE user: (type, ts) drawn from `distinctTs`
    * distinct timestamps × 3 types, so each combo repeats n/(3·distinctTs)
    * times — the replay/retry-storm shape.
    */
  private def botEvents(s: SparkSession, n: Long, distinctTs: Int): DataFrame =
    s.range(0, n, 1, 32).select(
      lit(999999L).as("user_id"),
      timestamp_millis(lit(1704067200000L) +
        (col("id") % distinctTs) * 61000L).as("ts"),
      element_at(types, ((col("id") / distinctTs) % 3 + 1).cast("int"))
        .as("event_type"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val botN = args.headOption.map(_.toLong).getOrElse(1000000L)
    val uniform = uniformEvents(spark, 1000000L + botN, 20000)
    val hot = uniformEvents(spark, 1000000L, 20000)
      .union(botEvents(spark, botN, 5000))

    def run(df: DataFrame, collapse: Boolean): Double = {
      def once(): Unit = Funnel.perUserStepTimes(df,
          collapseDuplicates = collapse)
        .write.mode("overwrite").format("noop").save()
      once() // warm
      val t0 = System.nanoTime()
      once()
      (System.nanoTime() - t0) / 1e9
    }

    for ((corpus, df) <- Seq("uniform" -> uniform, "hot" -> hot);
         collapse <- Seq(false, true)) {
      val sec = run(df, collapse)
      println(f"""{"corpus":"$corpus","collapse":$collapse,"sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
