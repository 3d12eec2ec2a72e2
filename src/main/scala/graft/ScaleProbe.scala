package graft

import org.apache.spark.sql.SparkSession

/** Scaling-evidence harness (dev-only, not part of the driver contract):
  * times the declared-heavy shapes at several corpus sizes and prints
  * per-(query, dir) JSON lines so scaling exponents can be read off.
  *
  * Usage: runMain graft.ScaleProbe <dir1> <dir2> ... — each dir needs
  * only the tables the probed queries read (documents, embeddings).
  * BASELINE.md records the exponents; the declared quadratic baselines
  * (q46 all-pairs cosine, q41/q73 DF-bounded shingle join) are EXPECTED
  * to run super-linear — the point is that nothing ELSE does.
  */
object ScaleProbe {

  private val Probed = Seq(
    "q40_dedup_exact", "q41_dedup_ngram_jaccard", "q46_cosine_pairs",
    "q112_cosine_pairs_blocked", "q128_semdedup_keeper",
    "q49_dedup_minhash_lsh", "q50_dedup_simhash", "q73_dedup_components",
    "q47_knn_brute", "q42_lang_id", "q45_fingerprint",
    // r9 TPC-H widening — multi-join fact chains must scale ~linearly
    "q119_tpch_q7", "q125_tpch_q18", "q127_tpch_q21",
    // r10 funnel + sketch surface — single-shuffle shapes, must be ~linear
    "q133_funnel_count", "q134_funnel_max_step",
    // r11 funnel widening — step durations + session-correlated variant
    "q143_funnel_step_durations", "q144_funnel_sessions",
    // r11 stored-sketch distinct — per-segment sketch merge, ~flat
    "q145_pinot_sketch_distinct",
    "q135_frequent_strings", "q136_theta_distinct",
    // r10 geo — grid equi-join + single-scan argmin, must be ~linear
    "q137_geofence_count", "q138_nearest_region",
    // r10 PQ — encode scan + broadcast-probe ADC, must be ~linear
    "q140_knn_pq",
    // r10 bitmap distinct + funnel trend — single-shuffle, ~linear
    "q141_bitmap_distinct", "q142_funnel_trend")

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf0.3", "/tmp/graft_sf1")
    // -Dgraft.probe.queries=q133,q134 narrows the probe (dev iteration)
    val only = Option(System.getProperty("graft.probe.queries"))
      .map(_.split(',').toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs; name <- Probed if only.forall(_.contains(name))) {
      val fn = SparkEntry.queries(name)
      try {
        fn(spark, dir).write.mode("overwrite").format("noop").save() // warm
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"""{"query":"$name","dir":"$dir","sec":$sec%.2f}""")
      } catch { case e: Throwable =>
        val msg = e.toString.linesIterator.next().take(120)
          .replace("\\", "\\\\").replace("\"", "\\\"")
        println(s"""{"query":"$name","dir":"$dir","error":"$msg"}""")
      }
    }
    spark.stop()
  }
}
