package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared query surface from the per-area modules in
  * `graft.queries`. Every key in [[queries]] that is SQL-expressible has a
  * DuckDB oracle in [[oracleSql]] with identical column aliases.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q12_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Joins.queries ++
      graft.queries.Joins.extraQueries ++
      graft.queries.Windows.queries ++
      graft.queries.SetOps.queries ++
      graft.queries.Scalar.queries ++
      graft.queries.TextOps.queries ++
      graft.queries.CurationOps.queries ++
      graft.queries.Embeddings.queries ++
      graft.queries.SketchDedup.queries ++
      graft.queries.Events.queries ++
      graft.queries.Funnel.queries ++
      graft.queries.Sketches.queries ++
      graft.queries.Geo.queries ++
      graft.queries.Media.queries ++
      graft.queries.Complex.queries ++
      graft.queries.Advanced.queries ++
      graft.queries.PinotRoundtrip.queries ++
      graft.queries.TpchExtra.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.Joins.oracleSql ++
      graft.queries.Joins.extraOracleSql ++
      graft.queries.Windows.oracleSql ++
      graft.queries.SetOps.oracleSql ++
      graft.queries.Scalar.oracleSql ++
      graft.queries.TextOps.oracleSql ++
      graft.queries.CurationOps.oracleSql ++
      graft.queries.Embeddings.oracleSql ++
      graft.queries.SketchDedup.oracleSql ++
      graft.queries.Events.oracleSql ++
      graft.queries.Funnel.oracleSql ++
      graft.queries.Sketches.oracleSql ++
      graft.queries.Geo.oracleSql ++
      graft.queries.Media.oracleSql ++
      graft.queries.Complex.oracleSql ++
      graft.queries.Advanced.oracleSql ++
      graft.queries.PinotRoundtrip.oracleSql ++
      graft.queries.TpchExtra.oracleSql
}
