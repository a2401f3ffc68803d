package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from the per-area objects under
  * [[graft.queries]]; every entry with a DuckDB-expressible equivalent also
  * appears in [[oracleSql]] (same column names, same deterministic ORDER
  * BY — the driver hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship on sf0.001: the full reference pipeline — documents
    * chunked, embedded (deterministic local embedder), emitted as
    * idempotent vector records. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.PipelineQueries.embedPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Relational2.queries ++
      graft.queries.Relational3.queries ++
      graft.queries.Relational4.queries ++
      graft.queries.Relational5.queries ++
      graft.queries.Relational6.queries ++
      graft.queries.Relational7.queries ++
      graft.queries.Relational8.queries ++
      graft.queries.Relational9.queries ++
      graft.queries.Relational10.queries ++
      graft.queries.Relational11.queries ++
      graft.queries.Relational12.queries ++
      graft.queries.Relational13.queries ++
      graft.queries.Relational14.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Relational2.oracles ++
      graft.queries.Relational3.oracles ++
      graft.queries.Relational4.oracles ++
      graft.queries.Relational5.oracles ++
      graft.queries.Relational6.oracles ++
      graft.queries.Relational7.oracles ++
      graft.queries.Relational8.oracles ++
      graft.queries.Relational9.oracles ++
      graft.queries.Relational10.oracles ++
      graft.queries.Relational11.oracles ++
      graft.queries.Relational12.oracles ++
      graft.queries.Relational13.oracles ++
      graft.queries.Relational14.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.CurationQueries.oracles ++
      graft.queries.StreamingQueries.oracles
}
