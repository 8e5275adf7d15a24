package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's declared operator surface; each key
  * has a DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (driver then records a weaker rows-only check).
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
      Map[String, String])] = Seq(
    (relational.RelationalQueries.queries, relational.RelationalQueries.oracleSql),
    (relational.DocQueries.queries, relational.DocQueries.oracleSql),
    (relational.PipelineQueries.queries, relational.PipelineQueries.oracleSql),
    (relational.ExtractionQueries.queries, relational.ExtractionQueries.oracleSql)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The SURVEY §7.2 minimum slice: OMOP note table -> tokenize/
    * normalize -> sentences -> phrase match -> negation qualifier ->
    * one note_nlp row per entity (the reference README quick-start).
    * Same code path as the hash-matched q65 — the smoke check and the
    * oracle exercise ONE pipeline.
    */
  def entry(spark: SparkSession): DataFrame =
    relational.DocQueries.queries("q65_omop_note_nlp")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
