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
    * The SURVEY §7.2 minimum slice: documents -> tokenize/normalize ->
    * sentences -> phrase match -> qualifier -> one note_nlp-style row per
    * entity with a qualifier boolean (the reference README quick-start,
    * re-expressed as scan -> fused row-local annotate -> explode).
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = relational.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val pipe = pipes.DocPipeline(
      terms = Map("spark" -> Seq("spark"), "join" -> Seq("join")),
      qualifiers = Seq(nlp.QualifierPatterns(
        name = "negation", pseudo = Nil, preceding = Seq("slow"),
        following = Nil, precedingRegex = Nil, termination = Seq("the"))))
    pipe.entsTable(docs, "doc_id", "text").select(
      monotonically_increasing_id().as("note_nlp_id"),
      col("doc_id").as("note_id"),
      col("begin").as("start_char"),
      col("end").as("end_char"),
      col("lexical_variant"),
      col("label").as("note_nlp_source_value"),
      col("negation"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
