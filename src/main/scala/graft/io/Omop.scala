package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OMOP twin-table connector (`/root/reference/edsnlp/connectors/omop.py:
  * 10-196`): `note(note_id, note_text, note_datetime)` +
  * `note_nlp(note_nlp_id, note_id, start_char, end_char, lexical_variant,
  * note_nlp_source_value, ...attrs)` <-> one nested document row per note
  * (`entities: array<struct<...>>`).
  *
  * Scale notes: docs->tables is a pure explode (narrow). tables->docs
  * shuffles once on note_id; when note and note_nlp are co-bucketed on
  * note_id the join is shuffle-free. `collect_list` per note is bounded by
  * per-document entity counts, not corpus size.
  */
object Omop {

  /** note + note_nlp -> nested docs. Extra note_nlp columns beyond the
    * core five are carried into the entity struct. `boolAttributes`
    * mirrors the reference converter's bool coercion
    * (`converters.py:297-306` via test_converters.py:18-53): listed
    * attribute columns default to FALSE where absent/null, so an entity
    * that never carried the qualifier reads as unqualified rather than
    * null downstream.
    */
  def toDocs(
      note: DataFrame, noteNlp: DataFrame,
      boolAttributes: Seq[String] = Nil): DataFrame = {
    val coerced = boolAttributes.foldLeft(noteNlp)((df, a) =>
      if (df.columns.contains(a))
        df.withColumn(a, coalesce(col(a).cast("boolean"), lit(false)))
      else df.withColumn(a, lit(false)))
    val entityCols = coerced.columns.filter(_ != "note_id")
    val entities = coerced
      .groupBy(col("note_id"))
      .agg(sort_array(collect_list(
        struct(entityCols.map(col): _*))).as("entities"))
    note.join(entities, Seq("note_id"), "left")
      .withColumn("entities",
        coalesce(col("entities"), array().cast(
          entities.schema("entities").dataType)))
  }

  /** nested docs -> (note, note_nlp). */
  def fromDocs(docs: DataFrame): (DataFrame, DataFrame) = {
    val note = docs.drop("entities")
    val noteNlp = docs
      .select(col("note_id"), explode(col("entities")).as("e"))
      .select(col("note_id") +: docs
        .schema("entities").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.map(f => col(s"e.$f")): _*)
    (note, noteNlp)
  }

  /** Canonical annotated output: one note_nlp row per extracted entity
    * from a DocPipeline ents table, OMOP column names
    * (`converters.py:620-647`). `attrs` carries qualifier/attribute
    * columns (negation, ...) into note_nlp, as the reference doc2omop
    * does with span extensions.
    *
    * `deterministicIds = true` derives note_nlp_id from
    * `note_id * 100000 + start_char` — unique while notes stay under
    * 100k chars, stable across partitionings and engines (the default
    * `monotonically_increasing_id` is partition-dependent, fine for a
    * sink, useless for a reproducible comparison).
    */
  def entsToNoteNlp(
      ents: DataFrame, idCol: String, attrs: Seq[String] = Nil,
      deterministicIds: Boolean = false): DataFrame = {
    val id =
      if (deterministicIds)
        (col(idCol).cast("long") * lit(100000L) + col("begin"))
          .as("note_nlp_id")
      else monotonically_increasing_id().as("note_nlp_id")
    ents.select(Seq(
      id,
      col(idCol).as("note_id"),
      col("begin").as("start_char"),
      col("end").as("end_char"),
      col("lexical_variant"),
      col("label").as("note_nlp_source_value")) ++ attrs.map(col): _*)
  }
}
