package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.nlp.{Ent, Sent, Token}
import graft.pipes.DocPipeline

/** The typed document view (SURVEY §1.1: `Dataset[ClinicalDoc]` with
  * case-class encoders where type safety helps; plain `DataFrame` where
  * schema is dynamic). One row = one annotated document: identity, text,
  * optional timestamp, and the three annotation layers.
  */
case class ClinicalDoc(
    note_id: String,
    note_text: String,
    note_datetime: Option[java.sql.Timestamp],
    tokens: Seq[Token],
    sents: Seq[Sent],
    entities: Seq[Ent])

object ClinicalDoc {

  /** Annotate an (id, text[, datetime]) DataFrame into the typed view.
    * Narrow map — the fused pipeline runs once per row.
    */
  def annotate(
      df: DataFrame,
      pipeline: DocPipeline,
      idCol: String = "note_id",
      textCol: String = "note_text",
      datetimeCol: Option[String] = None): Dataset[ClinicalDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(
      col(idCol).cast("string").as("note_id"),
      col(textCol).as("note_text"),
      datetimeCol.map(c => col(c).cast("timestamp"))
        .getOrElse(lit(null).cast("timestamp")).as("note_datetime"))
      .as[(String, String, Option[java.sql.Timestamp])]
    base.map { case (id, text, dt) =>
      val anns = pipeline.annotate(text)
      ClinicalDoc(id, text, dt, anns.tokens, anns.sents, anns.ents)
    }
  }

  /** Typed -> OMOP note_nlp rows (entity table). */
  def toNoteNlp(docs: Dataset[ClinicalDoc]): DataFrame =
    docs.toDF()
      .select(col("note_id"), explode(col("entities")).as("e"))
      .select(
        monotonically_increasing_id().as("note_nlp_id"),
        col("note_id"),
        col("e.begin").as("start_char"),
        col("e.end").as("end_char"),
        col("e.text").as("lexical_variant"),
        col("e.label").as("note_nlp_source_value"),
        col("e.attrs").as("attrs"))
}
