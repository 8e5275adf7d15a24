package graft.pipes

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.nlp._

/** Full annotations for one document — the fused pipeline output.
  * `dates` is the `doc.spans["dates"]` analog: its own layer, never
  * merged into `ents` (the reference keeps date spans in a span group).
  */
case class Annotations(
    tokens: Seq[Token], sents: Seq[Sent], ents: Seq[Ent],
    dates: Seq[Ent] = Nil)

/** Options for the optional `eds.dates` stage of a [[DocPipeline]].
  * `faithful = true` switches to the exact reference grammar (bare
  * letter months accepted, `no_day_no_year` forms — see [[Dates]]); the
  * default keeps the engine's precision-first grammar. The reference
  * exposes this as pipe config, so the config layer must reach it.
  */
case class DatesOptions(faithful: Boolean = false)

/** The `map_pipeline` analog (`/root/reference/edsnlp/core/stream.py:
  * 675-763`): a configured chain tokenize -> normalize -> sentences ->
  * phrase/regex match -> filter_spans -> qualifiers, spliced into the
  * logical plan.
  *
  * Unlike the reference (one Python op per pipe with per-op batching), the
  * whole chain is FUSED into a single row-local function: one UDF call per
  * document, annotations never round-trip through Spark's serializers
  * between stages. This is the stage-fusion Catalyst can't do for opaque
  * functions, done by construction. Downstream ops (explode to an entity
  * table, joins against terminologies) stay declarative.
  */
case class DocPipeline(
    terms: Map[String, Seq[String]] = Map.empty,
    regexPatterns: Map[String, Seq[String]] = Map.empty,
    qualifiers: Seq[QualifierPatterns] = Seq.empty,
    normOpts: Normalizer.Options = Normalizer.Options(),
    dates: Option[DatesOptions] = None) extends Serializable {

  @transient private lazy val phraseMatcher =
    if (terms.nonEmpty) Some(PhraseMatcher.build(terms, normOpts = normOpts))
    else None
  @transient private lazy val regexMatcher =
    if (regexPatterns.nonEmpty) Some(RegexMatcher.build(regexPatterns))
    else None
  @transient private lazy val ruleQualifiers =
    qualifiers.map(new RuleQualifier(_))

  /** Pure per-document run — also the single-doc `nlp(text)` entry point
    * (`/root/reference/edsnlp/core/pipeline.py:373-400`).
    */
  def annotate(text: String): Annotations = {
    val tokens = Normalizer.normalize(text, Tokenizer.tokenize(text), normOpts)
    val sents = Sentencizer.sentences(tokens)
    val rawEnts =
      phraseMatcher.map(_.findMatches(tokens, text)).getOrElse(Nil) ++
        regexMatcher.map(_.findMatches(tokens, text)).getOrElse(Nil)
    var ents = SpanAlgebra.filterSpans(rawEnts)
    ruleQualifiers.foreach { q => ents = q.apply(text, tokens, sents, ents) }
    val dateSpans = dates match {
      case Some(o) => Dates.extract(text, None, faithful = o.faithful)
      case None => Nil
    }
    Annotations(tokens.toSeq, sents.toSeq, ents, dateSpans)
  }

  /** Add an `anno` struct column (tokens/sents/ents) to `df`. */
  def annotateCol(text: Column): Column = {
    val self = this
    udf((s: String) => self.annotate(s)).apply(text)
  }

  /** Entities-only column: same fused run, but the UDF RETURNS only the
    * entity layer — encoding the full token layer (~150 structs/doc)
    * through the UDF serializer just for a downstream explode("ents") to
    * discard it was the dominant cost of the ents path, not the NLP
    * itself.
    */
  def entsCol(text: Column): Column = {
    val self = this
    udf((s: String) => self.annotate(s).ents).apply(text)
  }

  /** One row per entity: the "ents" converter
    * (`/root/reference/edsnlp/data/converters.py:651-711`) — relational
    * UNNEST of the annotation layer, with qualifier attrs as typed columns.
    */
  def entsTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val attrCols = qualifiers.map(q =>
      coalesce(element_at(col("ent.attrs"), q.name), lit("false"))
        .cast("boolean").as(q.name))
    df.withColumn("ent", explode(entsCol(col(textCol))))
      .select(
        Seq(col(idCol), col("ent.begin").as("begin"),
          col("ent.end").as("end"), col("ent.label").as("label"),
          col("ent.text").as("lexical_variant")) ++ attrCols: _*)
  }
}
