package graft.functions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions.udf

import graft.nlp._

/** Column-level NLP functions. Each op is a narrow, row-local transformation
  * over nested annotation columns (SURVEY.md §2.5): no shuffle, fully
  * data-parallel, safe at any scale. Matcher/qualifier objects are built once
  * on the driver and shipped in the task closure (broadcast-equivalent);
  * regex/trie compilation happens once per executor, not per row.
  *
  * UDF note: Spark hands struct-array arguments to Scala UDFs as `Seq[Row]`;
  * converters below rebuild the case classes. Hot paths can later be
  * promoted to native Catalyst expressions operating on ArrayData directly —
  * same semantics, zero conversion.
  */
object nlp {

  private def rowToToken(r: Row): Token = Token(
    r.getAs[Int]("begin"), r.getAs[Int]("end"),
    r.getAs[String]("text"), r.getAs[String]("norm"),
    r.getAs[Boolean]("excluded"))

  private def rowToSent(r: Row): Sent =
    Sent(r.getAs[Int]("begin"), r.getAs[Int]("end"))

  private def rowToEnt(r: Row): Ent = Ent(
    r.getAs[Int]("begin"), r.getAs[Int]("end"),
    r.getAs[String]("label"), r.getAs[String]("text"),
    Option(r.getAs[Map[String, String]]("attrs")).getOrElse(Map.empty))

  /** text -> array<Token> (clinical tokenizer, SURVEY §2.1/§7.1 step 2). */
  def tokenize(text: Column): Column =
    udf((s: String) => Tokenizer.tokenize(s).toSeq)
      .withName("graft_tokenize").apply(text)

  /** Rewrite norms + tag pollution exclusions. */
  def normalize(text: Column, tokens: Column): Column =
    normalize(text, tokens, Normalizer.Options())

  def normalize(
      text: Column, tokens: Column, opts: Normalizer.Options): Column =
    udf((s: String, ts: Seq[Row]) =>
      Normalizer.normalize(s, ts.map(rowToToken).toArray, opts).toSeq)
      .withName("graft_normalize").apply(text, tokens)

  /** tokens -> array<Sent> sentence spans. */
  def sentencize(tokens: Column): Column =
    udf((ts: Seq[Row]) =>
      Sentencizer.sentences(ts.map(rowToToken).toArray).toSeq)
      .withName("graft_sentencize").apply(tokens)

  /** Terminology phrase matching -> array<Ent>. */
  def phraseMatch(
      terms: Map[String, Seq[String]])(text: Column, tokens: Column)
      : Column = {
    val matcher = PhraseMatcher.build(terms)
    udf((s: String, ts: Seq[Row]) =>
      SpanAlgebra
        .filterSpans(matcher.findMatches(ts.map(rowToToken).toArray, s))
        .toSeq)
      .withName("graft_phrase_match").apply(text, tokens)
  }

  /** Named-regex matching (raw text or clean-text realigned). */
  def regexMatch(
      patterns: Map[String, Seq[String]], attrNorm: Boolean = false)(
      text: Column, tokens: Column): Column = {
    val matcher = RegexMatcher.build(patterns, attrNorm)
    udf((s: String, ts: Seq[Row]) =>
      SpanAlgebra
        .filterSpans(matcher.findMatches(ts.map(rowToToken).toArray, s))
        .toSeq)
      .withName("graft_regex_match").apply(text, tokens)
  }

  /** Rule-based qualifier; writes `patterns.name -> true/false` into each
    * entity's attrs (negation / family / hypothesis / reported_speech /
    * history).
    */
  def qualify(patterns: QualifierPatterns)(
      text: Column, tokens: Column, sents: Column, ents: Column): Column = {
    val q = new RuleQualifier(patterns)
    udf((s: String, ts: Seq[Row], ss: Seq[Row], es: Seq[Row]) =>
      q.apply(s, ts.map(rowToToken).toArray, ss.map(rowToSent).toArray,
        es.map(rowToEnt)).toSeq)
      .withName("graft_qualify").apply(text, tokens, sents, ents)
  }

  /** Greedy longest-leftmost overlap resolution over a span column. */
  def filterSpans(ents: Column): Column =
    udf((es: Seq[Row]) => SpanAlgebra.filterSpans(es.map(rowToEnt)).toSeq)
      .withName("graft_filter_spans").apply(ents)
}
