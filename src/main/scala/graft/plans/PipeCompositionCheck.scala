package graft.plans

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._

/** Miscomposed-pipeline error raised at ANALYSIS time, before any task
  * launches.
  */
class InvalidPipeCompositionException(msg: String)
    extends RuntimeException(msg)

/** Analysis-time pipe-composition validation — the Spark re-expression
  * of the reference's `Stream.validate_ops`
  * (`/root/reference/edsnlp/core/stream.py:1007-1076`), which rejects
  * invalid operator chains before the stream starts. The reference
  * validates sentinel/batching compatibility between ops; here the
  * composition surface is the staged column functions
  * ([[graft.functions.nlp]]), so the analog is validating the nested
  * ANNOTATION SCHEMAS flowing between them: every `graft_*` UDF in the
  * analyzed plan must receive arguments of the annotation shape it
  * declares. This catches the silently-wrong plans Spark's analyzer
  * admits — e.g. a qualifier fed raw tokens where sentence spans belong
  * (both are structs with `begin`/`end`, so the row decoder would run
  * and quietly mis-scope every cue) — and fails them at analysis, not
  * three hours into a 100-TB job.
  *
  * Registered via `GraftExtensions` (`injectCheckRule`); a no-op on
  * plans containing no graft pipe UDFs.
  */
object PipeCompositionCheck extends (LogicalPlan => Unit) {

  private val tokenType: DataType = ArrayType(StructType(Seq(
    StructField("begin", IntegerType), StructField("end", IntegerType),
    StructField("text", StringType), StructField("norm", StringType),
    StructField("excluded", BooleanType))))
  private val sentType: DataType = ArrayType(StructType(Seq(
    StructField("begin", IntegerType), StructField("end", IntegerType))))
  private val entType: DataType = ArrayType(StructType(Seq(
    StructField("begin", IntegerType), StructField("end", IntegerType),
    StructField("label", StringType), StructField("text", StringType),
    StructField("attrs", MapType(StringType, StringType)))))

  private case class Arg(what: String, tpe: DataType, hint: String)
  private val text = Arg("the document text (string)", StringType,
    "pass the raw text column")
  private val tokens = Arg("tokens (array<struct<begin,end,text,norm," +
    "excluded>>)", tokenType, "produce them with nlp.tokenize(text)")
  private val sents = Arg("sentence spans (array<struct<begin,end>>)",
    sentType,
    "produce them with nlp.sentencize(tokens) BEFORE the qualifier")
  private val ents = Arg("entities (array<struct<begin,end,label,text," +
    "attrs>>)", entType,
    "produce them with a matcher (nlp.phraseMatch / nlp.regexMatch)")

  private val contracts: Map[String, Seq[Arg]] = Map(
    "graft_tokenize" -> Seq(text),
    "graft_normalize" -> Seq(text, tokens),
    "graft_sentencize" -> Seq(tokens),
    "graft_phrase_match" -> Seq(text, tokens),
    "graft_regex_match" -> Seq(text, tokens),
    "graft_qualify" -> Seq(text, tokens, sents, ents),
    "graft_filter_spans" -> Seq(ents))

  /** Structural comparison: nullability never carries semantics here,
    * and field case follows the session's resolver, so both normalize
    * away.
    */
  private def shape(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name.toLowerCase(java.util.Locale.ROOT),
        shape(f.dataType))))
    case a: ArrayType => ArrayType(shape(a.elementType))
    case m: MapType => MapType(shape(m.keyType), shape(m.valueType))
    case other => other
  }

  override def apply(plan: LogicalPlan): Unit = plan.foreach { node =>
    node.expressions.foreach(_.foreach {
      case u: ScalaUDF if u.udfName.exists(contracts.contains) =>
        val name = u.udfName.get
        val expected = contracts(name)
        if (u.children.size == expected.size) {
          u.children.zip(expected).zipWithIndex.foreach {
            case ((child, arg), i) =>
              if (child.resolved && shape(child.dataType) != shape(arg.tpe))
                throw new InvalidPipeCompositionException(
                  s"invalid pipe composition: $name argument ${i + 1} " +
                    s"expects ${arg.what} but received " +
                    s"${child.dataType.simpleString} — ${arg.hint}")
          }
        }
      case _ =>
    })
  }
}
