package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst `Generator` for 1→N document splitting — the plan-level form of
  * `eds.split` (`/root/reference/edsnlp/pipes/misc/split/split.py:92-227`),
  * replacing the flatMap shape with a true generator the analyzer wraps in
  * a `Generate` node (like `explode`/`posexplode`): each input document
  * yields one row per fragment between regex boundaries, with exact char
  * offsets into the source text so downstream span remapping is plain
  * arithmetic.
  *
  * Usable from SQL once registered (`GraftExtensions`):
  * `SELECT doc_id, s.* FROM docs LATERAL VIEW graft_split_text(text, delim) s`
  * or `df.select($"doc_id", splitText($"text", lit(" the ")))`.
  */
case class SplitTextGenerator(text: Expression, delim: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, delim)

  override def elementSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("begin", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false),
    StructField("fragment", StringType, nullable = false)))

  // per-row regex compilation would dominate the generator's cost; the
  // delim is foldable in practice, so memoize on its string value.
  @transient private var cachedDelim: String = _
  @transient private var cachedPattern: java.util.regex.Pattern = _

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    val d = delim.eval(input)
    if (t == null || d == null) return Nil
    val s = t.asInstanceOf[UTF8String].toString
    val ds = d.asInstanceOf[UTF8String].toString
    if (cachedPattern == null || cachedDelim != ds) {
      cachedDelim = ds
      cachedPattern = java.util.regex.Pattern.compile(ds)
    }
    val pattern = cachedPattern
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val m = pattern.matcher(s)
    var start = 0
    var idx = 0
    def emit(b: Int, e: Int): Unit = {
      out += new GenericInternalRow(Array[Any](
        idx, b, e, UTF8String.fromString(s.substring(b, e))))
      idx += 1
    }
    while (m.find()) {
      emit(start, m.start())
      start = m.end()
    }
    emit(start, s.length)
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SplitTextGenerator =
    copy(text = newChildren(0), delim = newChildren(1))
}

object SplitTextGenerator {
  /** Column API: generates (idx, begin, end, fragment) rows per input. */
  def splitText(text: Column, delim: Column): Column =
    Bridge.column(SplitTextGenerator(
      Bridge.expression(text), Bridge.expression(delim)))
}
