package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: Jaccard similarity of two DISTINCT
  * `array<bigint>` columns (shingle-hash sets), with whole-stage codegen.
  *
  * This is the hot loop of near-dup verification (millions of candidate
  * pairs x hundreds of elements). `array_intersect`+`array_union`
  * materialize two intermediate arrays per row and hash elements twice;
  * this expression computes |A∩B| in one hash-set pass and derives
  * |A∪B| = |A| + |B| - |A∩B| — no allocations beyond one reused set, and
  * `doGenCode` keeps it inside the WholeStageCodegen span (the engine's
  * answer to the reference's Cython `nogil` hot loops, SURVEY §4.8).
  *
  * Precondition: inputs are element-distinct (as produced by
  * `array_distinct`); duplicates would skew the union size.
  */
case class JaccardDistinctLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"requires (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  @inline private def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val set = new java.util.HashSet[java.lang.Long](na * 2)
    var i = 0
    while (i < na) { set.add(a.getLong(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nb) { if (set.contains(b.getLong(i))) inter += 1; i += 1 }
    inter.toDouble / (na + nb - inter).toDouble
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val inter = ctx.freshName("inter")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |if ($na == 0 && $nb == 0) {
         |  ${ev.value} = 0.0;
         |} else {
         |  java.util.HashSet<Long> $set = new java.util.HashSet<Long>($na * 2);
         |  for (int $i = 0; $i < $na; $i++) { $set.add($a.getLong($i)); }
         |  int $inter = 0;
         |  for (int $i = 0; $i < $nb; $i++) {
         |    if ($set.contains($b.getLong($i))) $inter++;
         |  }
         |  ${ev.value} = (double) $inter / (double) ($na + $nb - $inter);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardDistinctLongs =
    copy(left = newLeft, right = newRight)
}

object JaccardDistinctLongs {
  /** Column API: jaccard of two distinct array<bigint> columns. */
  def jaccard64(a: Column, b: Column): Column =
    Bridge.column(JaccardDistinctLongs(
      Bridge.expression(a), Bridge.expression(b)))
}
