package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expressions for the two hottest text-hash projections
  * of the dedup pipeline — the portable simhash fingerprint (q33) and the
  * fused MinHash signature (q32). Both were Scala UDFs; as expressions
  * their per-row work stays identical (one fused pass, thread-local MD5,
  * zero intermediate arrays) but the call site now lives INSIDE the
  * WholeStageCodegen span: no UDF closure invocation, no extra null
  * boxing, and the projection fuses with the surrounding scan/filter
  * stage like any built-in function.
  *
  * Null semantics are the standard expression contract (null in -> null
  * out); the Column wrappers in [[graft.dedup.SimHash.simhashPortable]] /
  * [[graft.dedup.Dedup.minHashSignatureFromText]] coalesce to the legacy
  * UDF outputs (0L / all-MaxValue signature) so downstream plans and
  * oracles are unchanged.
  */
object TextHashExpressions {
  private def requireString(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires a string column, got ${other.simpleString}")
    }

  /** 60-bit portable simhash of the word n-gram shingle set (MD5 shingle
    * hashes — bit-identical to the SQL
    * `conv(substring(md5(shingle), 1, 15), 16, 10)` oracle).
    */
  case class SimHashFingerprint(child: Expression, n: Int, nbits: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireString(child, "graft_simhash")

    override protected def nullSafeEval(input: Any): Any =
      graft.dedup.SimHash.portableFingerprint(input.toString, n, nbits)

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.dedup.SimHash.portableFingerprint($c.toString(), $n, $nbits)")

    override protected def withNewChildInternal(
        newChild: Expression): SimHashFingerprint = copy(child = newChild)
  }

  /** Fused text -> k-minima MinHash signature (FNV word hashes, n-gram
    * shingle mix, (a*h+b) mod P universal-hash minima in one pass).
    */
  case class MinHashSignatureFromText(child: Expression, n: Int, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireString(child, "graft_minhash_sig")

    override protected def nullSafeEval(input: Any): Any =
      new GenericArrayData(
        graft.dedup.Dedup.minhashSigArray(input.toString, n, k))

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.dedup.Dedup.minhashSigArray($c.toString(), $n, $k))")

    override protected def withNewChildInternal(
        newChild: Expression): MinHashSignatureFromText = copy(child = newChild)
  }

  /** Column API used by the dedup module's wrappers. */
  def simhashFingerprint(text: Column, n: Int, nbits: Int): Column =
    Bridge.column(SimHashFingerprint(Bridge.expression(text), n, nbits))

  def minhashSignature(text: Column, n: Int, k: Int): Column =
    Bridge.column(MinHashSignatureFromText(Bridge.expression(text), n, k))
}
