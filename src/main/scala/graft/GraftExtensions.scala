package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering the engine's native expressions for SQL
  * use (`spark.sql("SELECT graft_jaccard64(a, b) ...")`) and the
  * analysis-time pipe-composition check rule
  * ([[graft.plans.PipeCompositionCheck]], the `validate_ops` analog).
  *
  * Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // analysis-time pipe-composition validation (validate_ops analog)
    ext.injectCheckRule(_ => plans.PipeCompositionCheck)
    // declarative hamming theta-join -> pigeonhole band equi-joins
    ext.injectOptimizerRule(_ => plans.HammingJoinRewrite)
    // declarative bounded-difference (range) theta-join -> bucketed
    // equi-join branches
    ext.injectOptimizerRule(_ => plans.RangeJoinRewrite)
    // graft catalog tables as SQL citizens: MERGE INTO / DESCRIBE
    // HISTORY at parse time, catalog reads rewritten to the shared
    // planner-pruning V1 relation (Delta's integration shape)
    ext.injectParser((session, delegate) =>
      new catalog.GraftSqlParser(session, delegate))
    ext.injectResolutionRule(session =>
      catalog.GraftV2ToV1Reads(session))
    def arity2(name: String, children: Seq[Expression])(
        build: (Expression, Expression) => Expression): Expression = {
      if (children.size != 2)
        throw new IllegalArgumentException(
          s"$name requires exactly 2 arguments, got ${children.size}")
      build(children(0), children(1))
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_jaccard64"),
      new ExpressionInfo(
        classOf[functions.JaccardDistinctLongs].getName, "graft_jaccard64"),
      (children: Seq[Expression]) =>
        arity2("graft_jaccard64", children)(
          functions.JaccardDistinctLongs(_, _))))
    ext.injectFunction((
      new FunctionIdentifier("graft_split_text"),
      new ExpressionInfo(
        classOf[functions.SplitTextGenerator].getName, "graft_split_text"),
      (children: Seq[Expression]) =>
        arity2("graft_split_text", children)(
          functions.SplitTextGenerator(_, _))))
    // text-hash expressions: trailing args must be integer literals
    def litInt(name: String, e: Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case _ => throw new IllegalArgumentException(
        s"$name requires integer literal arguments after the column")
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(
        classOf[functions.TextHashExpressions.SimHashFingerprint].getName,
        "graft_simhash"),
      (children: Seq[Expression]) => {
        if (children.size != 3)
          throw new IllegalArgumentException(
            s"graft_simhash(text, n, nbits) takes 3 args, got ${children.size}")
        functions.TextHashExpressions.SimHashFingerprint(children(0),
          litInt("graft_simhash", children(1)),
          litInt("graft_simhash", children(2)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(
        classOf[functions.TextHashExpressions.MinHashSignatureFromText].getName,
        "graft_minhash_sig"),
      (children: Seq[Expression]) => {
        if (children.size != 3)
          throw new IllegalArgumentException(
            s"graft_minhash_sig(text, n, k) takes 3 args, got ${children.size}")
        functions.TextHashExpressions.MinHashSignatureFromText(children(0),
          litInt("graft_minhash_sig", children(1)),
          litInt("graft_minhash_sig", children(2)))
      }))
  }
}
