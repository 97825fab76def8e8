package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The higher-order-function form (`aggregate(zip_with(a, b, *), ...)`)
  * is interpreted — per-element lambda dispatch plus a materialized
  * intermediate array per row pair. These expressions generate a tight
  * primitive double loop inside whole-stage codegen: same left-to-right
  * IEEE-754 summation order (so results are bit-identical to the fold and
  * to the SQL oracle's `list_sum(list_transform(...))`), none of the
  * overhead.
  */
object VectorExpressions {

  /** Registers the full native-function surface on a session (idempotent):
    * `vec_dot`, `vec_norm`, `topk_pairs`, and the text/dedup kernels
    * `ws_tokens`, `shingle_set`, `minhash_sig`, `simhash32`. Called by
    * every [[graft.core.Tables]] load, so any query built over the test
    * tables resolves them; also injected by
    * [[graft.plans.GraftExtensions]] for config-driven use. */
  def register(spark: SparkSession): Unit = {
    val registry =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("vec_dot"), DotProduct.info,
      (children: Seq[Expression]) => DotProduct(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("vec_norm"), L2Norm.info,
      (children: Seq[Expression]) => L2Norm(children.head))
    registry.registerFunction(
      FunctionIdentifier("topk_pairs"),
      TopKPairs.info,
      (children: Seq[Expression]) =>
        TopKPairs(children(0), children(1), children(2)))
    registry.registerFunction(
      FunctionIdentifier("collect_min_k"),
      CollectMinK.info,
      (children: Seq[Expression]) => CollectMinK(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("vec_sum"),
      VecSum.info,
      (children: Seq[Expression]) => VecSum(children.head))
    registry.registerFunction(
      FunctionIdentifier("heavy_hitters"),
      SpaceSaving.info,
      (children: Seq[Expression]) => SpaceSaving(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("ws_tokens"), WsTokens.info,
      (children: Seq[Expression]) => WsTokens(children.head))
    registry.registerFunction(
      FunctionIdentifier("shingle_set"), ShingleSet.info,
      (children: Seq[Expression]) => ShingleSet(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("minhash_sig"), MinHashSig.info,
      (children: Seq[Expression]) => MinHashSig(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("minhash_sig_fast"), MinHashSigFast.info,
      (children: Seq[Expression]) =>
        MinHashSigFast(children(0), children(1), children(2)))
    registry.registerFunction(
      FunctionIdentifier("simhash32"), SimHash32.info,
      (children: Seq[Expression]) => SimHash32(children.head))
    registry.registerFunction(
      FunctionIdentifier("simhash64"), SimHash64.info,
      (children: Seq[Expression]) => SimHash64(children.head))
    registry.registerFunction(
      FunctionIdentifier("nfc_normalize"), NfcNormalize.info,
      (children: Seq[Expression]) => NfcNormalize(children.head))
    registry.registerFunction(
      FunctionIdentifier("morton2"), Morton2.info,
      (children: Seq[Expression]) => Morton2(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("jaro_winkler"), JaroWinklerSim.info,
      (children: Seq[Expression]) =>
        JaroWinklerSim(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("bloom_might_contain"), BloomMightContain.info,
      (children: Seq[Expression]) =>
        BloomMightContain(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("pq_adc"), PqAdc.info,
      (children: Seq[Expression]) => PqAdc(children(0), children(1)))
    registry.registerFunction(
      FunctionIdentifier("char_entropy"), CharEntropy.info,
      (children: Seq[Expression]) => CharEntropy(children.head))
    // Optimizer rules piggyback on the same idempotent hook: sessions
    // built without `spark.sql.extensions` (the harness's plain
    // builders) still get the engine's rewrites. Assignment, not
    // append — this list is wholly owned here.
    spark.experimental.extraOptimizations = Seq(
      graft.plans.LevenshteinPruning,
      new graft.plans.MvRewriteRule(spark))
  }
}

/** `vec_dot(array<double>, array<double>) -> double`: the dot product of
  * the common prefix of two vectors. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes: AbstractDataType is private[sql]. Inputs must be
  // array<double> (call sites cast explicitly).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val info = new ExpressionInfo(classOf[DotProduct].getName, "vec_dot")
}

/** `vec_norm(array<double>) -> double`: the vector's L2 norm. */
case class L2Norm(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

object L2Norm {
  val info = new ExpressionInfo(classOf[L2Norm].getName, "vec_norm")
}
