package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `pq_adc(codes array<int>, lut array<double>) -> double`: asymmetric
  * distance computation for product quantization — the compressed-domain
  * scoring kernel of [[graft.ops.ProductQuantization]].
  *
  * `codes` is a vector's M per-subspace codebook ids; `lut` is a query's
  * flat distance table laid out `[m * K + c]` (K inferred as
  * `lut.length / codes.length`). The approximate squared distance is the
  * sum of M table lookups — no vector arithmetic at all at search time,
  * which is why PQ search runs over a corpus 64× smaller than its raw
  * vectors. Engine-internal: codes are trusted to index within their
  * subspace's K entries (both are produced by the same trainer). */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<double>), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(c: Any, l: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val lut = l.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0) return 0.0
    val k = lut.numElements() / m
    var s = 0.0
    var i = 0
    while (i < m) { s += lut.getDouble(i * k + codes.getInt(i)); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val s = ctx.freshName("s")
      s"""
         |int $m = $c.numElements();
         |double $s = 0.0;
         |if ($m > 0) {
         |  int $k = $l.numElements() / $m;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $s += $l.getDouble($i * $k + $c.getInt($i));
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  val info = new ExpressionInfo(classOf[PqAdc].getName, "pq_adc")
}
