package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Kernel for Z-order (Morton) curve addressing. */
object MortonKernel {

  /** Spread the low 31 bits of `v` into the even bit positions of a
    * long (classic parallel-prefix bit twiddle, O(log w)). */
  def spread(v0: Long): Long = {
    var v = v0 & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Morton interleave of the low 31 bits of two longs — a space-filling
    * curve address: sorting by it clusters rows that are close in BOTH
    * dimensions, so per-file min/max stats stay tight on both columns
    * (the data-skipping property single-column sorting only gives one
    * dimension). Result stays in 62 bits — always a positive long. */
  def morton2(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)
}

/** `morton2(bigint, bigint) -> bigint`: Z-order curve address of the two
  * low-31-bit dimension values. Engine-internal layout key (not an
  * oracle-visible value — external engines lack the bit interleave):
  * see [[graft.ops.Layout.zorderedWrite]]. Callers normalize dimensions
  * to a non-negative, roughly-uniform integer range first (rank, bucket
  * id, or day number — raw skewed keys curve poorly). */
case class Morton2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "morton2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(x: Any, y: Any): Any =
    MortonKernel.morton2(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.MortonKernel.morton2($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Morton2 =
    copy(left = newLeft, right = newRight)
}

object Morton2 {
  val info = new ExpressionInfo(classOf[Morton2].getName, "morton2")
}
