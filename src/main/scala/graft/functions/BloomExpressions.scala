package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, ByteType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(binary, key) -> boolean`: membership probe of a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] (the first
  * argument must be a foldable binary — the filter bytes travel with the
  * plan, once, not per row). False positives possible, false negatives
  * impossible — which is exactly the contract a semi-join *reduction*
  * needs: rows the probe passes still meet the exact join downstream, so
  * results are identical to the unpruned plan and only the shuffled
  * volume changes (see [[graft.ops.RuntimeFilters]]).
  *
  * Key hashing matches what `DataFrameStatFunctions.bloomFilter` put in:
  * integral keys probe as longs, string keys probe their UTF-8 bytes
  * (`BloomFilter.putString` is defined as `putBinary(utf8Bytes)`, and
  * `UTF8String.getBytes` yields those same bytes without a String
  * round-trip). Codegen emits a direct probe call on a plan-referenced
  * filter object — no per-row deserialization, stays inside whole-stage
  * codegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary filter, got ${left.dataType.sql}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a FOLDABLE filter argument — the filter is " +
          "deserialized once per plan, not per row")
    else right.dataType match {
      case ByteType | ShortType | IntegerType | LongType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports integral or string keys, got ${other.sql}")
    }

  /** Deserialized once per task (and once on the driver for codegen). */
  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    if (bloom == null) return null
    val v = right.eval(input)
    if (v == null) null
    else right.dataType match {
      case ByteType => bloom.mightContainLong(v.asInstanceOf[Byte].toLong)
      case ShortType => bloom.mightContainLong(v.asInstanceOf[Short].toLong)
      case IntegerType => bloom.mightContainLong(v.asInstanceOf[Int].toLong)
      case LongType => bloom.mightContainLong(v.asInstanceOf[Long])
      case StringType =>
        bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // A null filter literal makes the whole expression null — the
    // nullSafeCodeGen short-circuit handles it before the probe runs, so
    // the (unreachable) probe body can reference a dummy.
    if (bloom == null)
      return nullSafeCodeGen(ctx, ev, (_, _) => s"${ev.value} = false;")
    // The filter rides the plan as ONE referenced object (the left
    // operand's generated value — a constant byte-array reference — is
    // deliberately unused); only the key is evaluated per row.
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    val probe: String => String = right.dataType match {
      case StringType =>
        c => s"$bloomRef.mightContainBinary($c.getBytes())"
      case _ =>
        c => s"$bloomRef.mightContainLong((long) $c)"
    }
    nullSafeCodeGen(ctx, ev, (_, r) => s"${ev.value} = ${probe(r)};")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  val info = new ExpressionInfo(
    classOf[BloomMightContain].getName, "bloom_might_contain")
}
