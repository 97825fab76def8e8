package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel: Shannon entropy (bits) of a string's CODE-POINT distribution.
  * Summation runs in ascending code-point order so the result is
  * bit-deterministic and any engine summing the same way reproduces it
  * (the oracle's floating sum order is its own; both sides round). */
object EntropyKernel {
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    var n = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    var ent = 0.0
    val it = counts.values().iterator()
    val ln2 = math.log(2.0)
    while (it.hasNext) {
      val p = it.next().toDouble / n
      ent -= p * (math.log(p) / ln2)
    }
    ent
  }
}

/** `char_entropy(string) -> double`: Shannon entropy of the text's
  * code-point distribution, in bits. THE cheap gibberish detector:
  * natural language sits in a narrow band (~3.5-4.5 bits for English
  * prose), base64/hex blobs saturate toward log2(alphabet), and
  * single-character spam collapses toward 0 — a scan-speed quality
  * signal with no model and no shuffle. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    EntropyKernel.charEntropy(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.EntropyKernel.charEntropy($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  val info = new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy")
}
