package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `heavy_hitters(term, m)` — SpaceSaving/Stream-Summary heavy-hitters
  * sketch (Metwally et al. 2005) as a mergeable aggregate: a capacity-m
  * summary of (term, est, err) where TRUE count is certified inside
  * `[est − err, est]` and every item with true count > N/(m+1) is
  * guaranteed present. THE frequent-items architecture at corpus
  * scale: exact per-group term counting shuffles the whole vocabulary;
  * this keeps m entries per group per task and merges them (Agarwal et
  * al.'s mergeable-summaries merge: absent items default to the other
  * side's eviction floor, so the certificate survives ANY merge
  * order — which is exactly what makes the bound, unlike the raw
  * estimates, deterministic and cross-engine checkable).
  *
  * Returns `array<struct<term, est, err>>` sorted (est DESC, term ASC).
  */
case class SpaceSaving(
    term: Expression,
    mExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  private lazy val m: Int = mExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(term, mExpr)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (term.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string term, got ${term.dataType.sql}")
    else if (mExpr.dataType != IntegerType || !mExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal int m")
    else if (mExpr.eval() == null || mExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires m >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("est", LongType),
    StructField("err", LongType))))
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer()
      : mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  /** The summary's eviction floor: the smallest estimate once full,
    * 0 while capacity remains (an absent item's true count is then
    * certifiably 0). */
  private def floor(buf: mutable.LinkedHashMap[String, (Long, Long)]): Long =
    if (buf.size < m) 0L else buf.valuesIterator.map(_._1).min

  override def update(
      buf: mutable.LinkedHashMap[String, (Long, Long)],
      input: InternalRow): mutable.LinkedHashMap[String, (Long, Long)] = {
    val t = term.eval(input)
    if (t != null) {
      val s = t.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some((est, err)) => buf.update(s, (est + 1, err))
        case None if buf.size < m => buf.update(s, (1L, 0L))
        case None =>
          // evict the min-estimate item (ties: lexicographically
          // smallest term — determinism within one task's stream); the
          // newcomer inherits its estimate as certified error
          val (evict, (mEst, _)) = buf.minBy { case (k, (e, _)) => (e, k) }
          buf.remove(evict)
          buf.update(s, (mEst + 1, mEst))
      }
    }
    buf
  }

  override def merge(
      b1: mutable.LinkedHashMap[String, (Long, Long)],
      b2: mutable.LinkedHashMap[String, (Long, Long)])
      : mutable.LinkedHashMap[String, (Long, Long)] = {
    if (b2.isEmpty) return b1
    if (b1.isEmpty) return b2
    val f1 = floor(b1)
    val f2 = floor(b2)
    val out = mutable.LinkedHashMap.empty[String, (Long, Long)]
    (b1.keySet ++ b2.keySet).foreach { k =>
      val (e1, r1) = b1.getOrElse(k, (f1, f1))
      val (e2, r2) = b2.getOrElse(k, (f2, f2))
      out.update(k, (e1 + e2, r1 + r2))
    }
    if (out.size <= m) out
    else {
      val keep = out.toSeq
        .sortBy { case (k, (e, _)) => (-e, k) }.take(m)
      mutable.LinkedHashMap(keep: _*)
    }
  }

  override def eval(
      buf: mutable.LinkedHashMap[String, (Long, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, (e, _)) => (-e, k) }
    new GenericArrayData(sorted.map { case (k, (e, r)) =>
      InternalRow(UTF8String.fromString(k), e, r)
    }.toArray[Any])
  }

  override def serialize(
      buf: mutable.LinkedHashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, (e, r)) =>
      out.writeUTF(k); out.writeLong(e); out.writeLong(r)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.LinkedHashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val k = in.readUTF()
      buf.update(k, (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSaving =
    copy(term = newChildren(0), mExpr = newChildren(1))
}

object SpaceSaving {
  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[SpaceSaving].getName, "heavy_hitters")
}
