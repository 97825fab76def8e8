package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_min_k(id, k)` — aggregate keeping the k SMALLEST bigint values
  * of the group (multiset semantics: duplicates retained), returned as a
  * sorted-ascending `array<bigint>`. Nulls are skipped, matching
  * `collect_list`.
  *
  * This is the bounded-memory form of
  * `sort_array(collect_list(id))` + a post-hoc size cap: `collect_list`
  * cannot short-circuit — a size filter applies only after the group's
  * buffer is complete, so one degenerate key (a mass-duplicated
  * boilerplate LSH bucket, a stopword-grade shingle's posting list)
  * materializes its ENTIRE membership in a single task's aggregation
  * buffer — hundreds of MB to GBs that neither spill per-group nor stop
  * growing. This aggregate holds at most `2k` elements per group at any
  * moment (amortized O(1) trim, the [[TopKPairs]] device), merges in
  * O(k), and crosses the shuffle as at most `k` longs per group.
  *
  * Exact-semantics contract with a downstream cap filter: called with
  * `k = cap + 1`,
  *  - a group of ≤ cap members returns the complete sorted membership —
  *    bit-identical to `sort_array(collect_list(id))`;
  *  - a group of > cap members returns exactly `cap + 1` elements, so
  *    `size(ids) <= cap` drops it — identical to the post-hoc filter —
  *    while `ids[0]` is still the group's TRUE global minimum (the k
  *    smallest always include the smallest), which a capped-bucket
  *    fallback can use as the cluster representative.
  */
case class CollectMinK(
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(id, kExpr)
  override def nullable: Boolean = false

  /** Reject bad calls at analysis time: update() blind-casts the id and k
    * gates the buffer trim, so a column-valued k or mistyped argument
    * would otherwise surface as a runtime ClassCastException (or an
    * unbounded buffer — the exact failure this aggregate exists to
    * prevent). */
  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint id, got ${id.dataType.sql}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal int k")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "collect_min_k"

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty

  /** Keep the buffer bounded: sort+trim once it doubles past k (amortized
    * O(log k) per row, never more than 2k entries held). */
  private def trim(buf: ArrayBuffer[Long]): ArrayBuffer[Long] =
    if (buf.length <= k) buf
    else {
      val best = buf.sorted.take(k)
      buf.clear(); buf ++= best
    }

  override def update(
      buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val v = id.eval(input)
    if (v != null) {
      buf += v.asInstanceOf[Long]
      if (buf.length >= 2 * k) trim(buf) else buf
    } else buf
  }

  override def merge(
      b1: ArrayBuffer[Long], b2: ArrayBuffer[Long]): ArrayBuffer[Long] =
    trim(b1 ++= b2)

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.sorted.take(k).toArray[Long])

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // serialize trimmed: a partial buffer crosses the shuffle as ≤ k longs
    val t = trim(buf)
    out.writeInt(t.length)
    t.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CollectMinK =
    copy(id = newChildren(0), kExpr = newChildren(1))
}

object CollectMinK {
  val info = new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
    classOf[CollectMinK].getName, "collect_min_k")
}
