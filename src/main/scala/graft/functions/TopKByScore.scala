package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-heap top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties broken by lowest id) per group. Scores may be
  * `bigint` (index counts) or `double` (ANN cosines); ids are `bigint`
  * (vector ids) or `string` (the reference keys documents by FILENAME,
  * `mapper/main.py:63` — a string-keyed index must rank through the
  * same scale path).
  *
  * Why not `row_number() over (partition by g order by ...)`? The window
  * formulation shuffles and SORTS every row of every group; this
  * aggregate participates in partial aggregation, so each map task
  * forwards AT MOST k rows per group into the shuffle — for a top-3
  * over a 100 TB inverted index the exchange carries k·groups rows
  * instead of the whole index, and nothing is ever fully sorted.
  * (`slice(sort_array(collect_list(...)))` also buffers whole groups.)
  *
  * Buffer: a min-heap of (score, id) pairs, worst element on top for
  * O(log k) eviction. Doubles are stored AS LONG KEYS via the
  * order-preserving IEEE-754 bit twist (sign bit flipped for positives,
  * all bits flipped for negatives), so one long score key, one
  * comparison path, and one serialization format serve both score
  * types. String ids compare as UTF8String (binary order — exactly
  * Spark's string sort order) and are COPIED on insert: the eval'd
  * UTF8String may point into a row buffer the scan reuses.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Any)]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)

  override def checkInputDataTypes(): TypeCheckResult =
    if ((score.dataType == LongType || score.dataType == DoubleType) &&
        (id.dataType == LongType || id.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint or double, bigint or string), got " +
        s"${score.dataType.simpleString}, ${id.dataType.simpleString}")

  private def scoreIsDouble: Boolean = score.dataType == DoubleType
  private def idIsString: Boolean = id.dataType == StringType

  private def toKey(s: Any): Long =
    if (scoreIsDouble) TopKByScore.sortableDoubleKey(s.asInstanceOf[Double])
    else s.asInstanceOf[Long]

  private def fromKey(key: Long): Any =
    if (scoreIsDouble) TopKByScore.doubleFromSortableKey(key)
    else key

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", score.dataType, nullable = false),
    StructField("id", id.dataType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_top_k"

  // dequeue order = "worst first" (lowest score key, then highest id)
  // via hand-written static Orderings: Ordering.by captures the
  // implicit tuple ordering in an anon class whose field does not
  // survive task serialization (NPE inside PriorityQueue on the
  // executor).
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Any)] =
    mutable.PriorityQueue.empty[(Long, Any)](
      if (idIsString) TopKByScore.WorstFirstString else TopKByScore.WorstFirstLong)

  override def update(
      buf: mutable.PriorityQueue[(Long, Any)],
      input: InternalRow): mutable.PriorityQueue[(Long, Any)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val idVal: Any = i match {
        // defensive copy: the scan may reuse the backing row buffer
        case u: UTF8String => u.clone()
        case other         => other
      }
      buf.enqueue((toKey(s), idVal))
      if (buf.size > k) buf.dequeue() // evict the worst
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Long, Any)],
      other: mutable.PriorityQueue[(Long, Any)]): mutable.PriorityQueue[(Long, Any)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Any)]): Any = {
    // emit best-first: score desc, id asc (explicit — never via implicits)
    // "best" = least under the worst-first ordering (highest score key,
    // then lowest id)
    val worstFirst = if (idIsString) TopKByScore.WorstFirstString else TopKByScore.WorstFirstLong
    val sorted = buf.toArray.sortWith((a, b) => worstFirst.compare(a, b) < 0)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(fromKey(s), i): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Any)]): Array[Byte] =
    if (idIsString) {
      val bos = new ByteArrayOutputStream(4 + buf.size * 24)
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (s, i) =>
        out.writeLong(s)
        val bytes = i.asInstanceOf[UTF8String].getBytes
        out.writeInt(bytes.length)
        out.write(bytes)
      }
      out.flush()
      bos.toByteArray
    } else {
      val bb = ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      buf.foreach { case (s, i) => bb.putLong(s); bb.putLong(i.asInstanceOf[Long]) }
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Any)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    if (idIsString) {
      while (j < n) {
        val s = bb.getLong
        val len = bb.getInt
        val idBytes = new Array[Byte](len)
        bb.get(idBytes)
        buf.enqueue((s, UTF8String.fromBytes(idBytes)))
        j += 1
      }
    } else {
      while (j < n) { buf.enqueue((bb.getLong, bb.getLong)); j += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** Order-preserving IEEE-754 twist (an involution): positives keep
    * their bits (they already sort correctly as signed longs), negatives
    * flip every bit except the sign, inverting their magnitude order
    * while staying below the positives. Signed-long comparison of the
    * keys then matches java.lang.Double.compare (NaN sorts above +Inf —
    * never fed here). Property-tested in TopKByScoreSpec. */
  private def twist(bits: Long): Long = bits ^ ((bits >> 63) & 0x7fffffffffffffffL)

  private[functions] def sortableDoubleKey(d: Double): Long =
    twist(java.lang.Double.doubleToLongBits(d))

  private[functions] def doubleFromSortableKey(key: Long): Double =
    java.lang.Double.longBitsToDouble(twist(key))

  /** Worst element is the maximum: lowest score key, then highest id. */
  private[functions] object WorstFirstLong extends Ordering[(Long, Any)] {
    override def compare(a: (Long, Any), b: (Long, Any)): Int = {
      val c = java.lang.Long.compare(b._1, a._1) // lower score ⇒ greater (worse)
      if (c != 0) c
      else java.lang.Long.compare(a._2.asInstanceOf[Long], b._2.asInstanceOf[Long]) // higher id ⇒ worse
    }
  }

  /** Same contract for string ids: UTF8String.compareTo is byte order —
    * identical to Spark's StringType sort order. */
  private[functions] object WorstFirstString extends Ordering[(Long, Any)] {
    override def compare(a: (Long, Any), b: (Long, Any)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c
      else a._2.asInstanceOf[UTF8String].compareTo(b._2.asInstanceOf[UTF8String])
    }
  }

  /** Column API: array of (score, id) structs, best-first. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByScore(GraftSqlBridge.expression(score), GraftSqlBridge.expression(id), k)
        .toAggregateExpression())
}
