package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types._

/** A (score, id) candidate held in the bounded top-k buffer.
  * `nullScore` marks a NULL score — ranked after every non-null score,
  * matching `ORDER BY score DESC NULLS LAST, id ASC` (Spark's default
  * for `col.desc`). */
private[graft] final class TopKEntry(
    val nullScore: Boolean, val score: Double, val id: Long)

private[graft] object TopKOrdering {
  /** a ranks strictly before b under score DESC NULLS LAST, id ASC. */
  def before(a: TopKEntry, b: TopKEntry): Boolean = {
    if (a.nullScore != b.nullScore) b.nullScore // non-null beats null
    else if (!a.nullScore) {
      val c = SQLOrderingUtil.compareDoubles(a.score, b.score)
      if (c != 0) c > 0 else a.id < b.id
    } else a.id < b.id
  }

  /** Heap head = WORST kept entry, so a full buffer evicts in O(log k).
    * A top-level serializable object: the expression ships to executors
    * with the task, and an anonymous comparator is not Serializable. */
  object WorstFirst extends java.util.Comparator[TopKEntry] with Serializable {
    override def compare(a: TopKEntry, b: TopKEntry): Int =
      if (before(a, b)) 1 else if (before(b, a)) -1 else 0
  }
}

/** Bounded top-k-per-group aggregate: keeps the k best (score, id) pairs
  * under `score DESC NULLS LAST, id ASC` and evaluates to
  * `array<struct<score double, id bigint>>`, best first.
  *
  * This replaces the `row_number() OVER (PARTITION BY q ORDER BY …) <= k`
  * pattern on the ANN paths. The window form shuffles and SORTS every
  * scored candidate (queries × corpus rows for brute force); this
  * aggregate is O(k) state per group with MAP-SIDE PARTIAL aggregation,
  * so the shuffle carries at most groups × k rows — the difference between
  * "sort 10¹² scored pairs" and "merge 10⁴ heaps" at 100 TB. Runs under
  * ObjectHashAggregateExec (partial → partial-merge), no sort anywhere.
  *
  * Determinism: the id tie-break makes the result a pure function of the
  * input SET, independent of partitioning and merge order. Double
  * comparisons use Spark's own [[SQLOrderingUtil]] (NaN largest,
  * -0.0 == 0.0) so results are bit-identical to the window form.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKEntry]]
  with BinaryLike[Expression] {

  require(k > 0, s"topk_by: k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_by expects (double, bigint), got $other")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = true),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  private def before(a: TopKEntry, b: TopKEntry): Boolean =
    TopKOrdering.before(a, b)

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKEntry] =
    new java.util.PriorityQueue[TopKEntry](k + 1, TopKOrdering.WorstFirst)

  private def offer(buf: java.util.PriorityQueue[TopKEntry],
                    e: TopKEntry): Unit = {
    if (buf.size < k) buf.offer(e)
    else if (before(e, buf.peek())) { buf.poll(); buf.offer(e) }
  }

  override def update(buf: java.util.PriorityQueue[TopKEntry],
                      input: InternalRow): java.util.PriorityQueue[TopKEntry] = {
    val idv = id.eval(input)
    if (idv != null) { // a null id cannot be represented; skip the row
      val s = score.eval(input)
      offer(buf, new TopKEntry(s == null,
        if (s == null) 0.0 else s.asInstanceOf[Double],
        idv.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(a: java.util.PriorityQueue[TopKEntry],
                     b: java.util.PriorityQueue[TopKEntry])
      : java.util.PriorityQueue[TopKEntry] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: java.util.PriorityQueue[TopKEntry]): Any = {
    // NON-destructive: running-frame window evaluation calls eval on the
    // SAME buffer once per output row (update…eval…update…eval) — polling
    // the live queue here would empty it and corrupt every later frame.
    val arr = buf.toArray(new Array[TopKEntry](buf.size))
    java.util.Arrays.sort(arr, (a: TopKEntry, b: TopKEntry) =>
      if (before(a, b)) -1 else if (before(b, a)) 1 else 0) // best first
    new GenericArrayData(arr.map { e =>
      InternalRow(if (e.nullScore) null else e.score, e.id)
    }: Array[Any])
  }

  override def serialize(buf: java.util.PriorityQueue[TopKEntry]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(4 + buf.size * 17)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeBoolean(e.nullScore)
      out.writeDouble(e.score)
      out.writeLong(e.id)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(b: Array[Byte]): java.util.PriorityQueue[TopKEntry] = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.offer(new TopKEntry(in.readBoolean(), in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(score = newLeft, id = newRight)
}
