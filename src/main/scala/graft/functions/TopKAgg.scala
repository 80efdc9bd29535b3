package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k rows per group as a native Catalyst aggregate —
  * `topk_pairs(key, id, k)` -> `array<struct<key double, id bigint>>`
  * sorted by (key DESC, id ASC).
  *
  * Spark has no bounded per-group top-k: the idiomatic forms are a
  * row_number window (sorts EVERY row of every group — at corpus grain
  * that is a full shuffle + per-partition sort of the whole table to
  * keep 5 rows per group) or collect_list + slice (memory-unbounded on
  * a skewed group). This aggregate keeps a k-bounded heap per group, so
  *
  *   - memory is O(k) per group regardless of group size or skew;
  *   - partial aggregation applies (ObjectHashAggregate map-side
  *     combine): each map task ships AT MOST k rows per group into the
  *     exchange instead of all of them — on a 1000-executor corpus scan
  *     the shuffle is groups x k x tasks, not the table;
  *   - merge is associative (top-k of a union = top-k of merged
  *     top-k's), so AQE can re-plan the exchange freely.
  *
  * Determinism: ties on `key` break by SMALLEST `id`, making the result
  * a pure function of the input set (order-independent under any
  * partitioning) and therefore oracle-gateable against a ROW_NUMBER()
  * OVER (ORDER BY key DESC, id ASC) recompute. Doubles are compared
  * with java.lang.Double.compare (total order; -0.0 < 0.0, NaN last is
  * irrelevant since NaN keys are skipped like nulls).
  *
  * The payload is deliberately (key, id): downstream either explodes the
  * pair list directly or broadcast-joins the tiny result back to the
  * source for the remaining columns — both metadata-sized operations.
  */
case class TopKAgg(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  require(k >= 1 && k <= (1 << 20), s"topk_pairs needs 1 <= k <= 2^20, got $k")

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKAgg.resultType

  override def checkInputDataTypes(): TypeCheckResult = (key.dataType, id.dataType) match {
    case (DoubleType | FloatType | LongType | IntegerType, LongType | IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (kt, it) => TypeCheckResult.TypeCheckFailure(
      s"topk_pairs requires (numeric key, integral id), got (${kt.catalogString}, ${it.catalogString})")
  }

  private def keyOf(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
  }

  private def idOf(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv == null || iv == null) return buf
    val kd = keyOf(kv)
    if (kd.isNaN) return buf
    buf.offer(kd, idOf(iv))
    buf
  }

  override def merge(buf: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    other.foreach((kd, id) => buf.offer(kd, id))
    buf
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    val rows = buf.sortedDesc().map { case (kd, id) =>
      InternalRow(kd, id): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = TopKAgg.Heap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(key = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_pairs"
}

object TopKAgg {

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("key", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** k-bounded binary min-heap on (key ASC, id DESC): the root is the
    * WORST retained pair, so admission is one root comparison and
    * eviction one sift — O(log k) per offered row, O(k) memory. */
  final class Heap(k: Int) {
    private val keys = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    /** a strictly worse than b in retention order (a loses ties it
      * shouldn't: lower key, or same key with larger id). */
    private def worse(ka: Double, ia: Long, kb: Double, ib: Long): Boolean = {
      val c = java.lang.Double.compare(ka, kb)
      c < 0 || (c == 0 && ia > ib)
    }

    def offer(kd: Double, id: Long): Unit = {
      if (n < k) {
        var i = n
        keys(i) = kd; ids(i) = id; n += 1
        // sift up
        while (i > 0 && worse(keys(i), ids(i), keys((i - 1) / 2), ids((i - 1) / 2))) {
          val p = (i - 1) / 2
          swap(i, p); i = p
        }
      } else if (worse(keys(0), ids(0), kd, id)) {
        keys(0) = kd; ids(0) = id
        siftDown(0)
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val tk = keys(a); keys(a) = keys(b); keys(b) = tk
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      var continue = true
      while (continue) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var w = i
        if (l < n && worse(keys(l), ids(l), keys(w), ids(w))) w = l
        if (r < n && worse(keys(r), ids(r), keys(w), ids(w))) w = r
        if (w == i) continue = false
        else { swap(i, w); i = w }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(keys(i), ids(i)); i += 1 }
    }

    /** Final output order: key DESC, id ASC. */
    def sortedDesc(): Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](n)
      var i = 0
      while (i < n) { out(i) = (keys(i), ids(i)); i += 1 }
      out.sortInPlaceWith { case ((ka, ia), (kb, ib)) =>
        val c = java.lang.Double.compare(kb, ka)
        c < 0 || (c == 0 && ia < ib)
      }
      out
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * n)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putDouble(keys(i)); bb.putLong(ids(i)); i += 1 }
      bb.array()
    }
  }

  object Heap {
    def fromBytes(k: Int, bytes: Array[Byte]): Heap = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val h = new Heap(k)
      var i = 0
      while (i < n) { h.offer(bb.getDouble, bb.getLong); i += 1 }
      h
    }
  }
}
