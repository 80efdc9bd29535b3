package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Catalyst aggregate —
  * the one-pass, fixed-memory, MERGEABLE top-k the engine needs when
  * "GROUP BY term ORDER BY count DESC LIMIT k" would shuffle a 100 TB
  * term stream: each partition keeps at most k-1 counters (bounded
  * memory regardless of cardinality), partial sketches merge
  * associatively on the reduce side (Agarwal et al., "Mergeable
  * Summaries", PODS 2012), and the global result is a k-1-entry summary
  * with the classic guarantees:
  *
  *   - any item with true frequency > n/k is PRESENT in the sketch;
  *   - every reported estimate e satisfies e <= true <= e + n/k.
  *
  * Estimates (not exact counts) depend on encounter order, so the
  * sketch is pinned by HeavyHittersSpec's bound checks rather than a
  * DuckDB hash oracle — same treatment as HLL (appx01). Exact top-k
  * stays available as t06's groupBy+window when the key space fits.
  *
  * SQL: `heavy_hitters(expr, k)` -> array<struct<item:string,count:bigint>>
  * sorted by (count desc, item asc).
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 2, s"heavy_hitters needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // clone: Spark reuses the UTF8String's backing buffer across rows.
    val item = v.asInstanceOf[UTF8String]
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k - 1 => buf.update(item.clone(), 1L)
      case None => // decrement-all step: every counter pays one
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.foreach { case (key, c) => if (c == 1L) dead += key else buf.update(key, c - 1) }
        dead.foreach(buf.remove)
    }
    buf
  }

  /** Mergeable-summaries merge: sum counts, then if over capacity
    * subtract the k-th largest count from everything and drop <= 0 —
    * the error of the result is the sum of the inputs' errors plus the
    * subtracted pivot, which preserves the n/k bound. */
  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) => buf.update(key, buf.getOrElse(key, 0L) + c) }
    if (buf.size > k - 1) {
      val pivot = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.foreach { case (key, c) =>
        if (c - pivot <= 0L) dead += key else buf.update(key, c - pivot)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      new GenericInternalRow(Array[Any](item, c))
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "heavy_hitters"
}
