package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** K-Minimum-Values (bottom-k) distinct-count sketch as a native Catalyst
  * aggregate — the DETERMINISTIC corpus-scale alternative to HLL.
  *
  * Input contract: `child` is a 48-bit uniform hash of the value (the
  * md5-derived `conv(substr(md5(v), 1, 12), 16, 10)` the engine's other
  * sketch kernels use — 12 hex digits, so every hash and the estimate's
  * every intermediate fits a double exactly). The aggregate keeps the k
  * SMALLEST DISTINCT hashes — bounded memory regardless of input
  * cardinality, partials merge associatively under any partitioning (the
  * bottom-k of a union is the bottom-k of the merged bottom-k's), and:
  *
  *   - if fewer than k distinct hashes were seen, the result is their
  *     exact count;
  *   - else the Beyer et al. (SIGMOD'07) unbiased estimator
  *     (k-1) / U_(k) with U_(k) = h_(k) / 2^48 — relative error
  *     ~ 1/sqrt(k-2) (k=256 -> ~6%).
  *
  * Unlike HLL/GK, the result is a pure function of the input SET — no
  * engine-specific sketch internals, no order dependence — so a DuckDB
  * oracle computing the same bottom-k in SQL (DISTINCT -> ORDER BY ->
  * LIMIT k) hash-matches bit-for-bit: the k-th smallest hash is the same
  * integer in both engines and the estimate is one IEEE division on
  * exactly-representable operands. This is what lets the driver's
  * correctness gate cover the approximate-profiling path (prof05) that
  * HLL (prof03) and GK (n09) cannot gate.
  *
  * SQL: `kmv_distinct(h48, k)` -> double.
  */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"kmv_distinct needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires an integral hash column, got ${other.catalogString}")
  }

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Keep the k smallest distinct hashes: admit while under capacity, else
    * only a hash below the current k-th smallest (evicting it). TreeSet
    * dedups, so re-seeing a retained hash is a no-op — the buffer is a
    * function of the input SET, which is what makes the result
    * order-independent and hence oracle-gateable. */
  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val h = toLong(v)
    if (buf.size < k) { buf.add(h); return buf }
    if (h < buf.last()) {
      if (buf.add(h)) buf.pollLast()
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last() && buf.add(h)) buf.pollLast()
    }
    buf
  }

  /** 2^48 as an exact double; every retained hash is < 2^48 so hash ->
    * double is exact, (k-1)*2^48 needs <= 8+48 significand bits for any
    * k <= 2^5... (k-1 small) — exact; the one division is IEEE-identical
    * in every engine. */
  private val domain = 281474976710656.0 // 2^48

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * domain / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_distinct"
}
