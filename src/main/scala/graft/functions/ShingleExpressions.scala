package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the shingle/MinHash scan stage of near-dup
  * detection.
  *
  * The declarative forms (`array_distinct(transform(sequence(...),
  * i -> substr(text, i, n)))`, then `transform(..., s -> conv(substr(
  * md5(s), 1, 8), 16, 10))`, then k x `array_min(transform(...))`) are
  * higher-order functions, which Catalyst evaluates interpreted — two
  * boxed closure calls per shingle per pass, a hex string round-trip per
  * hash, and k full re-walks of the hash array for a k-wide signature.
  * On a corpus scan that is the dominant dedup cost. These kernels do the
  * same work in one compiled pass per row and stay inside whole-stage
  * codegen via static calls.
  *
  * Value parity is exact (the DuckDB oracle depends on it):
  *  - windows are `substringSQL` (code-point) windows, `length` is
  *    `numChars` — identical to SQL substr/length for any input;
  *  - dedupe preserves first occurrence, like array_distinct;
  *  - h32 = first 4 bytes of the md5 digest, big-endian unsigned —
  *    identical to conv(substr(md5(s), 1, 8), 16, 10);
  *  - minhash_j = min over hashes of ((2j+1)*x + j*j+7) % (2^31-1),
  *    identical arithmetic in long precision.
  */
object HashKernels {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 4 md5-digest bytes as an unsigned 32-bit value. */
  def h32(bytes: Array[Byte]): Long = {
    val d = mdLocal.get()
    d.reset()
    val dig = d.digest(bytes)
    ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
  }

  private def distinctShingles(text: UTF8String, n: Int): java.util.LinkedHashSet[UTF8String] = {
    val len = text.numChars()
    val count = math.max(len - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 1
    while (i <= count) {
      seen.add(text.substringSQL(i, n))
      i += 1
    }
    seen
  }

  /** Distinct n-gram windows of `text`, first-occurrence order. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val seen = distinctShingles(text, n)
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** h32 of each distinct n-gram window, first-occurrence order. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val seen = distinctShingles(text, n)
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = h32(it.next().getBytes); i += 1 }
    new GenericArrayData(out)
  }

  /** h32 of EVERY n-char window, positional (NOT deduped) — the
    * winnowing k-gram pass (t12/t13), where window order carries the
    * alignment guarantee. Value parity: identical to
    * `transform(sequence(1, greatest(length(text) - (n-1), 1)),
    *    i -> cast(conv(substr(md5(substr(text, i, n)), 1, 8), 16, 10) as bigint))`
    * (substringSQL truncates at the end exactly like SQL substr). */
  def gramHashes(text: UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    val count = math.max(len - (n - 1), 1)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      out(i) = h32(text.substringSQL(i + 1, n).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sliding-window minima: out(i) = min(xs[i .. i+w-1]), truncating at
    * the array end, for i in 0 .. max(len-w, 0). Parity: identical to
    * `transform(sequence(1, greatest(size(xs) - (w-1), 1)),
    *    i -> array_min(slice(xs, i, w)))` — nulls skipped like
    * array_min; an all-null window yields a null element. */
  def windowMins(xs: ArrayData, w: Int): ArrayData = {
    val len = xs.numElements()
    val count = math.max(len - (w - 1), 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      var m = Long.MaxValue
      var any = false
      var j = i
      val end = math.min(i + w, len)
      while (j < end) {
        if (!xs.isNullAt(j)) {
          any = true
          val v = xs.getLong(j)
          if (v < m) m = v
        }
        j += 1
      }
      out(i) = if (any) java.lang.Long.valueOf(m) else null
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k-wide MinHash signature over precomputed hashes; one traversal,
    * null elements skipped (array_min semantics); null when no non-null
    * element exists. */
  def minhashSig(xs: ArrayData, k: Int): ArrayData = {
    val n = xs.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        any = true
        val x = xs.getLong(i)
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1L) * x + (j.toLong * j + 7L)) % 2147483647L
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }
}

/** Shared shape: unary array-producing kernel over (input, literal int). */
abstract class HashKernelExpression extends UnaryExpression {
  def param: Int
  protected def kernelCall(c: String): String
  protected def kernelEval(input: Any): Any

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = kernelEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = ${kernelCall(c)};
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
}

/** shingles(text, n): distinct n-character windows of text. */
case class Shingles(child: Expression, param: Int) extends HashKernelExpression {
  override def prettyName: String = "shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string, got $other")
  }

  override protected def kernelEval(input: Any): Any =
    HashKernels.shingles(input.asInstanceOf[UTF8String], param)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.shingles($c, $param)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingle_hashes(text, n): h32 of each distinct n-character window. */
case class ShingleHashes(child: Expression, param: Int) extends HashKernelExpression {
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string, got $other")
  }

  override protected def kernelEval(input: Any): Any =
    HashKernels.shingleHashes(input.asInstanceOf[UTF8String], param)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.shingleHashes($c, $param)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** gram_hashes(text, n): h32 of every n-character window, positional. */
case class GramHashes(child: Expression, param: Int) extends HashKernelExpression {
  override def prettyName: String = "gram_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName expects a string, got $other")
  }

  override protected def kernelEval(input: Any): Any =
    HashKernels.gramHashes(input.asInstanceOf[UTF8String], param)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.gramHashes($c, $param)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** window_mins(hashes, w): sliding-window minima over an array. */
case class WindowMins(child: Expression, param: Int) extends HashKernelExpression {
  override def prettyName: String = "window_mins"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array of bigint hashes, got $other")
  }

  override protected def kernelEval(input: Any): Any =
    HashKernels.windowMins(input.asInstanceOf[ArrayData], param)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.windowMins($c, $param)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_sig(hashes, k): k-wide MinHash signature in one traversal. */
case class MinhashSig(child: Expression, param: Int) extends HashKernelExpression {
  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array of bigint hashes, got $other")
  }

  override protected def kernelEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[ArrayData], param)
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashKernels.minhashSig($c, $param)"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
