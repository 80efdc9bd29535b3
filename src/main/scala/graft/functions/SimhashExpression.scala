package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** simhash_bits(word_hashes) -> 32-bit SimHash sketch as BIGINT.
  *
  * For each bit j in 0..31 every element votes +1 if bit j of the hash is
  * set, else -1; bit j of the result is set iff the vote total is
  * positive. Identical values to the declarative form it replaces
  * (32 `aggregate(...)` higher-order calls), but those interpret two
  * closures per element per bit — 32 array traversals per row with no
  * codegen. This expression is one fused whole-stage-codegen loop: a
  * single traversal maintaining 32 counters, which is the difference
  * between a scan-local sketch and a 6x-slower interpreted pass when
  * sketching a 100 TB corpus.
  *
  * Null semantics: like the vector kernels, a null element yields NULL
  * (the declarative chain would silently zero the sketch — a corrupt
  * sketch that still joins; NULL surfaces the bad row instead).
  */
case class SimhashBits(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash_bits"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array of int/bigint word hashes, got $other")
  }

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  private def elemIsInt: Boolean = child.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (elemNullable && arr.isNullAt(i)) return null
      val h = if (elemIsInt) arr.getInt(i).toLong else arr.getLong(i)
      var j = 0
      while (j < 32) {
        votes(j) += (((h >>> j) & 1L) * 2L - 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val votes = ctx.freshName("votes"); val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val getElem = if (elemIsInt) s"(long) $a.getInt($i)" else s"$a.getLong($i)"
      val nullCheck = if (elemNullable) s"$a.isNullAt($i)" else "false"
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[32];
         |boolean $bad = false;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($nullCheck) { $bad = true; }
         |  else {
         |    long $h = $getElem;
         |    for (int $j = 0; $j < 32; $j++) {
         |      $votes[$j] += (int) ((($h >>> $j) & 1L) * 2L - 1L);
         |    }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $out = 0L;
         |  for (int $j = 0; $j < 32; $j++) {
         |    if ($votes[$j] > 0) $out |= (1L << $j);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
