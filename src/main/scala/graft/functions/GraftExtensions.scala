package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Production registration path for the engine's native expressions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * makes vector_dot / vector_cosine available in every session (including
  * SQL-only clients over Thrift) without any driver-side registerAll call.
  * VectorFunctions.registerAll covers the already-running-session case.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def arity(name: String, n: Int)(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name takes $n argument(s), got ${exprs.length}")

  private def litInt(name: String,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression], i: Int): Int =
    exprs.lift(i) match {
      case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType)) => v
      case other => throw new IllegalArgumentException(
        s"$name argument ${i + 1} must be a literal int, got $other")
    }

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vector_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("vector_dot", 2)(exprs)
        DotProduct(exprs.head, exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vector_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("vector_cosine", 2)(exprs)
        CosineSimilarity(exprs.head, exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimhashBits].getName, "simhash_bits"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("simhash_bits", 1)(exprs)
        SimhashBits(exprs.head)
      }))
    extensions.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHittersAgg].getName, "heavy_hitters"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"heavy_hitters(col, k) takes 2 arguments, got ${exprs.length}")
        HeavyHittersAgg(exprs.head, exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"heavy_hitters k must be an integer literal, got $other")
        })
      }))
    // the shingle/minhash kernel set (width as a literal int), so a
    // SQL-only session has the same surface VectorFunctions.registerAll
    // provides a driver-side one
    Seq[(String, (Seq[org.apache.spark.sql.catalyst.expressions.Expression], Int) => org.apache.spark.sql.catalyst.expressions.Expression, Class[_])](
      ("shingles", (e, w) => Shingles(e.head, w), classOf[Shingles]),
      ("shingle_hashes", (e, w) => ShingleHashes(e.head, w), classOf[ShingleHashes]),
      ("minhash_sig", (e, w) => MinhashSig(e.head, w), classOf[MinhashSig]),
      ("gram_hashes", (e, w) => GramHashes(e.head, w), classOf[GramHashes]),
      ("window_mins", (e, w) => WindowMins(e.head, w), classOf[WindowMins])
    ).foreach { case (name, build, cls) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          arity(name, 2)(exprs)
          build(exprs, litInt(name, exprs, 1))
        }))
    }
    extensions.injectFunction((
      FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinctAgg].getName, "kmv_distinct"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("kmv_distinct", 2)(exprs)
        KmvDistinctAgg(exprs.head, litInt("kmv_distinct", exprs, 1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKAgg].getName, "topk_pairs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 3) throw new IllegalArgumentException(
          s"topk_pairs(key, id, k) takes 3 arguments, got ${exprs.length}")
        TopKAgg(exprs.head, exprs(1), exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"topk_pairs k must be an integer literal, got $other")
        })
      }))
    extensions.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("bloom_agg", 2)(exprs)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs.head, exprs(1))
      }))
    extensions.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_contains"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        arity("bloom_contains", 2)(exprs)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))
      }))
  }
}
