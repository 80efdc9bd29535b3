package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Dedup

/** Bit-parity of the native shingle/MinHash/SimHash kernels against the
  * declarative higher-order-function forms they replaced — the DuckDB
  * oracle pins the same values end-to-end, but these tests localize a
  * divergence to the kernel (and cover inputs the corpus lacks: empty
  * strings, sub-window strings, non-ASCII, null elements). */
class HashKernelsSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("shingles/shingle_hashes match the declarative substr+md5+conv chain") {
    VectorFunctions.registerAll(spark)
    val both = docs.select(
      call_function("shingles", col("text"), lit(8)).as("nat_sh"),
      expr(Dedup.shinglesExpr("text")).as("dec_sh"),
      call_function("shingle_hashes", col("text"), lit(8)).as("nat_h"),
      expr(Dedup.shingleHashesExpr("text")).as("dec_h"))
    assert(both.filter(col("nat_sh") =!= col("dec_sh")).count() == 0)
    assert(both.filter(col("nat_h") =!= col("dec_h")).count() == 0)
  }

  test("kernels match on edge inputs: empty, shorter-than-window, non-ASCII") {
    import spark.implicits._
    VectorFunctions.registerAll(spark)
    val edge = Seq("", "abc", "ab", "日本語のテキストです、短い", "aaaaaaaaaaaa", "exactly8")
      .toDF("text")
    val both = edge.select(
      call_function("shingles", col("text"), lit(8)).as("nat_sh"),
      expr(Dedup.shinglesExpr("text")).as("dec_sh"),
      call_function("shingle_hashes", col("text"), lit(8)).as("nat_h"),
      expr(Dedup.shingleHashesExpr("text")).as("dec_h"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"shingles diverge: $r")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"hashes diverge: $r")
    }
  }

  test("gram_hashes/window_mins match the declarative positional chain (t12/t13)") {
    import spark.implicits._
    VectorFunctions.registerAll(spark)
    val h = "cast(conv(substr(md5(substr(text, i, 8)), 1, 8), 16, 10) as bigint)"
    val edge = Seq("", "abc", "exactly8", "日本語のテキストです、短い", "aaaaaaaaaaaa").toDF("text")
    val both = docs.select(col("text")).union(edge)
      .withColumn("dec_h",
        expr(s"transform(sequence(1, greatest(length(text) - 7, 1)), i -> $h)"))
      .select(col("dec_h"),
        call_function("gram_hashes", col("text"), lit(8)).as("nat_h"),
        expr("transform(sequence(1, greatest(size(dec_h) - 3, 1)), i -> array_min(slice(dec_h, i, 4)))").as("dec_m"),
        call_function("window_mins", col("dec_h"), lit(4)).as("nat_m"))
    both.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"gram hashes diverge: $r")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"window mins diverge: $r")
    }
    // null semantics: null text -> NULL; null elements skipped like array_min
    val n = spark.sql(
      """SELECT gram_hashes(CAST(NULL AS STRING), 8) AS a,
        |       window_mins(CAST(NULL AS ARRAY<BIGINT>), 4) AS b,
        |       window_mins(array(5L, CAST(NULL AS BIGINT), 3L), 2) AS c""".stripMargin).head()
    assert(n.isNullAt(0) && n.isNullAt(1))
    assert(n.getSeq[java.lang.Long](2) == Seq(5L, 3L))
  }

  test("minhash_sig matches the 16 declarative array_min folds") {
    VectorFunctions.registerAll(spark)
    val xs = docs.select(col("doc_id"),
      call_function("shingle_hashes", col("text"), lit(8)).as("__xs"))
    val both = xs.select(col("doc_id"),
      call_function("minhash_sig", col("__xs"), lit(16)).as("nat"),
      array((0 until 16).map(j => expr(Dedup.minhashOver("__xs", j))): _*).as("dec"))
    assert(both.filter(col("nat") =!= col("dec")).count() == 0)
  }

  test("simhash_bits matches the declarative 32-bit-vote chain") {
    VectorFunctions.registerAll(spark)
    val wordHashes = s"transform(split(text, ' '), w -> ${Dedup.h32("w")})"
    val bits = (0 until 32).map { j =>
      s"(case when aggregate($wordHashes, 0L, (acc, h) -> acc + (2 * (shiftright(h, $j) % 2) - 1)) > 0 then ${1L << j}L else 0L end)"
    }
    val both = docs
      .withColumn("__wh", expr(wordHashes))
      .select(
        call_function("simhash_bits", col("__wh")).as("nat"),
        expr(bits.mkString("(", " + ", ")")).as("dec"))
    assert(both.filter(col("nat") =!= col("dec")).count() == 0)
  }

  test("null semantics: null input -> NULL; null hash element -> NULL sketch") {
    VectorFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT shingles(CAST(NULL AS STRING), 8) AS a,
        |       shingle_hashes(CAST(NULL AS STRING), 8) AS b,
        |       minhash_sig(CAST(NULL AS ARRAY<BIGINT>), 16) AS c,
        |       simhash_bits(CAST(NULL AS ARRAY<BIGINT>)) AS d,
        |       simhash_bits(array(1L, CAST(NULL AS BIGINT))) AS e,
        |       minhash_sig(array(CAST(NULL AS BIGINT)), 4) AS f""".stripMargin).head()
    (0 until 6).foreach(i => assert(r.isNullAt(i), s"col $i should be NULL"))
    // array_min semantics: null elements skipped, non-null ones used
    val g = spark.sql("SELECT minhash_sig(array(5L, CAST(NULL AS BIGINT), 3L), 1) AS g").head()
    assert(g.getSeq[Long](0) == Seq(10L)) // j=0: min(5+7, 3+7), null skipped
  }
}
