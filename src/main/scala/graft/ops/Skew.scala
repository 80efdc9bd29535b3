package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one hot key holding a large fraction of rows — the classic null-ish /
  * default-value key at 100 TB).
  *
  * AQE's skew-join split (enabled in GraftSession) handles most cases at
  * runtime by splitting oversized shuffle partitions; explicit salting is
  * the fallback when a SINGLE key exceeds what one task can hold even
  * after splits, or when AQE is unavailable (streaming joins).
  *
  * Mechanics: the big side gets a salt in [0, k) spread per-row; the
  * small side is replicated k times; the join key becomes (key, salt).
  * Join OUTPUT is identical to the unsalted join for any salt assignment
  * — salting changes only the shuffle layout. The salt here is derived
  * from a hash of the row's other columns (deterministic, no rand()).
  */
object Skew {

  /** Inner equi-join with the big side salted k ways. `saltSource` must
    * be a column expression that varies within the hot key (any payload
    * column works — it only spreads rows, never affects results). */
  def saltedJoin(
      big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      saltSource: Column, k: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(saltSource), lit(k)))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0), lit(k - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Two-stage salted aggregation — the hot-GROUP mitigation: Spark's
    * map-side partial aggregation already combines before the shuffle,
    * but a group key holding a huge share of rows still lands its merge
    * on ONE reduce task; salting splits that reducer k ways, and a
    * second (group-cardinality-sized, trivially small) shuffle merges
    * the k partials. For algebraic aggregates over exact types (decimal
    * sums, counts) the result is bit-identical to the one-stage groupBy
    * for ANY salt assignment — ScaleSpec and the skew02 oracle both pin
    * that. `saltSource` is a deterministic hash source (no rand()). */
  def saltedSumCount(df: DataFrame, key: String, value: Column,
      saltSource: Column, k: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(k)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(value).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum("__s").as("sum_value"), sum("__n").as("n_rows"))

  /** Top-k hot keys of a column with their row share — the diagnostic
    * that decides whether salting is warranted. One scan: the total comes
    * from an empty-frame window over the (tiny) grouped relation rather
    * than a second pass over the input. */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double") / sum(col("n")).over(Window.partitionBy()).cast("double"))
      // total order (count desc, key) so the top-K set and its row order
      // are deterministic under ties
      .orderBy(col("n").desc, col(key))
      .limit(topK)
  }
}
