package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data merge operators — the lakehouse upsert surface the
  * reference's NoSQL sinks imply but never expose as queries (its
  * repositories append whole documents, mongodb/data_repo.rs:20-70; any
  * "current state" view is left to the store). Here the merge IS a
  * relational operator, so it runs distributed and oracle-checkable.
  *
  * Scale shapes (100 TB):
  *  - latestWins is ONE hash shuffle on the merge key + a per-key window
  *    scan — the canonical "compact a CDC stream" plan. No driver state,
  *    no collect, map-side partial nothing (windows don't pre-aggregate,
  *    but the shuffle is the unavoidable key co-location).
  *  - scd2Intervals is the same single shuffle; lead() runs inside the
  *    sorted partition. At 100 TB both are bounded by the shuffle of the
  *    CHANGE stream (small vs the base table — you merge deltas, not the
  *    world).
  */
object Merge {

  /** Latest-wins upsert compaction: keep, per key, the row with the
    * highest (versionCol, tieBreak) — the MERGE INTO / CDC-compaction
    * primitive. tieBreak makes the pick total when versions collide. */
  def latestWins(df: DataFrame, keyCols: Seq[String], versionCol: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(tieBreak).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** SCD-2 interval view of a change stream: each version row becomes
    * [valid_from = its version stamp, valid_to = next version's stamp or
    * null (current)], plus an is_current flag. One shuffle on the key. */
  def scd2Intervals(df: DataFrame, keyCols: Seq[String], versionCol: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).asc, col(tieBreak).asc)
    df.withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
