package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling curves for the flagship iterative/join paths.
  *
  * The 100 TB arguments elsewhere in this repo are plan-shape arguments
  * (keyed joins not cartesians, bounded fan-out, checkpointed
  * fixpoints); this main MEASURES the growth curve by expanding the
  * real sf0.1 corpus deterministically and timing the same driver
  * queries at 1x/3x/10x. Near-linear wall-time growth validates the
  * shape; anything superlinear is a finding to fix, not to explain
  * away.
  *
  * Expansion model (seed-stable, no RNG): factor f unions f copies of
  * the corpus; copy 0 is the untouched original (so 1x IS the real
  * data) and copy i shifts ids by i*stride and remaps every word with a
  * copy suffix. Word-remapping — rather than verbatim replication — is
  * the honest growth model: each copy keeps the original's internal
  * statistics exactly (same per-doc lengths, same within-copy
  * shingle/trigram density) while sharing zero vocabulary across
  * copies, the way a 10x-larger real corpus adds new content rather
  * than 10 literal duplicates of every document. Verbatim copies would
  * instead put f near-identical docs in every LSH band bucket and grow
  * candidate pairs QUADRATICALLY in f — a worst-case stress test, not a
  * scaling curve. Embeddings jitter each copied vector with a
  * hash-derived offset (deterministic, label-preserving) so vector
  * neighborhoods stay local to their copy.
  *
  * Usage: runMain graft.ScaleBench [baseDir] [workDir] [factors] [queries]
  * Defaults: sf0.1, /tmp/graft_scale, 1,3,10, the five verdict-named
  * flagship queries (LSH banding, CC dedup clusters, trigram-blocked
  * ER scoring, the composed ER pipeline, mutual-kNN clustering).
  */
object ScaleBench {

  private val DefaultQueries = Seq(
    "dd04_lsh_candidates", "dd07_dup_clusters", "er01_fuzzy_entity_match",
    "c04_entity_pipeline", "knn02_mutual_clusters",
    // lakehouse flagship pair: COW merge cost must track the delta, not
    // the table (round-7 curves: commit-metadata bound at 10x), and the
    // merge-on-read twin must beat it by skipping the rewrite entirely
    "tx04_cow_merge", "tx11_mor_merge")

  private def load1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_scale")
    val factors = args.lift(2).getOrElse("1,3,10").split(",").map(_.trim.toInt).toSeq
    val queries = args.lift(3)
      .map(_.split(",").map(_.trim).toSeq).getOrElse(DefaultQueries)

    val spark = GraftSession.local()
    // warmup: JVM + codegen + FS init outside any measured window
    spark.read.parquet(s"$baseDir/documents.parquet").count()

    val fns = queries.map(q => q -> SparkEntry.queries(q)).toMap
    val results = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Double, Long)]
    factors.foreach { f =>
      val dir = s"$workDir/x$f"
      materialize(spark, baseDir, dir, f)
      queries.foreach { q =>
        // two decorrelated passes (all queries between reruns), min wins —
        // this VM's co-tenant bursts only ever inflate a timing
        var bestSec = Double.MaxValue
        var rows = 0L
        (1 to 2).foreach { _ =>
          val t0 = System.nanoTime()
          rows = fns(q)(spark, dir).count()
          bestSec = math.min(bestSec, (System.nanoTime() - t0) / 1e9)
        }
        results += ((f, q, bestSec, rows))
        println(f"SCALE x$f%-3d $q%-28s ${bestSec}%8.2f s  $rows%9d rows  load=${load1()}%.1f")
      }
    }
    // MERGE into the existing curve file: a targeted rerun (one query
    // family, a new factor set) must not clobber the other families'
    // recorded curves — same-(factor,query) entries are superseded.
    val fresh = results.map { case (f, q, s, r) =>
      (f, q, s"""{"factor":$f,"query":"$q","sec":${f"$s%.2f"},"rows":$r}""")
    }
    val freshKeys = fresh.map { case (f, q, _) => (f, q) }.toSet
    val keyRe = """"factor":(\d+),"query":"([^"]+)"""".r
    val kept = try {
      val txt = new String(Files.readAllBytes(Paths.get("scale_curves.json"))).trim
      txt.stripPrefix("[").stripSuffix("]").split("\\},\\s*\\{").toSeq
        .filter(_.nonEmpty)
        .map(e => ("{" + e.stripPrefix("{").stripSuffix("}") + "}").replaceAll("\\s+", ""))
        .filter(e => keyRe.findFirstMatchIn(e) match {
          case Some(m) => !freshKeys.contains((m.group(1).toInt, m.group(2)))
          case None => false
        })
    } catch { case _: Throwable => Seq.empty }
    val json = (kept ++ fresh.map(_._3)).mkString("[", ",", "]")
    val w = new java.io.PrintWriter("scale_curves.json")
    try w.println(json) finally w.close()
    println(json)
    spark.stop()
  }

  /** Builds the factor-f expansion under `dir` (idempotent: a _READY
    * marker skips rebuild). Non-expanded tables are file-copied so any
    * driver query can run against the directory. */
  def materialize(spark: SparkSession, baseDir: String, dir: String, f: Int): Unit = {
    if (Files.exists(Paths.get(s"$dir/_READY"))) return
    Files.createDirectories(Paths.get(dir))

    expandDocuments(spark, s"$baseDir/documents.parquet", f)
      .coalesce(math.max(4, 4 * f))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    expandEmbeddings(spark, s"$baseDir/embeddings.parquet", f)
      .coalesce(math.max(4, 2 * f))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    expandEvents(spark, s"$baseDir/events.parquet", f)
      .coalesce(math.max(4, 2 * f))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      val src = Paths.get(s"$baseDir/$t.parquet")
      if (Files.exists(src))
        Files.copy(src, Paths.get(s"$dir/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    Files.createFile(Paths.get(s"$dir/_READY")): Unit
  }

  /** f disjoint copies: copy 0 verbatim, copy i id-shifted with the
    * ALPHABET ROTATED by i (translate a->b->c...). Rotation preserves
    * every within-copy statistic exactly — word lengths, word counts,
    * shingle densities, n_chars — while making copies disjoint in BOTH
    * blocking key spaces the dedup/ER queries use: word shingles AND
    * character trigrams. (A word-suffix remap was measured first and
    * rejected: suffixed words still share their core character
    * trigrams, so the ER trigram join compounded across copies —
    * er01 x3 ran 7.3x x1's time. That run is the recorded
    * shared-vocabulary caveat in BENCH.md: with a FIXED vocabulary,
    * 10x more entities genuinely means ~100x trigram-blocked
    * candidates, and the mitigation is tighter blocking, not engine
    * work. Rotation isolates the engine curve from that data effect.) */
  /** f disjoint copies of the event stream: copy i shifts event_id and
    * user_id by i*stride (ts/type/value kept — identical value ties
    * across copies are deliberate: the per-type top-k queries must
    * break them deterministically by event_id, and at 10x the tie
    * density is the stress case for the bounded-heap aggregate). */
  def expandEvents(spark: SparkSession, path: String, f: Int): DataFrame = {
    val ev = spark.read.parquet(path)
    val stride = ev.agg(max("event_id")).head.getLong(0) + 1
    val ustride = ev.agg(max("user_id")).head.getLong(0) + 1
    (0 until f).map { i =>
      if (i == 0) ev
      else ev.select((col("event_id") + lit(i * stride)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * ustride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
  }

  def expandDocuments(spark: SparkSession, path: String, f: Int): DataFrame = {
    val docs = spark.read.parquet(path)
    val stride = docs.agg(max("doc_id")).head.getLong(0) + 1
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    (0 until f).map { i =>
      if (i == 0) docs
      else {
        val rot = alpha.drop(i % 26) + alpha.take(i % 26)
        docs.select(
          (col("doc_id") + lit(i * stride)).as("doc_id"),
          expr(s"translate(text, '$alpha', '$rot')").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
    }.reduce(_ unionByName _)
  }

  /** f copies with id shift and a deterministic per-element jitter of
    * ±0.05 (hash of (vec_id, copy, position)) — neighborhoods stay
    * near the source vector but copies don't collapse onto it. */
  def expandEmbeddings(spark: SparkSession, path: String, f: Int): DataFrame = {
    val emb = spark.read.parquet(path)
    val stride = emb.agg(max("vec_id")).head.getLong(0) + 1
    (0 until f).map { i =>
      if (i == 0) emb
      else emb.select(
        (col("vec_id") + lit(i * stride)).as("vec_id"),
        expr(s"""transform(embedding, (x, j) ->
                 |  cast(x + (pmod(xxhash64(vec_id, $i, j), 1000) / 10000.0 - 0.05) as float))"""
          .stripMargin).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
  }
}
