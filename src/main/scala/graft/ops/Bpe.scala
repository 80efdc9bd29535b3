package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning and application — the tokenizer
  * step of a pre-training data pipeline (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units").
  *
  * Scale shape: the corpus is scanned ONCE (word counting); every merge
  * iteration then operates on the word-count relation, whose cardinality
  * is the vocabulary size — bounded and tiny relative to the corpus at
  * any scale. Each iteration is one vocab-sized aggregation plus a
  * broadcast of the single winning pair; nothing corpus-sized ever
  * re-shuffles. Encoding joins the final vocab-sized (word -> token
  * count) relation back onto the token stream as a BROADCAST, so the
  * corpus never shuffles there either. Per-iteration `localCheckpoint`
  * keeps the plan flat (the iterated relation is vocab-sized, so
  * materialization is cheap).
  *
  * Determinism: pair frequencies are exact integer sums; the winning
  * pair is argmax with a total (freq DESC, left, right) tie-break —
  * identical in Spark and any ANSI engine. Merge application rewrites
  * the symbol sequence (encoded `|sym|sym|...|`) with 4 fixed literal
  * `replace` passes: `replace` is leftmost-non-overlapping in both
  * Spark and DuckDB, and 4 passes reach fixpoint for words up to ~16
  * symbols. Documented deviation from reference BPE: a run of >= 6
  * IDENTICAL symbols fixpoints as (aa, a, aa, a) rather than greedy
  * (aa, aa, aa) — engines agree with each other, and natural-language
  * corpora hit this only on exotic tokens (BpeSpec pins both cases).
  */
object Bpe {

  /** Adjacent-symbol pairs of a `|sym|...|`-encoded sequence column as
    * an array of (a, b) structs. split on the literal pipe yields
    * ["", s1, ..., sn, ""], so symbols occupy slots 2..n+1 (1-based)
    * and there are n-1 = size-3 adjacent pairs. zip_with over two
    * slices (NOT transform(sequence(...)): sequence(1, 0) descends). */
  private def adjacentPairs(seq: org.apache.spark.sql.Column) = {
    val syms = split(seq, "\\|")
    val nPairs = size(syms) - 3 // negative/zero for 1-symbol words -> empty slice
    zip_with(
      slice(syms, lit(2), nPairs),
      slice(syms, lit(3), nPairs),
      (a, b) => struct(a.as("a"), b.as("b")))
  }

  /** Merge-learning loop shared by learnMerges and encodeTokenCounts:
    * returns (merge rows unioned in step order, final (w, seq, c)
    * vocab relation after all merges). */
  private def learnLoop(docs: DataFrame, textCol: String, steps: Int)
      : (DataFrame, DataFrame) = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    // The one corpus scan: word counts, then char-split into |-separated
    // symbol sequences. Checkpoint ends the corpus lineage here.
    var seqRel = docs
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(col("w"),
        concat(regexp_replace(col("w"), "(.)", "|$1"), lit("|")).as("seq"),
        col("c"))
      .localCheckpoint(true)

    var merges: DataFrame = null
    for (step <- 1 to steps) {
      val best = seqRel
        .select(col("c"), explode(adjacentPairs(col("seq"))).as("p"))
        .groupBy(col("p.a").as("left_sym"), col("p.b").as("right_sym"))
        .agg(sum("c").as("freq"))
        .orderBy(desc("freq"), asc("left_sym"), asc("right_sym"))
        .limit(1)
        .localCheckpoint(true) // 1 row; feeds both the output and the rewrite
      val mergeRow = best.select(
        lit(step).as("step"), col("left_sym"), col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged_sym"), col("freq"))
      merges = if (merges == null) mergeRow else merges.unionAll(mergeRow)
      val pat = concat(lit("|"), col("left_sym"), lit("|"), col("right_sym"), lit("|"))
      val rep = concat(lit("|"), col("left_sym"), col("right_sym"), lit("|"))
      val rewritten = Iterator.iterate(col("seq"))(s => replace(s, pat, rep))
        .drop(4).next() // 4 fixed passes, mirrored verbatim in the oracle
      seqRel = seqRel
        .crossJoin(broadcast(best.select(col("left_sym"), col("right_sym"))))
        .select(col("w"), rewritten.as("seq"), col("c"))
        .localCheckpoint(true) // vocab-sized
    }
    (merges, seqRel)
  }

  /** Learn `steps` BPE merges over whitespace-lowercase words of
    * `textCol`. Returns (step, left_sym, right_sym, merged_sym, freq),
    * one row per learned merge in order. If the vocabulary exhausts all
    * pairs before `steps`, later steps produce no row (both engines
    * agree; the rewrite join against the empty argmax empties the
    * vocab relation, so later steps stay empty rather than erroring). */
  def learnMerges(docs: DataFrame, textCol: String, steps: Int): DataFrame =
    learnLoop(docs, textCol, steps)._1.orderBy("step")

  /** Learn `steps` merges, then encode every document with them:
    * per-doc BPE token count, word count, and chars-per-token — the
    * token-budget estimate a run plans against. The (word -> n_tokens)
    * relation is vocab-sized and BROADCASTs onto the token stream. */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      steps: Int): DataFrame = {
    val (_, vocabSeq) = learnLoop(docs, textCol, steps)
    // symbols per word after all merges: raw split size minus the two
    // empty edge slots.
    val wordTokens = vocabSeq.select(col("w"),
      (size(split(col("seq"), "\\|")) - 2).as("n_tok"))
    docs
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("w"))
      .where(col("w") =!= "")
      .join(broadcast(wordTokens), "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum("n_tok").as("n_bpe_tokens"))
      .join(docs.select(col(idCol), length(col(textCol)).as("n_chars")), idCol)
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
  }
}
