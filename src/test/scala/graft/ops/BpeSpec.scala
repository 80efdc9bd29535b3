package graft.ops

import org.apache.spark.sql.Row
import graft.SparkSpec

/** BPE merge learning: hand-computed merges on a tiny corpus, the
  * documented identical-run deviation, and pair-exhaustion behavior. */
class BpeSpec extends SparkSpec {

  private def learn(texts: Seq[String], steps: Int): Seq[Row] = {
    import spark.implicits._
    Bpe.learnMerges(texts.toDF("text"), "text", steps)
      .select("step", "left_sym", "right_sym", "merged_sym", "freq")
      .collect().toSeq
  }

  test("bpe: learns the classic low/lower merges in frequency order") {
    // Corpus: low x3, lower x2, lowest x1 (one doc per word repetition).
    // Pair counts: (l,o)=6, (o,w)=6, (w,e)=3, (e,r)=2, (e,s)=1, (s,t)=1.
    // Tie at 6 -> (l,o) wins on the (left, right) tie-break.
    // After merge 1: (lo,w)=6 wins; after merge 2: (low,e)=3 wins.
    val texts = Seq("low low low", "lower lower", "lowest")
    assert(learn(texts, 3) == Seq(
      Row(1, "l", "o", "lo", 6L),
      Row(2, "lo", "w", "low", 6L),
      Row(3, "low", "e", "lowe", 3L)))
  }

  test("bpe: run of 4 identical symbols converges to true BPE") {
    // "aaaa" -> pass 1 merges the 1st pair (consumed separator hides
    // the 2nd), pass 2 of the SAME step's 4 replaces catches it:
    // (aa, aa), exactly greedy BPE. Step 2 then merges (aa, aa).
    val r = learn(Seq("aaaa aaaa"), 2)
    assert(r == Seq(
      Row(1, "a", "a", "aa", 6L),
      Row(2, "aa", "aa", "aaaa", 2L)))
  }

  test("bpe: documented deviation — runs of >= 6 identical symbols") {
    // "aaaaaa": greedy BPE gives (aa, aa, aa); the fixed-replace
    // rewrite fixpoints at (aa, a, aa, a) — after pass 1 the leftover
    // singles sit between merged pairs, so no |a|a| adjacency remains
    // for later passes. The CONTRACT is engine agreement (replace is
    // leftmost-non-overlapping in Spark AND DuckDB), not greedy
    // fidelity on exotic tokens; this pins what both engines compute.
    // Step 2 pairs per word: (aa,a) x2, (a,aa) x1 -> merge (aa,a).
    val r = learn(Seq("aaaaaa aaaaaa"), 2)
    assert(r == Seq(
      Row(1, "a", "a", "aa", 10L),
      Row(2, "aa", "a", "aaa", 4L)))
  }

  test("bpe: encodeTokenCounts applies the learned merges per document") {
    import spark.implicits._
    // Merges learned (see first test): (l,o), (lo,w), (low,e). Final
    // encodings: low = [low] (1), lower = [lowe, r] (2),
    // lowest = [lowe, s, t] (3).
    val docs = Seq((1L, "low low low"), (2L, "lower lower"), (3L, "lowest"))
      .toDF("doc_id", "text")
    val r = Bpe.encodeTokenCounts(docs, "doc_id", "text", steps = 3)
      .select("doc_id", "n_words", "n_bpe_tokens", "n_chars")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3)))
      .toSet
    assert(r == Set((1L, 3L, 3L, 11), (2L, 2L, 4L, 11), (3L, 1L, 3L, 6)))
  }

  test("bpe: steps beyond pair exhaustion emit no rows") {
    // Vocabulary {ab x2}: one pair (a,b), then the word is one symbol
    // and no pairs remain — steps 2+ produce empty argmax rows.
    val r = learn(Seq("ab ab"), 3)
    assert(r == Seq(Row(1, "a", "b", "ab", 2L)))
  }
}
