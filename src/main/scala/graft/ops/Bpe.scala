package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (beyond the reference surface — the
  * data-engine half of building a tokenizer for a 100 TB pretraining corpus).
  *
  * The classic algorithm (Sennrich et al. 2016) counts adjacent symbol pairs
  * over the corpus, merges the most frequent pair, and repeats. The scale
  * insight is that after ONE corpus pass everything operates on the distinct
  * WORD-frequency table: the corpus contributes `(word, count)` once, and
  * every merge round touches only the vocab relation (orders of magnitude
  * smaller than the corpus, and the only thing that changes per round).
  *
  * All transforms are built-in higher-order functions (whole-stage codegen,
  * no UDFs); the per-round pair argmax is a single tiny `limit(1)` collect.
  */
object Bpe {

  /** One corpus pass → the distinct word-frequency table `(w, c, syms)`,
    * with each word pre-split into its initial single-character symbols.
    * Words shorter than 2 chars carry no pairs and are dropped. The groupBy
    * partial-aggregates map-side, so the one shuffle carries vocab-sized
    * partial counts, not the corpus. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .withColumn("syms",
        expr("transform(sequence(1, char_length(w)), i -> substring(w, i, 1))"))

  /** Adjacent symbol-pair counts over a `(syms, c)` vocab relation:
    * one row per distinct (a, b) adjacency with its corpus-weighted count.
    * Vocab-sized input, vocab-sized shuffle — the per-round cost of BPE. */
  def pairCounts(vocab: DataFrame): DataFrame =
    // fully-merged single-symbol words carry no adjacency — and must be
    // excluded BEFORE sequence(1, size-1), which descends for size < 2
    vocab.filter(size(col("syms")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> " +
          "struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
        .as("p"), col("c"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("c"))
      .groupBy(col("a"), col("b")).agg(sum(col("c")).as("n"))

  /** Rewrite every vocab word's symbol array with one merge applied:
    * each left-to-right non-overlapping (a, b) adjacency becomes the fused
    * symbol a||b — a pure codegen'd fold over the (short) symbol array. */
  def applyMerge(vocab: DataFrame, a: String, b: String): DataFrame = {
    val merged = aggregate(
      col("syms"),
      array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))
    vocab.withColumn("syms", merged)
  }

  /** Train `numMerges` BPE merges. Returns the merge list in order. The loop
    * is driver-side but each round's data work is one vocab-sized aggregate
    * plus one vocab-sized projection; `localCheckpoint` every few rounds
    * truncates the growing `applyMerge` lineage. Ties break lexicographically
    * (a, b) for a deterministic, engine-portable merge sequence. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    var vocab = wordFreq(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    while (round < numMerges) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) return merges.toSeq // no adjacencies left
      val (a, b) = (top(0).getString(0), top(0).getString(1))
      merges += ((a, b))
      vocab = applyMerge(vocab, a, b)
      round += 1
      if (round % 8 == 0) vocab = vocab.localCheckpoint()
    }
    merges.toSeq
  }
}
