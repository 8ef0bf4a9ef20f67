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
    * plus one vocab-sized projection; a [[Checkpointing.Truncator]] every
    * few rounds truncates the growing `applyMerge` lineage AND rotates the
    * previous checkpoint's blocks out of executor storage (the realistic
    * 10k-50k-merge regime would otherwise retain merges/8 vocab-sized block
    * sets for the life of the job). Ties break lexicographically
    * (a, b) for a deterministic, engine-portable merge sequence. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] =
    trainBatched(docs, textCol, numMerges)._1

  /** [[train]] with the per-round Spark-job count exposed, and SEVERAL
    * merges extracted per round — the realistic 10k–50k-merge regime can't
    * afford one cluster-wide aggregate per merge.
    *
    * One `pairCounts` snapshot is collected top-`batchK` (sorted n desc,
    * then (a, b) — the sequential tie-break). From it we accept a PREFIX of
    * pairwise symbol-disjoint pairs, then keep only those with count
    * STRICTLY above `boundN` = the first interacting row's count (or the
    * last collected row's, when no interaction shows within `batchK`).
    * That prefix provably reproduces sequential BPE:
    *   - applying a merge (x, y) never changes the count of a pair sharing
    *     no symbol with {x, y, xy} (fusing elsewhere in a word cannot make
    *     or break an (a, b) adjacency), so each accepted pair's count is
    *     still exact at its turn;
    *   - every pair CREATED by an accepted merge, (p, xy) or (xy, q), is
    *     bounded by the OLD count of an interacting pair ((p, x) / (y, q)),
    *     and all interacting pairs rank at or below boundN — strictly below
    *     every kept candidate — so no new pair can out-rank the prefix;
    *   - rows beyond the collected k rank at or below the last collected
    *     row, hence at or below boundN.
    * The head row is always kept (it is the fresh global argmax), so every
    * round makes progress; a degenerate all-interacting corpus degrades to
    * one merge per round — the exact sequential loop, never a wrong one.
    * Expected savings are data-dependent: early letter-dominated rounds
    * often stop at the first interaction (common letters appear in many top
    * pairs), while the realistic 10k–50k-merge regime — where top pairs are
    * symbol-diverse — batches much larger prefixes. Exactness is the
    * invariant; the job reduction is the bonus.
    *
    * Fully-merged single-symbol words are pruned from the working vocab
    * each round: they can never pair again, and dropping them shrinks every
    * later round's scan, shuffle, and projection.
    *
    * Returns (merges, rounds) where rounds = number of corpus/vocab-sized
    * pair-count jobs executed. */
  def trainBatched(docs: DataFrame, textCol: String, numMerges: Int,
                   batchK: Int = 16): (Seq[(String, String)], Int) = {
    require(batchK >= 1, s"batchK=$batchK must be >= 1")
    val truncator = new Checkpointing.Truncator(reliable = false)
    var vocab = truncator.truncate(wordFreq(docs, textCol))
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var rounds = 0
    var sinceCheckpoint = 0
    while (merges.length < numMerges) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b")).limit(batchK)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      rounds += 1
      if (top.isEmpty) return (merges.toSeq, rounds) // no adjacencies left
      // accept a disjoint prefix; boundN = first interacting count, else
      // the collected tail's count (uncollected rows rank at or below it)
      val touched = scala.collection.mutable.Set[String]()
      val accepted = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      // a short (< batchK) list is EXHAUSTIVE — nothing uncollected to bound
      var boundN = if (top.length < batchK) Long.MinValue else top.last._3
      var stopped = false
      for ((a, b, n) <- top if !stopped) {
        if (touched.contains(a) || touched.contains(b)) {
          boundN = n; stopped = true
        } else {
          accepted += ((a, b, n))
          touched ++= Seq(a, b, a + b)
        }
      }
      // strict-majority trim (head always kept: it is the fresh argmax)
      val batch = (accepted.take(1) ++ accepted.drop(1).filter(_._3 > boundN))
        .take(numMerges - merges.length)
        .map { case (a, b, _) => (a, b) }
      merges ++= batch
      // all batch merges in ONE projection pass (they commute: pairwise
      // symbol-disjoint), then prune words that can never pair again
      vocab = batch.foldLeft(vocab) { case (v, (a, b)) => applyMerge(v, a, b) }
        .filter(size(col("syms")) >= 2)
      sinceCheckpoint += batch.length
      if (sinceCheckpoint >= 8) { vocab = truncator.truncate(vocab); sinceCheckpoint = 0 }
    }
    (merges.toSeq, rounds)
  }

  /** Apply a FROZEN merge list to a corpus — the production half of the
    * tokenizer story: train once (t97 / [[train]]), freeze the merge list
    * as the published artifact, then encode 100 TB with it.
    *
    * Scale shape: encoding is computed per DISTINCT word, never per
    * occurrence — one corpus pass builds the distinct-word relation
    * (map-side-combined, vocab-sized shuffle), the merge fold runs over
    * that small relation, and the result broadcast-joins back to the
    * corpus. Per-word merging needs no custom expression: the word is
    * rendered as a boundary-wrapped symbol string (`\u0001c1\u0002\u0001c2\u0002…`) and each
    * merge (a, b) is ONE codegen'd literal replace of the wrapped pair with
    * the wrapped fused symbol —
    * string replace is left-to-right and non-overlapping, exactly
    * [[applyMerge]]'s fold semantics (spec-pinned equivalent), and the
    * whole merge chain is a static tree of built-ins inside whole-stage
    * codegen.
    *
    * The boundary characters are the non-printable \u0001 (open) and
    * \u0002 (close) — characters that cannot occur in sane corpus text —
    * so ordinary punctuation ('<', '>' in markup-ish words, which survive
    * a space-only split) can never forge a symbol boundary and false-match
    * a merge pattern across symbols. Merge symbols are required free of
    * the delimiters; corpus words carrying them (corrupt control-char
    * bytes) are excluded from the token stream rather than silently
    * mis-tokenized — the oracle applies the same filter.
    *
    * Output: one row per input document carrying at least one word —
    * (idCol, n_tokens, first `capTokens` tokens as CSV). */
  // non-printable symbol delimiters: cannot occur in sane corpus text,
  // so punctuation like '<'/'>' (which survives a space-only split) can
  // never forge a boundary inside a merge-replace pattern
  private val BO = "\u0001" // symbol open
  private val BC = "\u0002" // symbol close

  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)], capTokens: Int = 12): DataFrame = {
    require(merges.forall { case (a, b) =>
      !(a + b).exists(c => c == BO.head || c == BC.head) },
      "merge symbols must not contain the boundary characters \\u0001 \\u0002")
    val words = docs
      .select(col(idCol).as("__id"), posexplode(split(col(textCol), " ")).as(Seq("wpos", "w")))
      // words carrying a delimiter byte (corrupt control-char text) are
      // excluded from the token stream rather than silently mis-tokenized;
      // the oracle applies the same filter
      .filter(col("w") =!= "" &&
        !col("w").contains(lit(BO)) && !col("w").contains(lit(BC)))
    val vocab = words.select(col("w")).distinct()
    val wrapped = concat(lit(BO),
      array_join(expr("transform(sequence(1, char_length(w)), i -> substring(w, i, 1))"), BC + BO),
      lit(BC))
    val fused = merges.foldLeft(wrapped) { case (c, (a, b)) =>
      replace(c, lit(BO + a + BC + BO + b + BC), lit(BO + a + b + BC))
    }
    val enc = vocab.withColumn("__fused", fused)
      .withColumn("toks",
        split(col("__fused").substr(lit(2), length(col("__fused")) - 2), BC + BO))
      .select(col("w"), col("toks"), size(col("toks")).cast("long").as("n_word_toks"))
    words.join(broadcast(enc), Seq("w"))
      .groupBy(col("__id"))
      .agg(sum(col("n_word_toks")).as("n_tokens"),
        array_join(slice(flatten(transform(
            array_sort(collect_list(struct(col("wpos"), col("toks")))),
            s => s.getField("toks"))), 1, capTokens), ",").as("tokens_head"))
      .withColumnRenamed("__id", idCol)
  }

}
