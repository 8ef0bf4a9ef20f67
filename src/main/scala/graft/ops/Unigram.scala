package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed unigram-LM tokenizer training (Kudo 2018, the SentencePiece
  * model) — the other dominant tokenizer family beside BPE ([[Bpe]]), built
  * with the same engineering shape: ONE corpus pass to the distinct
  * word-frequency relation, then every iteration touches only vocab-sized
  * relations, never per-occurrence data.
  *
  *  - **Seed**: all substrings (length ≤ `maxPieceLen`, every start
  *    position) of the distinct words, corpus-frequency-weighted — a pure
  *    codegen'd flatten/explode over the word relation, one map-side-
  *    combined aggregate, top-`seedSize` via orderBy+limit (TakeOrdered:
  *    per-partition heaps, no global sort). Single characters are always
  *    kept (segmentation coverage).
  *  - **EM (hard/Viterbi variant)**: each round broadcasts the ≤ seedSize
  *    piece-count table, computes every distinct word's BEST segmentation
  *    under the current counts (per-row Viterbi in one `mapPartitions`
  *    pass — genuinely imperative per-word DP, the documented exception to
  *    the functions-not-UDFs rule, amortizing the broadcast across the
  *    partition), and re-counts pieces from the chosen segmentations
  *    (words-sized explode → piece-sized aggregate).
  *  - **Prune**: after each round the multi-char piece set shrinks to
  *    `shrink` of its size (never below the `vocabSize` target), dropping
  *    the lowest expected counts — the loss-contribution prune of the
  *    paper, in its hard-EM form where a dropped piece's loss contribution
  *    IS its expected count.
  *
  * DETERMINISM — no float anywhere in training. A segmentation's
  * probability Π cᵢ/T^k is compared EXACTLY via cross-multiplied BigInt
  * products (Π_A · T^k_B vs Π_B · T^k_A, with a per-partition power table);
  * ties break on fewer pieces, then the lexicographically-first piece
  * sequence. Counts are corpus-frequency longs. Two runs — or two cluster
  * layouts — produce the identical vocabulary, which is what lets the spec
  * pin golden fixtures and cross-run equality. (The float EM of the paper
  * resists any such replay — the reason the soft variant is not used.)
  *
  * Scale shape at 100 TB: the corpus is touched ONCE (wordFreq's map-side
  * combine ships vocab-sized partial counts); every EM round is
  * O(|distinct words| · wordLen · maxPieceLen) work distributed over the
  * word relation with a ≤ seedSize broadcast; the only driver-side state is
  * the piece table itself (≤ seedSize rows, the PQ-trainCap/BPE-batchK
  * bounded-collect precedent). Words longer than `maxWordLen` are excluded
  * from training (SentencePiece likewise bounds sentence-piece length) —
  * they are pathological non-words whose BigInt power table would be the
  * one unbounded cost.
  */
object Unigram {

  /** One corpus pass → distinct `(w, c)` word frequencies, training-bounded
    * to `maxWordLen`. Same exchange discipline as [[Bpe.wordFreq]]. */
  def wordFreq(docs: DataFrame, textCol: String, maxWordLen: Int): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1 && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** Seed vocabulary: every substring of length 1..`maxPieceLen` at every
    * start position of every distinct word, weighted by word frequency
    * (a substring occurring at two positions counts twice — the paper's
    * suffix-array seed counts occurrences the same way). Output
    * `(piece, freq)`: the top `seedSize` by (freq desc, piece asc) UNION
    * all single characters (kept regardless of rank, for coverage).
    * Pure expression work: flatten(transform(sequence…)) is codegen'd;
    * one aggregate; TakeOrdered for the cut. */
  def seedVocab(docs: DataFrame, textCol: String, maxPieceLen: Int = 8,
                seedSize: Int = 2000, maxWordLen: Int = 48): DataFrame =
    seedFromWords(wordFreq(docs, textCol, maxWordLen), maxPieceLen, seedSize)

  /** [[seedVocab]] over an ALREADY-BUILT `(w, c)` word relation — the form
    * [[train]] uses so the corpus is scanned exactly once (the staged word
    * relation feeds both the seed and every EM round; r16 review). */
  def seedFromWords(words: DataFrame, maxPieceLen: Int, seedSize: Int): DataFrame = {
    require(maxPieceLen >= 1 && seedSize >= 1, "maxPieceLen/seedSize must be >= 1")
    val subs = words.select(explode(flatten(expr(
        s"""transform(sequence(1, char_length(w)), i ->
           |  transform(sequence(1, least($maxPieceLen, char_length(w) - i + 1)), l ->
           |    substring(w, i, l)))""".stripMargin))).as("piece"), col("c"))
      .groupBy(col("piece")).agg(sum(col("c")).as("freq"))
    val top = subs.orderBy(col("freq").desc, col("piece").asc).limit(seedSize)
    val chars = subs.filter(length(col("piece")) === 1)
    top.unionByName(chars).groupBy(col("piece"))
      .agg(max(col("freq")).as("freq"))
  }

  /** Best (Viterbi) segmentation of `word` under integer piece counts
    * `vocab` with corpus total `powT(1)`. `powT(k)` must hold T^k for every
    * k up to the longest word — precomputed once per partition. Returns
    * None when some character of the word is absent from the vocab. */
  private[graft] def viterbi(word: String, vocab: collection.Map[String, Long],
                           powT: Array[BigInt], maxPieceLen: Int): Option[List[String]] = {
    val n = word.length
    // dp(j): best segmentation of word[0, j) as (Π counts, #pieces, pieces)
    final case class St(prod: BigInt, k: Int, pieces: List[String])
    def better(a: St, b: St): Boolean = {
      val l = a.prod * powT(b.k); val r = b.prod * powT(a.k)
      if (l != r) l > r
      else if (a.k != b.k) a.k < b.k
      else {
        // equal score and piece count: lexicographically-first sequence
        val ap = a.pieces.reverse; val bp = b.pieces.reverse
        ap.zip(bp).find { case (x, y) => x != y }.forall { case (x, y) => x < y }
      }
    }
    val dp = new Array[St](n + 1)
    dp(0) = St(BigInt(1), 0, Nil)
    var j = 1
    while (j <= n) {
      var best: St = null
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (dp(i) != null) {
          val c = vocab.getOrElse(word.substring(i, j), 0L)
          if (c > 0L) {
            val cand = St(dp(i).prod * c, dp(i).k + 1, word.substring(i, j) :: dp(i).pieces)
            if (best == null || better(cand, best)) best = cand
          }
        }
        i += 1
      }
      dp(j) = best
      j += 1
    }
    Option(dp(n)).map(_.pieces.reverse)
  }

  /** One hard-EM round: segment every distinct word under `pieces`, then
    * re-count. Returns the new (piece → expected count) table, collected
    * driver-side (≤ |pieces| rows — bounded by construction). */
  private def emCounts(words: DataFrame, pieces: Map[String, Long],
                       maxPieceLen: Int, maxWordLen: Int): Map[String, Long] = {
    val spark = words.sparkSession
    val bc = spark.sparkContext.broadcast(pieces)
    val outSchema = StructType(Seq(
      StructField("piece", StringType), StructField("n", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val segmented = words.mapPartitions { rows =>
      val vocab = bc.value
      val t = BigInt(vocab.valuesIterator.sum.max(1L))
      val powT = new Array[BigInt](maxWordLen + 2)
      powT(0) = BigInt(1)
      for (k <- 1 to maxWordLen + 1) powT(k) = powT(k - 1) * t
      rows.flatMap { r =>
        viterbi(r.getString(0), vocab, powT, maxPieceLen).toSeq.flatten
          .map(p => Row(p, r.getLong(1)))
      }
    }(enc)
    segmented.groupBy(col("piece")).agg(sum(col("n")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Train a unigram-LM vocabulary of `vocabSize` pieces. Returns the final
    * vocabulary as `(rank, piece, count)` — rank by (count desc, piece asc),
    * counts = hard-EM expected counts of the LAST round (single characters
    * are always retained, floored at count 1 so coverage never dies).
    * `vocabSize` is a TARGET: when the corpus supports fewer pieces the
    * result is smaller; when single chars alone exceed it they all stay. */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 512,
            maxPieceLen: Int = 8, seedSize: Int = 2000, emIters: Int = 3,
            shrink: Double = 0.75, maxWordLen: Int = 48): DataFrame = {
    require(vocabSize >= 1 && emIters >= 1, "vocabSize/emIters must be >= 1")
    require(shrink > 0 && shrink <= 1, s"shrink=$shrink must be in (0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = Checkpointing.stage(wordFreq(docs, textCol, maxWordLen))
    // seed table, driver-side from here on (≤ seedSize + |alphabet| rows);
    // seeded from the STAGED word relation — the corpus is scanned once
    var pieces: Map[String, Long] =
      seedFromWords(words, maxPieceLen, seedSize)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "single char" = ONE CODEPOINT, not one UTF-16 unit (r16 advice):
    // seedFromWords seeds pieces by Spark's codepoint semantics, so a
    // supplementary-plane character arrives as a 1-codepoint/2-Java-char
    // piece — classifying by String.length would deny it the count-1
    // retention floor, let it be pruned, and silently drop every word
    // containing it from the EM counts (viterbi None). The DP still
    // reaches it: viterbi tries all UTF-16 substring lengths ≤
    // maxPieceLen, and a surrogate pair is length 2.
    def isOneCodepoint(s: String): Boolean = s.codePointCount(0, s.length) == 1
    val chars = pieces.keySet.filter(isOneCodepoint)
    for (round <- 1 to emIters) {
      val counts = emCounts(words, pieces, maxPieceLen, maxWordLen)
      // single chars always survive (count floor 1: a char shadowed by
      // longer pieces must stay encodable); multi-char pieces live on
      // their expected counts
      val charRows = chars.iterator.map(c => c -> counts.getOrElse(c, 0L).max(1L)).toMap
      val multi = counts.view.filterKeys(p => !isOneCodepoint(p)).toSeq
        .sortBy { case (p, n) => (-n, p) }
      // shrink toward the target: each round keeps `shrink` of the
      // multi-piece set, never fewer than the target leaves room for
      val targetMulti = math.max(vocabSize - charRows.size, 0)
      val keep = if (round == emIters) targetMulti
        else math.max(math.ceil(multi.size * shrink).toInt, targetMulti)
      pieces = charRows ++ multi.take(keep)
    }
    pieces.toSeq.sortBy { case (p, n) => (-n, p) }.zipWithIndex
      .map { case ((p, n), i) => (i + 1L, p, n) }
      .toDF("rank", "piece", "count")
      .repartition(1) // ≤ vocabSize rows; a single output partition
  }

  /** Encode documents under a trained vocabulary: whitespace pre-split,
    * Viterbi per word (same exact-integer DP as training), pieces
    * concatenated in word order. Words containing a character absent from
    * `vocab` contribute their raw word as one out-of-vocabulary piece —
    * surfaced rather than dropped, the standard <unk> contract. Output:
    * (id, pieces array<string>, n_pieces). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: Map[String, Long], maxPieceLen: Int = 8,
             maxWordLen: Int = 48): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(vocab)
    val outSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("pieces", ArrayType(StringType, containsNull = false)),
      StructField("n_pieces", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    graft.core.Par.widen(docs.select(col(idCol).cast("long"), col(textCol)))
      .mapPartitions { rows =>
        val v = bc.value
        val t = BigInt(v.valuesIterator.sum.max(1L))
        val powT = new Array[BigInt](maxWordLen + 2)
        powT(0) = BigInt(1)
        for (k <- 1 to maxWordLen + 1) powT(k) = powT(k - 1) * t
        rows.map { r =>
          // NULL text encodes to zero pieces (wordFreq's explode likewise
          // drops nulls at training — the two paths must tolerate the same
          // corpus; r16 review)
          val text = if (r.isNullAt(1)) "" else r.getString(1)
          val ps = text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
            if (w.length > maxWordLen) Seq(w)
            else viterbi(w, v, powT, maxPieceLen).getOrElse(List(w))
          }.toSeq
          Row(r.getLong(0), ps, ps.size.toLong)
        }
      }(enc)
  }
}
