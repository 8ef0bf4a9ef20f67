package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document chunking for training-data preparation (beyond the reference
  * surface — agnes has no text machinery; its closest analog is the melt
  * reshaper, src/reshape.rs:1-60, which this generalizes to token windows).
  *
  * Splits each document into overlapping fixed-size token windows — the
  * standard pretraining prep step that turns a variable-length corpus into
  * model-context-sized rows.
  *
  * Scale design: the window starts and the chunk text are all built with
  * codegen'd array expressions (`sequence`/`transform`/`slice`) inside one
  * narrow projection, then a single `posexplode` — a stateless map-side
  * transform with ZERO shuffles at any corpus size. Output grows by
  * roughly `window/stride`× the token volume; downstream writers should
  * repartition on size, not here.
  */
object Chunking {

  /** Explode `textCol` into overlapping token windows of `window` tokens
    * every `stride` tokens (1-based starts 1, 1+stride, 1+2·stride, … while
    * the start lies inside the document; the tail chunk may be shorter).
    * Output: idCol, chunk_id (0-based), chunk (space-joined), n_tokens.
    */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, s"window=$window stride=$stride must be positive")
    val toks = TextFunctions.tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("__toks")), lit(1)), lit(stride)),
          // n_tokens is pure arithmetic — a second slice() here would copy
          // every window twice (lambda bodies get no CSE, see
          // TextFunctions' shingle note)
          st => struct(
            array_join(slice(col("__toks"), st, lit(window)), " ").as("chunk"),
            least(lit(window), size(col("__toks")) - st + 1).cast("long").as("n_tokens")))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col.chunk").as("chunk"), col("col.n_tokens").as("n_tokens"))
  }

  /** Concat-and-cut sequence packing: documents are laid end-to-end in a
    * deterministic pseudo-random order (md5 of id — the standard corpus
    * shuffle, engine-reproducible unlike an RNG) and cut into fixed
    * `budget`-token bins; each document is assigned the bin where its
    * first token lands. This is the step after [[tokenWindows]] in a
    * pretraining pipeline: it turns ragged documents into uniformly-sized
    * training sequences with no padding waste.
    *
    * Packing is a running sum, so it needs a total order — which at 100 TB
    * must NOT be global. `shardCols` partitions the packing (each shard is
    * packed independently, one window shuffle, shards fill executors in
    * parallel); an empty `shardCols` gives the single-total-order form and
    * is only for small inputs.
    *
    * All arithmetic is integer (token counts, `div`), so the assignment is
    * exact on any engine. Output: shardCols ++ (id, n_tokens, bin,
    * bin_offset) where bin_offset is the document's first-token position
    * within its bin. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Int, shardCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val w = Window.partitionBy(shardCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(shardCols.map(col) ++ Seq(col(idCol),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens")): _*)
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", expr(s"__start div $budget"))
      .withColumn("bin_offset", col("__start") - col("bin") * budget)
      .drop("__start")
  }
}
